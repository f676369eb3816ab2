"""``evaluate sliding_window_counts`` / ``evaluate rolling_percentile``
(KQL plugins): explode-to-bins + one groupBy rolling metrics.
Reference implementation for the tests: plain Python over the same
rows."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

BASE = dt.datetime(2024, 1, 1)
ROWS = [
    (i, f"u{i % 5}", BASE + dt.timedelta(hours=i), float(i))
    for i in range(48)
]


@pytest.fixture(scope="module")
def engine(spark):
    ev = spark.createDataFrame(
        ROWS, "eid long, uid string, ts timestamp, v double"
    )
    ev.createOrReplaceTempView("rw_ev")
    return PqlEngine(spark, {"rw_ev": ev})


SWC_Q = (
    "rw_ev | evaluate sliding_window_counts(uid, ts,"
    " datetime(2024-01-01), datetime(2024-01-03), 6h, 3h)"
    " | sort by ts asc"
)


def _swc_reference():
    bins = [BASE + dt.timedelta(hours=3 * k) for k in range(17)]
    out = []
    for b in bins:
        sel = [
            (u,) for (_, u, t, _) in ROWS
            if b - dt.timedelta(hours=6) < t <= b
        ]
        if sel:
            out.append((b, len(sel), len(set(sel))))
    return out


def test_sliding_window_counts(engine):
    got = [
        (r.ts, r.Count, r.Dcount)
        for r in engine.query(SWC_Q).collect()
    ]
    assert got == _swc_reference()


def test_sliding_window_counts_sql(engine, spark):
    got = [
        (r.ts, r.Count, r.Dcount)
        for r in spark.sql(engine.to_sql(SWC_Q)).collect()
    ]
    assert got == _swc_reference()


def test_rolling_percentile_numeric(engine, spark):
    q = "rw_ev | evaluate rolling_percentile(v, 50, eid, 10, 2)"
    out = engine.query(q)
    assert out.columns == ["eid", "percentile_v_50"]
    a = sorted(map(tuple, out.collect()))
    ref: dict[float, list[float]] = {}
    for (i, _, _, v) in ROWS:
        b0 = (i // 10) * 10
        for k in range(2):
            ref.setdefault(float(b0 + k * 10), []).append(v)
    expect = sorted(
        (b, float(np.percentile(vs, 50))) for b, vs in ref.items()
    )
    assert [(b, round(p, 9)) for b, p in a] == [
        (b, round(p, 9)) for b, p in expect
    ]
    b = sorted(map(tuple, spark.sql(engine.to_sql(q)).collect()))
    assert a == b


def test_rolling_percentile_timespan(engine, spark):
    q = "rw_ev | evaluate rolling_percentile(v, 90, ts, 12h, 3)"
    a = sorted(map(tuple, engine.query(q).collect()))
    b = sorted(map(tuple, spark.sql(engine.to_sql(q)).collect()))
    assert a == b and len(a) == 6  # 4 data bins + 2 trailing-only


ACM_ROWS = []
for _day, _users in enumerate(
    [["u0", "u3"], ["u0", "u1"], ["u0", "u1", "u2", "u0"]]
):
    for _j, _u in enumerate(_users):
        ACM_ROWS.append(
            (_u, BASE + dt.timedelta(days=_day, hours=_j))
        )


@pytest.fixture(scope="module")
def acm_engine(spark):
    ev = spark.createDataFrame(ACM_ROWS, "uid string, ts timestamp")
    ev.createOrReplaceTempView("acm_ev")
    return PqlEngine(spark, {"acm_ev": ev})


ACM_Q = (
    "acm_ev | evaluate activity_counts_metrics(uid, ts,"
    " datetime(2024-01-01), datetime(2024-01-04), 1d)"
    " | sort by ts asc"
)
ACM_EXPECT = [
    (BASE, 2, 2, 2, 2),
    (BASE + dt.timedelta(days=1), 2, 2, 1, 3),
    (BASE + dt.timedelta(days=2), 4, 3, 1, 4),
]


def test_activity_counts_metrics(acm_engine):
    got = [
        (r.ts, r.count_, r.dcount, r.new_dcount, r.aggregated_dcount)
        for r in acm_engine.query(ACM_Q).collect()
    ]
    assert got == ACM_EXPECT


def test_activity_counts_metrics_sql(acm_engine, spark):
    got = [
        (r.ts, r.count_, r.dcount, r.new_dcount, r.aggregated_dcount)
        for r in spark.sql(acm_engine.to_sql(ACM_Q)).collect()
    ]
    assert got == ACM_EXPECT


SC_ROWS = [
    ("u0", 0), ("u0", 1), ("u0", 2),  # consecutive days: one session
    ("u1", 0), ("u1", 3),  # 3-day gap > 1d lookback: two sessions
    ("u2", 5), ("u0", 0),  # duplicate activity collapses
]
SC_Q = (
    "sc_ev | evaluate session_count(uid, ts, datetime(2024-01-01),"
    " datetime(2024-01-08), 1d, 1d) | sort by ts asc"
)
SC_EXPECT = [
    (BASE, 2),
    (BASE + dt.timedelta(days=3), 1),
    (BASE + dt.timedelta(days=5), 1),
]


@pytest.fixture(scope="module")
def sc_engine(spark):
    ev = spark.createDataFrame(
        [
            (u, BASE + dt.timedelta(days=d, hours=2))
            for u, d in SC_ROWS
        ],
        "uid string, ts timestamp",
    )
    ev.createOrReplaceTempView("sc_ev")
    return PqlEngine(spark, {"sc_ev": ev})


def test_session_count(sc_engine):
    got = [(r.ts, r.count_) for r in sc_engine.query(SC_Q).collect()]
    assert got == SC_EXPECT


def test_session_count_sql(sc_engine, spark):
    got = [
        (r.ts, r.count_)
        for r in spark.sql(sc_engine.to_sql(SC_Q)).collect()
    ]
    assert got == SC_EXPECT


NA_ROWS = [
    ("u0", 0), ("u1", 0), ("u0", 1), ("u2", 1),
    ("u0", 2), ("u1", 2), ("u2", 2),
]
NA_Q = (
    "na_ev | evaluate new_activity_metrics(uid, ts,"
    " datetime(2024-01-01), datetime(2024-01-08), 1d)"
    " | sort by cohort_ts asc, ts asc"
)
# (cohort day, activity day, returning dcount, retention)
NA_EXPECT = [
    (1, 1, 2, 1.0), (1, 2, 1, 0.5), (1, 3, 2, 1.0),
    (2, 2, 1, 1.0), (2, 3, 1, 1.0),
]


@pytest.fixture(scope="module")
def na_engine(spark):
    ev = spark.createDataFrame(
        [
            (u, BASE + dt.timedelta(days=d, hours=1))
            for u, d in NA_ROWS
        ],
        "uid string, ts timestamp",
    )
    ev.createOrReplaceTempView("na_ev")
    return PqlEngine(spark, {"na_ev": ev})


def test_new_activity_metrics(na_engine):
    got = [
        (r.cohort_ts.day, r.ts.day, r.dcount, round(r.retention, 6))
        for r in na_engine.query(NA_Q).collect()
    ]
    assert got == NA_EXPECT


def test_new_activity_metrics_sql(na_engine, spark):
    got = [
        (r[0].day, r[1].day, r[2], round(r[3], 6))
        for r in spark.sql(na_engine.to_sql(NA_Q)).collect()
    ]
    assert got == NA_EXPECT


FS_ROWS = [
    ("u0", "view", 0), ("u0", "click", 1), ("u0", "buy", 2),
    ("u1", "view", 0), ("u1", "click", 1), ("u1", "buy", 73),
    ("u2", "click", 5),
]
FS_Q = (
    "fs_ev | evaluate funnel_sequence(uid, ts, datetime(2024-01-01),"
    ' datetime(2024-02-01), 1d, "click", state)'
)
# u0: (view, buy); u1: (view, NULL) — buy is 3 days later; u2: (∅, ∅)
FS_EXPECT = sorted(
    [("view", "buy", 1), ("view", None, 1), (None, None, 1)],
    key=lambda x: (str(x[0]), str(x[1])),
)


@pytest.fixture(scope="module")
def fs_engine(spark):
    ev = spark.createDataFrame(
        [
            (u, s, BASE + dt.timedelta(hours=h))
            for u, s, h in FS_ROWS
        ],
        "uid string, state string, ts timestamp",
    )
    ev.createOrReplaceTempView("fs_ev")
    return PqlEngine(spark, {"fs_ev": ev})


def test_funnel_sequence(fs_engine):
    got = sorted(
        ((r.prev, r.next, r.dcount) for r in
         fs_engine.query(FS_Q).collect()),
        key=lambda x: (str(x[0]), str(x[1])),
    )
    assert got == FS_EXPECT


def test_funnel_sequence_sql(fs_engine, spark):
    got = sorted(
        ((r.prev, r.next, r.dcount) for r in
         spark.sql(fs_engine.to_sql(FS_Q)).collect()),
        key=lambda x: (str(x[0]), str(x[1])),
    )
    assert got == FS_EXPECT


def test_errors(engine):
    with pytest.raises(QueryError, match="unknown column"):
        engine.query(
            "rw_ev | evaluate sliding_window_counts(nope, ts,"
            " datetime(2024-01-01), datetime(2024-01-02), 1d, 1h)"
        )
    with pytest.raises(QueryError, match="positive integer"):
        engine.query(
            "rw_ev | evaluate rolling_percentile(v, 50, eid, 10, 0)"
        )
    with pytest.raises(QueryError, match="0..100"):
        engine.query(
            "rw_ev | evaluate rolling_percentile(v, 500, eid, 10, 2)"
        )
