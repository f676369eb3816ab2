"""``evaluate active_users_count`` (simplified KQL plugin): engaged
ids per period bin — active in >= MinActivePeriods distinct periods of
the trailing LookbackPeriods.  Reference: brute-force python."""

from __future__ import annotations

import datetime as dt

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

T0 = dt.datetime(2024, 1, 1)
DAY = dt.timedelta(days=1)

EVENTS = [
    # u1 daily (always engaged); u2 alternating days; u3 one burst of
    # many events in one day (must NOT count as engaged with min 2);
    # u4 active days 0 and 6 (only engaged when both fall in window)
    *[(1, d) for d in range(0, 10)],
    *[(2, d) for d in range(0, 10, 2)],
    *[(3, 4)] * 5,
    (4, 0), (4, 6),
]
LOOK, MINP = 7, 2
NBINS = 10


def _py_reference():
    act = {}
    for u, d in EVENTS:
        act.setdefault(u, set()).add(d)
    out = {}
    for k in range(NBINS):
        window = set(range(max(0, k - LOOK + 1), k + 1))
        n = sum(
            1 for u, days in act.items() if len(days & window) >= MINP
        )
        if n:
            out[k] = n
    return out


@pytest.fixture(scope="module")
def engine(spark):
    rows = [(u, T0 + d * DAY) for u, d in EVENTS]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    return PqlEngine(spark, {"ev": ev})


Q = """
ev
| evaluate active_users_count(user_id, ts,
    datetime(2024-01-01), datetime(2024-01-11), 1d, 7, 2)
| sort by ts asc
"""


def test_matches_python_reference(engine):
    rows = engine.query(Q).collect()
    got = {(r.ts - T0).days: r.active_users for r in rows}
    assert got == _py_reference()
    # day 0: nobody has 2 distinct active days yet
    assert 0 not in got
    # day 1: u1 (days 0,1); u2 has only day 0 so far
    assert got[1] == 1
    # day 6: u1, u2, and u4 (days 0 and 6 both in the 7-day window)
    assert got[6] == 3
    # u3's single-day burst never counts
    assert all(v <= 3 for v in got.values())


def test_sql_backend_equivalent(engine, spark):
    sql = engine.to_sql(Q)
    df_rows = sorted(map(tuple, engine.query(Q).collect()))
    rows = [(u, T0 + d * DAY) for u, d in EVENTS]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp"
    ).createOrReplaceTempView("ev")
    sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    assert df_rows == sql_rows


UNALIGNED_Q = """
ev
| evaluate active_users_count(user_id, ts,
    datetime(2024-01-01), datetime(2024-01-02T12:00:00), 1d, 7, 1)
| sort by ts asc
"""


def test_unaligned_window(engine, spark):
    """(End-Start) not a multiple of Period: the partial trailing
    period has no bin — activity inside it is dropped, no phantom
    bin at ts >= End, and the last full bin is not inflated."""
    rows = engine.query(UNALIGNED_Q).collect()
    got = {r.ts: r.active_users for r in rows}
    # bins: day0 [01-01, 01-02); partial [01-02, 01-02T12) has no bin.
    # Day-0 actives: u1, u2, u4 (u3's burst is day 4, outside End).
    assert got == {T0: 3}
    # no bin at/after End, none inflated by the descending-sequence bug
    assert all(ts < dt.datetime(2024, 1, 2, 12) for ts in got)
    # SQL twin must agree (the bug was identical on both backends)
    sql = engine.to_sql(UNALIGNED_Q)
    ev = spark.createDataFrame(
        [(u, T0 + d * DAY) for u, d in EVENTS],
        "user_id long, ts timestamp",
    )
    ev.createOrReplaceTempView("ev")
    sql_rows = {r.ts: r.active_users for r in spark.sql(sql).collect()}
    assert sql_rows == got


def test_errors(engine):
    with pytest.raises(QueryError, match="MinActivePeriods"):
        engine.query(
            """ev | evaluate active_users_count(user_id, ts,
                datetime(2024-01-01), datetime(2024-01-11), 1d, 2, 7)"""
        )
    with pytest.raises(QueryError, match="unknown column"):
        engine.query(
            """ev | evaluate active_users_count(nope, ts,
                datetime(2024-01-01), datetime(2024-01-11), 1d, 7, 2)"""
        )
