"""``evaluate activity_engagement`` (KQL plugin, DAU/MAU stickiness):
per inner-window bin, distinct ids active in the bin, distinct ids
active in the trailing outer window, and their ratio.  Reference:
brute-force python over a hand-built log."""

from __future__ import annotations

import datetime as dt

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

T0 = dt.datetime(2024, 1, 1)
DAY = dt.timedelta(days=1)

EVENTS = [
    # (user, day offset) — u1 active daily, u2 every 3rd day, u3 once
    *[(1, d) for d in range(0, 10)],
    *[(2, d) for d in (0, 3, 6, 9)],
    (3, 4),
]
START, END = T0, T0 + 10 * DAY
INNER_D, OUTER_D = 1, 7


def _py_reference():
    out = {}
    for k in range(10):
        bin_start = k
        inner = {
            u for u, d in EVENTS if bin_start <= d < bin_start + INNER_D
        }
        lo = bin_start + INNER_D - OUTER_D
        outer = {
            u for u, d in EVENTS if lo <= d < bin_start + INNER_D
        }
        if outer:
            out[k] = (len(inner), len(outer), len(inner) / len(outer))
    return out


@pytest.fixture(scope="module")
def engine(spark):
    rows = [(u, T0 + d * DAY) for u, d in EVENTS]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    return PqlEngine(spark, {"ev": ev})


Q = """
ev
| evaluate activity_engagement(user_id, ts,
    datetime(2024-01-01), datetime(2024-01-11), 1d, 7d)
| sort by ts asc
"""


def test_matches_python_reference(engine):
    rows = engine.query(Q).collect()
    got = {
        (r.ts - T0).days: (
            r.dcount_activities_inner,
            r.dcount_activities_outer,
            r.activity_ratio,
        )
        for r in rows
    }
    want = _py_reference()
    assert got == want
    # hand-checked: day 4 inner = {1, 3}; outer (days -2..4) = {1,2,3}
    assert got[4] == (2, 3, pytest.approx(2 / 3))
    # day 0: only day-0 activity in the trailing window
    assert got[0] == (2, 2, 1.0)


def test_sql_backend_equivalent(engine, spark):
    sql = engine.to_sql(Q)
    df_rows = sorted(map(tuple, engine.query(Q).collect()))
    rows = [(u, T0 + d * DAY) for u, d in EVENTS]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp"
    ).createOrReplaceTempView("ev")
    sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    assert df_rows == sql_rows


def test_errors(engine):
    with pytest.raises(QueryError, match="InnerActivityWindow"):
        engine.query(
            """ev | evaluate activity_engagement(user_id, ts,
                datetime(2024-01-01), datetime(2024-01-11), 7d, 1d)"""
        )
    with pytest.raises(QueryError, match="unknown column"):
        engine.query(
            """ev | evaluate activity_engagement(nope, ts,
                datetime(2024-01-01), datetime(2024-01-11), 1d, 7d)"""
        )
