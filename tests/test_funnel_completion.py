"""``evaluate funnel_completion`` (EXTENSION, simplified KQL
funnel_sequence_completion): greedy-earliest anchored chains, counted
per (step, max-window).  Reference: a tiny hand-built event log with
hand-computed chains, plus a brute-force python reference."""

from __future__ import annotations

import datetime as dt

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

T0 = dt.datetime(2024, 1, 1)


def _ev(uid, minutes, state):
    return (uid, T0 + dt.timedelta(minutes=minutes), state)


EVENTS = [
    # user 1: a@0 -> b@10 -> c@30   (chain spans 10, 30 min)
    _ev(1, 0, "a"), _ev(1, 10, "b"), _ev(1, 30, "c"),
    # user 2: a@0 -> b@200 (b outside 1h window; inside 6h)
    _ev(2, 0, "a"), _ev(2, 200, "b"),
    # user 3: b first (no anchor 'a' before b? anchor = first a@50),
    # then b@60 -> c@70: chain a@50, b@60, c@70
    _ev(3, 0, "b"), _ev(3, 50, "a"), _ev(3, 60, "b"), _ev(3, 70, "c"),
    # user 4: only c — never enters the funnel
    _ev(4, 5, "c"),
    # user 5: a@0, c@10 (skips b — chain stops at step 1)
    _ev(5, 0, "a"), _ev(5, 10, "c"),
    # user 6: two a's; anchor is the FIRST (a@0), b@500 only
    # completes in the 12h window
    _ev(6, 0, "a"), _ev(6, 400, "a"), _ev(6, 500, "b"),
]


def _py_reference(windows_min):
    """Brute-force greedy-earliest chains."""
    by_id = {}
    for uid, ts, st in EVENTS:
        by_id.setdefault(uid, []).append((ts, st))
    seq = ["a", "b", "c"]
    out = {}  # (step, state, w) -> count
    for uid, evs in by_id.items():
        evs.sort()
        t1 = next((t for t, s in evs if s == "a"), None)
        if t1 is None:
            continue
        chain = [t1]
        for s in seq[1:]:
            nxt = next(
                (t for t, st in evs if st == s and t >= chain[-1]), None
            )
            if nxt is None:
                break
            chain.append(nxt)
        for j, tj in enumerate(chain, start=1):
            span = (tj - t1).total_seconds() / 60
            for w in windows_min:
                if span <= w:
                    key = (j, seq[j - 1], w)
                    out[key] = out.get(key, 0) + 1
    return out


@pytest.fixture(scope="module")
def engine(spark):
    ev = spark.createDataFrame(
        EVENTS, "user_id long, ts timestamp, event_type string"
    )
    return PqlEngine(spark, {"ev": ev})


def test_matches_python_reference(engine):
    rows = engine.query(
        """
        ev
        | evaluate funnel_completion(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), event_type,
            ("a", "b", "c"), (1h, 6h, 12h))
        | sort by step asc, period asc
        """
    ).collect()
    got = {
        (r.step, r.state, r.period // 60_000_000): r.dcount
        for r in rows
        if r.dcount > 0
    }
    want = _py_reference([60, 360, 720])
    assert got == want
    # sanity on the hand-built data
    assert got[(1, "a", 60)] == 5          # users 1,2,3,5,6
    assert got[(2, "b", 60)] == 2          # users 1 (10m), 3 (10m)
    assert got[(2, "b", 360)] == 3         # + user 2 (200m)
    assert got[(2, "b", 720)] == 4         # + user 6 (500m)
    assert got[(3, "c", 60)] == 2          # users 1 (30m), 3 (20m)


def test_zero_rows_emitted_for_empty_steps(engine):
    rows = engine.query(
        """
        ev
        | evaluate funnel_completion(user_id, ts,
            datetime(2024-01-01), datetime(2024-02-01), event_type,
            ("c", "zzz"), (1h))
        """
    ).collect()
    # step 1 = every user with a 'c' (users 1,3,4,5); step 2 never
    # happens -> no row
    assert {(r.step, r.dcount) for r in rows} == {(1, 4)}


def test_sql_backend_equivalent(engine, spark):
    q = """
    ev
    | evaluate funnel_completion(user_id, ts,
        datetime(2024-01-01), datetime(2024-02-01), event_type,
        ("a", "b", "c"), (1h, 6h, 12h))
    | sort by step asc, period asc
    """
    sql = engine.to_sql(q)
    df_rows = sorted(map(tuple, engine.query(q).collect()))
    ev = spark.createDataFrame(
        EVENTS, "user_id long, ts timestamp, event_type string"
    )
    ev.createOrReplaceTempView("ev")
    sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    assert df_rows == sql_rows


def test_errors(engine):
    with pytest.raises(QueryError, match="unknown column"):
        engine.query(
            """ev | evaluate funnel_completion(nope, ts,
                datetime(2024-01-01), datetime(2024-02-01),
                event_type, ("a"), (1h))"""
        )
    with pytest.raises(QueryError, match="windows must be positive"):
        engine.query(
            """ev | evaluate funnel_completion(user_id, ts,
                datetime(2024-01-01), datetime(2024-02-01),
                event_type, ("a"), (0h))"""
        )
