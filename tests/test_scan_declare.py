"""Extended ``scan``: declare state variables with step assignments,
per-step output modes, and with_match_id renaming (KQL scan surface
beyond the simplified funnel form)."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine, QueryError


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "login", 10.0), (1, 2, "browse", 3.0),
            (1, 3, "buy", 99.0),
            (1, 4, "login", 1.0), (1, 5, "buy", 5.0),
            (2, 1, "buy", 7.0),  # no login first → no match
            (2, 2, "login", 2.0), (2, 3, "buy", 4.0),
        ],
        "uid long, t long, e string, amount double",
    )
    return PqlEngine(spark, resolver={"E": df})


def test_declare_captures_step_values(engine):
    out = engine.query(
        """E | scan by uid order by t asc
             declare (login_t = tolong(0), total = 0.0)
             with (
               step s1: e == "login" => login_t = t, total = amount;
               step s2: e == "buy" => total = amount;
             )
           | project uid, match_id, step, t, login_t, total"""
    )
    rows = sorted(map(tuple, out.collect()))
    # uid 1: match 0 = login@1..buy@3, match 1 = login@4..buy@5
    # uid 2: match 0 = login@2..buy@3
    assert rows == [
        (1, 0, "s1", 1, 1, 10.0),
        (1, 0, "s2", 3, 1, 99.0),
        (1, 1, "s1", 4, 4, 1.0),
        (1, 1, "s2", 5, 4, 5.0),
        (2, 0, "s1", 2, 2, 2.0),
        (2, 0, "s2", 3, 2, 4.0),
    ]


def test_declare_resets_between_matches(engine):
    # login_t on the SECOND match must come from its own login row,
    # not leak from the first (covered above: match 1 has login_t=4)
    out = engine.query(
        """E | scan by uid order by t asc
             declare (login_t = tolong(-1))
             with (step s1: e == "login" => login_t = t;
                   step s2 output=none: e == "browse";
                   step s3: e == "buy";)
           | project uid, match_id, step, login_t"""
    )
    rows = sorted(map(tuple, out.collect()))
    # only uid 1 has login→browse→buy; browse row suppressed by
    # output=none; the buy row still sees login_t (init would be -1)
    assert rows == [(1, 0, "s1", 1), (1, 0, "s3", 1)]


def test_output_none_and_with_match_id(engine):
    out = engine.query(
        """E | scan with_match_id = mid by uid order by t asc with (
               step s1 output=none: e == "login";
               step s2: e == "buy";)
           | project uid, mid, step, t"""
    )
    assert "mid" in out.columns and "match_id" not in out.columns
    rows = sorted(map(tuple, out.collect()))
    assert rows == [
        (1, 0, "s2", 3), (1, 1, "s2", 5), (2, 0, "s2", 3)
    ]


def test_string_state_and_last_mode(engine):
    out = engine.query(
        """E | scan by uid order by t asc
             declare (what = "")
             with (step s1: e == "login";
                   step s2 output=last: e == "buy" => what = e;)
           | project uid, step, what"""
    )
    rows = sorted(map(tuple, out.collect()))
    # s1 rows carry the INIT value (assignment happens at s2)
    assert rows == [
        (1, "s1", ""), (1, "s1", ""), (1, "s2", "buy"), (1, "s2", "buy"),
        (2, "s1", ""), (2, "s2", "buy"),
    ]


def test_scan_declare_errors(engine):
    with pytest.raises(QueryError, match="undeclared"):
        engine.query(
            'E | scan order by t asc with (step s: e == "x" => v = 1)'
        )
    with pytest.raises(QueryError, match="output must be"):
        engine.query(
            "E | scan order by t asc with"
            ' (step s output=some: e == "x")'
        )
    with pytest.raises(QueryError, match="already has"):
        engine.query(
            "E | scan by uid order by t asc declare (amount = 0.0)"
            ' with (step s: e == "x")'
        )


def test_declare_long_var_null_assignment(spark):
    # ADVICE r3: a LongType assignment column containing nulls arrives
    # from Arrow as float64+NaN; capturing a NULL on a matched row must
    # yield a NULL long (not crash on NaN→int64, not truncate)
    df = spark.createDataFrame(
        [
            (1, 1, "a", 7), (1, 2, "b", None),
            (2, 1, "a", None), (2, 2, "b", 5),
        ],
        "uid long, t long, e string, v long",
    )
    eng = PqlEngine(spark, resolver={"E": df})
    out = eng.query(
        """E | scan by uid order by t asc
             declare (cap = tolong(0))
             with (step s1: e == "a" => cap = v;
                   step s2: e == "b" => cap = v;)
           | project uid, step, cap"""
    )
    assert dict(out.dtypes)["cap"] == "bigint"
    rows = sorted(
        ((r.uid, r.step, r.cap) for r in out.collect()),
        key=lambda x: (x[0], x[1]),
    )
    assert rows == [
        (1, "s1", 7), (1, "s2", None),
        (2, "s1", None), (2, "s2", 5),
    ]


def test_declare_bool_and_string_null_assignment(spark):
    df = spark.createDataFrame(
        [(1, 1, "a", True, "x"), (1, 2, "b", None, None)],
        "uid long, t long, e string, f boolean, s string",
    )
    eng = PqlEngine(spark, resolver={"E": df})
    out = eng.query(
        """E | scan by uid order by t asc
             declare (fb = tobool(true), sv = "")
             with (step s1: e == "a" => fb = f, sv = s;
                   step s2: e == "b" => fb = f, sv = s;)
           | project step, fb, sv"""
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [("s1", True, "x"), ("s2", None, None)]
