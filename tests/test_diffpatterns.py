"""``evaluate diffpatterns`` (EXTENSION, simplified KQL): cohort-diff
segment mining over a CUBE.  Reference: brute-force python over a
hand-built table."""

from __future__ import annotations

import itertools

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

ROWS = [
    # (split, svc, sev) — cohort A is dominated by (auth, high)
    *[("A", "auth", "high")] * 6,
    *[("A", "auth", "low")] * 1,
    *[("A", "web", "low")] * 3,
    *[("B", "auth", "high")] * 1,
    *[("B", "web", "low")] * 6,
    *[("B", "db", "low")] * 3,
    ("C", "noise", "low"),  # other cohorts ignored by the counts
]


def _py_reference(min_diff):
    a = [(s, v) for c, s, v in ROWS if c == "A"]
    b = [(s, v) for c, s, v in ROWS if c == "B"]
    out = {}
    for mask in itertools.product([0, 1], repeat=2):
        if mask == (1, 1):
            continue  # all-wildcard row excluded (gsum == k)
        pats = set()
        for s, v in a + b:
            pats.add((s if not mask[0] else "*", v if not mask[1] else "*"))
        for p in pats:
            ca = sum(
                1 for s, v in a
                if (p[0] in ("*", s)) and (p[1] in ("*", v))
            )
            cb = sum(
                1 for s, v in b
                if (p[0] in ("*", s)) and (p[1] in ("*", v))
            )
            pa = round(ca * 100.0 / len(a), 2)
            pb = round(cb * 100.0 / len(b), 2)
            diff = round(abs(pa - pb), 2)
            if diff >= min_diff:
                out[p] = (ca, cb, pa, pb, diff)
    return out


@pytest.fixture(scope="module")
def engine(spark):
    t = spark.createDataFrame(
        ROWS, "cohort string, svc string, sev string"
    )
    return PqlEngine(spark, {"t": t})


Q = 't | evaluate diffpatterns(cohort, "A", "B", 10, svc, sev)'


def test_matches_python_reference(engine):
    rows = engine.query(Q).collect()
    got = {
        (r.svc, r.sev): (
            r.CountA, r.CountB, r.PercentA, r.PercentB, r.PercentDiff
        )
        for r in rows
    }
    assert got == _py_reference(10)
    # the headline diff: (auth, high) is 60% of A vs 10% of B
    assert got[("auth", "high")] == (6, 1, 60.0, 10.0, 50.0)
    assert ("*", "*") not in got


def test_sql_backend_equivalent(engine, spark):
    sql = engine.to_sql(Q)
    df_rows = sorted(map(tuple, engine.query(Q).collect()))
    spark.createDataFrame(
        ROWS, "cohort string, svc string, sev string"
    ).createOrReplaceTempView("t")
    sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    assert df_rows == sql_rows


def test_default_columns_and_threshold(engine):
    # no explicit columns: every string column except the split
    rows = engine.query(
        't | evaluate diffpatterns(cohort, "A", "B")'
    ).collect()
    assert rows and set(rows[0].asDict()) == {
        "CountA", "CountB", "PercentA", "PercentB", "PercentDiff",
        "svc", "sev",
    }


def test_errors(engine):
    with pytest.raises(QueryError, match="unknown split column"):
        engine.query('t | evaluate diffpatterns(nope, "A", "B", svc)')
    with pytest.raises(QueryError, match="unknown column"):
        engine.query('t | evaluate diffpatterns(cohort, "A", "B", zz)')
