"""``evaluate diffpatterns_text`` (EXTENSION, simplified KQL):
token-level cohort diff — which words' row coverage differs most
between split values A and B.  Reference: brute-force python."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

ROWS = [
    ("A", "timeout connecting to auth service"),
    ("A", "timeout connecting to db service"),
    ("A", "auth token expired timeout"),
    ("A", "request ok"),
    ("B", "request ok"),
    ("B", "request ok fast"),
    ("B", "slow request but ok"),
    ("B", "auth ok"),
    ("C", "ignored cohort noise"),
]


def _py_reference(min_diff):
    a = [t.lower().split() for c, t in ROWS if c == "A"]
    b = [t.lower().split() for c, t in ROWS if c == "B"]
    vocab = {w for doc in a + b for w in doc}
    out = {}
    for w in vocab:
        ca = sum(1 for doc in a if w in doc)
        cb = sum(1 for doc in b if w in doc)
        pa = round(ca * 100.0 / len(a), 2)
        pb = round(cb * 100.0 / len(b), 2)
        diff = round(abs(pa - pb), 2)
        if diff >= min_diff:
            out[w] = (ca, cb, pa, pb, diff)
    return out


@pytest.fixture(scope="module")
def engine(spark):
    t = spark.createDataFrame(ROWS, "cohort string, msg string")
    return PqlEngine(spark, {"t": t})


Q = 't | evaluate diffpatterns_text(cohort, "A", "B", msg, 20)'


def test_matches_python_reference(engine):
    rows = engine.query(Q).collect()
    got = {
        r.token: (r.CountA, r.CountB, r.PercentA, r.PercentB,
                  r.PercentDiff)
        for r in rows
    }
    assert got == _py_reference(20)
    # 'timeout' covers 75% of A, 0% of B
    assert got["timeout"] == (3, 0, 75.0, 0.0, 75.0)
    # 'ok' covers 25% of A, 100% of B
    assert got["ok"] == (1, 4, 25.0, 100.0, 75.0)
    # cohort C's tokens never appear
    assert "noise" not in got


def test_sql_backend_equivalent(engine, spark):
    sql = engine.to_sql(Q)
    df_rows = sorted(map(tuple, engine.query(Q).collect()))
    spark.createDataFrame(
        ROWS, "cohort string, msg string"
    ).createOrReplaceTempView("t")
    sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    assert df_rows == sql_rows


def test_errors(engine):
    with pytest.raises(QueryError, match="unknown column"):
        engine.query(
            't | evaluate diffpatterns_text(nope, "A", "B", msg)'
        )
    with pytest.raises(QueryError, match="unknown column"):
        engine.query(
            't | evaluate diffpatterns_text(cohort, "A", "B", zz)'
        )
