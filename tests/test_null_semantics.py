"""Exhaustive null-semantics verification (SURVEY §7.4.1).

PQL's comparison semantics (null-safe ``==``/``!=`` coalescing to
FALSE, un-coalesced ``=~``/``in``, ``iff`` condition coalescing) are
the subtlest part of the surface.  This test evaluates every operator
over the FULL cross product of a small value domain including NULLs on
Spark, and compares against DuckDB evaluating the reference's
documented SQL rewrites — not spot checks, the whole truth table.
"""

from __future__ import annotations

import duckdb
import pytest

from pql_spark import PqlEngine

DOMAIN = [None, -2, 0, 1, 2]

# (pql expression over columns a/b, duckdb SQL per the reference's
# rewrite rules from pql.go:659-792 / 979-1004)
CASES = [
    ("a == b", "coalesce(a = b, FALSE)"),
    ("a != b", "coalesce(a <> b, FALSE)"),
    ("a < b", "a < b"),
    ("a >= b", "a >= b"),
    ("a + b", "a + b"),
    ("a * b", "a * b"),
    ("a % b", "a % b"),  # NULL on zero divisor both sides
    ("a / b", "a / b"),
    ("a in (1, 2)", "a IN (1, 2)"),
    ("iff(a > b, 1, 0)", "CASE WHEN coalesce(a > b, FALSE) THEN 1 ELSE 0 END"),
    ("isnull(a)", "a IS NULL"),
    ("isnotnull(a)", "a IS NOT NULL"),
    ("not(a > 0)", "NOT (a > 0)"),
    (
        "iff(a == b, a, b)",
        "CASE WHEN coalesce(a = b, FALSE) THEN a ELSE b END",
    ),
    ("a > 0 and b > 0", "a > 0 AND b > 0"),
    ("a > 0 or b > 0", "a > 0 OR b > 0"),
]


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (i, a, b)
        for i, (a, b) in enumerate(
            (a, b) for a in DOMAIN for b in DOMAIN
        )
    ]
    return rows, spark.createDataFrame(rows, "i long, a long, b long")


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


STR_DOMAIN = [None, "", "A", "a", "b"]
# NOTE: unicode special-casing (ß→SS vs ẞ) diverges between JVM and
# DuckDB collations and is intentionally out of scope here.

STR_CASES = [
    # strcat emits NULL-propagating concatenation (the reference's `||`,
    # pql.go:922-943) — NOT DuckDB's NULL-skipping concat()
    ("strcat(a, b)", "a || b"),
    ('strcat(a, "-", b)', "a || '-' || b"),
    ("tolower(a)", "lower(a)"),
    ("toupper(a)", "upper(a)"),
    ("a =~ b", "lower(a) = lower(b)"),
    ("a !~ b", "lower(a) <> lower(b)"),
    ("a == b", "coalesce(a = b, FALSE)"),
    ("isnull(a)", "a IS NULL"),
    ('iff(a == "", "empty", a)',
     "CASE WHEN coalesce(a = '', FALSE) THEN 'empty' ELSE a END"),
]


@pytest.fixture(scope="module")
def str_pairs(spark):
    rows = [
        (i, a, b)
        for i, (a, b) in enumerate(
            (a, b) for a in STR_DOMAIN for b in STR_DOMAIN
        )
    ]
    return rows, spark.createDataFrame(rows, "i long, a string, b string")


@pytest.mark.parametrize("pql_expr,sql_expr", STR_CASES)
def test_string_truth_table_matches_duckdb(spark, str_pairs, pql_expr, sql_expr):
    rows, df = str_pairs
    engine = PqlEngine(spark, resolver=lambda n: df)
    got = {
        r.i: _norm(r.v)
        for r in engine.query(f"t | project i, v = {pql_expr}").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        i: _norm(v)
        for i, v in con.execute(f"SELECT i, {sql_expr} AS v FROM t").fetchall()
    }
    assert got == want, f"{pql_expr!r} truth table diverges"


@pytest.mark.parametrize("pql_expr,sql_expr", CASES)
def test_truth_table_matches_duckdb(spark, pairs, pql_expr, sql_expr):
    rows, df = pairs
    engine = PqlEngine(spark, resolver=lambda n: df)
    got = {
        r.i: _norm(r.v)
        for r in engine.query(
            f"t | project i, v = {pql_expr}"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        i: _norm(v)
        for i, v in con.execute(
            f"SELECT i, {sql_expr} AS v FROM t"
        ).fetchall()
    }
    assert got == want, f"{pql_expr!r} truth table diverges"
