"""``invoke`` + tabular-bodied let-functions (KQL views):
``let f = (t: (*), n: long) { t | … };  T | invoke f(5)``."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine, QueryError


@pytest.fixture(scope="module")
def engine(spark):
    t = spark.createDataFrame(
        [(i, float(i * 10), "ab"[i % 2]) for i in range(1, 8)],
        "id long, v double, g string",
    )
    return PqlEngine(spark, resolver={"T": t})


def test_invoke_sort_take(engine):
    out = engine.query(
        "let topv = (t: (*), n: long) { t | sort by v desc | take n };"
        " T | invoke topv(3) | sort by id asc"
    )
    assert [r.id for r in out.collect()] == [5, 6, 7]


def test_invoke_summarize(engine):
    out = engine.query(
        "let big = (src: (*), thr: real)"
        " { src | where v >= thr | summarize n = count(), s = sum(v) };"
        " T | invoke big(40.0)"
    )
    assert [tuple(r) for r in out.collect()] == [(4, 220.0)]


def test_invoke_no_scalar_args(engine):
    out = engine.query(
        "let evens = (t: (*)) { t | where id % 2 == 0 };"
        " T | invoke evens() | count"
    )
    assert out.head()[0] == 3


def test_invoke_chained_and_shadowing(engine):
    # two invocations in one pipeline; param name reuse doesn't leak
    out = engine.query(
        "let clamp = (t: (*), lo: long, hi: long)"
        " { t | where id >= lo and id <= hi };"
        " let takeit = (t: (*), lo: long) { t | sort by id asc"
        " | take lo };"
        " T | invoke clamp(2, 6) | invoke takeit(2) | project id"
    )
    assert [r.id for r in out.collect()] == [2, 3]


def test_invoke_param_used_in_join_side(engine):
    # the tabular parameter can appear as a join right side too
    out = engine.query(
        "let selfjoin = (t: (*)) { t | join kind=inner (t) on id"
        " | count };"
        " T | invoke selfjoin()"
    )
    assert out.head()[0] == 7


def test_invoke_errors(engine):
    with pytest.raises(QueryError):  # scalar-bodied fn
        engine.query("let f = (x: long) { x + 1 }; T | invoke f(1)")
    with pytest.raises(QueryError):  # argc
        engine.query(
            "let g = (t: (*), n: long) { t | take n }; T | invoke g()"
        )
    with pytest.raises(QueryError):  # unknown
        engine.query("T | invoke nosuch(1)")
    with pytest.raises(QueryError):  # tabular param must be first
        engine.query(
            "let h = (n: long, t: (*)) { t | take n };"
            " T | invoke h(1)"
        )


def _both_backends(spark, t, text):
    from pql_spark import compile_to_sql

    t.createOrReplaceTempView("T")
    try:
        df_rows = sorted(
            map(tuple, PqlEngine(spark, resolver={"T": t}).query(text)
                .collect())
        )
        sql = compile_to_sql(text, lambda n: {"T": t.columns}[n])
        sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
    finally:
        spark.catalog.dropTempView("T")
    assert sql_rows == df_rows, sql
    assert df_rows


@pytest.mark.parametrize(
    "text",
    [
        "let topv = (t: (*), n: long) { t | sort by v desc | take n };"
        " T | invoke topv(3) | sort by id asc",
        "let big = (src: (*), thr: real)"
        " { src | where v >= thr | summarize n = count(), s = sum(v) };"
        " T | invoke big(40.0)",
        "let evens = (t: (*)) { t | where id % 2 == 0 };"
        " T | invoke evens() | count",
        "let clamp = (t: (*), lo: long, hi: long)"
        " { t | where id >= lo and id <= hi };"
        " let takeit = (t: (*), lo: long) { t | sort by id asc"
        " | take lo };"
        " T | invoke clamp(2, 6) | invoke takeit(2) | project id",
        # scalar let-function used INSIDE an invoked tabular body
        "let dbl = (x: real) { x * 2 };"
        " let f = (t: (*), thr: real) { t | where v >= dbl(thr) };"
        " T | invoke f(20.0) | project id | sort by id asc",
    ],
)
def test_invoke_sql_backend_equivalence(spark, text):
    """`invoke` compiles on the SQL backend too (r7 VERDICT item 7):
    the piped subquery binds the tabular parameter via the same
    named-subquery device as `as`/tabular-let, scalar args substitute
    textually."""
    t = spark.createDataFrame(
        [(i, float(i * 10), "ab"[i % 2]) for i in range(1, 8)],
        "id long, v double, g string",
    )
    _both_backends(spark, t, text)
