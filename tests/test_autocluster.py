"""``evaluate autocluster`` / ``basket`` — CUBE-based segment mining."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    rows = (
        [("us", "web", "ok")] * 6
        + [("us", "app", "ok")] * 3
        + [("eu", "web", None)]
    )
    return {
        "T": spark.createDataFrame(
            rows, "region string, chan string, status string"
        )
    }


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def test_autocluster_segments(engine):
    out = engine.query("T | evaluate autocluster(50, region, chan)")
    assert out.columns == ["SegmentCount", "Percent", "region", "chan"]
    rows = [tuple(r) for r in out.collect()]
    # 10 rows total: us=9 (90%), web=7 (70%), us+web=6 (60%)
    assert rows == [
        (9, 90.0, "us", "*"),
        (7, 70.0, "*", "web"),
        (6, 60.0, "us", "web"),
    ]


def test_autocluster_null_bucket_and_default_cols(engine):
    out = engine.query("T | evaluate autocluster(5)")  # all string cols
    rows = {tuple(r) for r in out.collect()}
    assert (1, 10.0, "eu", "web", "(null)") in rows
    # the all-wildcard row is excluded
    assert not any(
        r[2] == "*" and r[3] == "*" and r[4] == "*" for r in rows
    )


def test_basket_alias(engine):
    a = [tuple(r) for r in
         engine.query("T | evaluate basket(50, region, chan)").collect()]
    b = [tuple(r) for r in
         engine.query(
             "T | evaluate autocluster(50, region, chan)"
         ).collect()]
    assert a == b


def test_autocluster_sql_backend(spark, tables, engine):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    q = "T | evaluate autocluster(20, region, chan, status)"
    a = [tuple(r) for r in engine.query(q).collect()]
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert [tuple(r) for r in spark.sql(sql).collect()] == a


def test_autocluster_errors(engine):
    with pytest.raises(QueryError):
        engine.query("T | evaluate autocluster(5, ghost)")
    with pytest.raises(QueryError):
        engine.query(
            "T | evaluate autocluster(5, region, chan, status,"
            " region, chan, status, region)"
        )  # > 6 columns
