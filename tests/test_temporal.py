"""As-of and range join tests: hand-checked semantics plus a plan gate
(no nested-loop join anywhere — the whole point of these operators)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pql_spark.operators import asof_join, range_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", _ts(9), 10.0),
        ("A", _ts(11), 11.0),
        ("B", _ts(10), 20.0),
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", _ts(8), 100),   # before any quote → NULL
        ("A", _ts(9), 101),   # exactly at quote ts → 10.0 (<= semantics)
        ("A", _ts(10), 102),  # between quotes → 10.0
        ("A", _ts(12), 103),  # after both → 11.0
        ("B", _ts(10, 30), 104),
        ("C", _ts(10), 105),  # key with no quotes → NULL
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, qty int")


def test_asof_join_semantics(trades, quotes):
    out = {
        r.qty: r.px
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }
    assert out == {
        100: None,
        101: 10.0,
        102: 10.0,
        103: 11.0,
        104: 20.0,
        105: None,
    }


def test_asof_join_keeps_all_left_rows(trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym")
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "ts", "qty", "px"}


def test_asof_join_suffixes_collisions(spark, trades):
    right = trades.select("sym", "ts", F.col("qty"))
    out = asof_join(trades, right, on="ts", by="sym")
    assert "qty_r" in out.columns


def test_asof_join_forward(trades, quotes):
    out = {
        r.qty: r.px
        for r in asof_join(
            trades, quotes, on="ts", by="sym", direction="forward"
        ).collect()
    }
    # earliest quote at-or-after each trade
    assert out == {
        100: 10.0,  # 8:00 → next quote 9:00
        101: 10.0,  # exactly at 9:00 (>= semantics)
        102: 11.0,  # 10:00 → next quote 11:00
        103: None,  # after last quote
        104: None,  # B has no quote after 10:30
        105: None,
    }


def test_asof_join_tolerance(trades, quotes):
    out = {
        r.qty: r.px
        for r in asof_join(
            trades, quotes, on="ts", by="sym", tolerance="30 minutes"
        ).collect()
    }
    # matches further than 30 min are voided (trade 103 at 12:00 is 1h
    # after the 11:00 quote; trade 104 at 10:30 is exactly 30 min after)
    assert out == {
        100: None,
        101: 10.0,
        102: None,
        103: None,
        104: 20.0,
        105: None,
    }


def test_asof_join_no_nested_loop(trades, quotes):
    plan = (
        asof_join(trades, quotes, on="ts", by="sym")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_semantics(spark):
    points = spark.createDataFrame(
        [("u", _ts(9, 30), 1), ("u", _ts(12), 2), ("v", _ts(9, 30), 3)],
        "k string, ts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [("u", _ts(9), _ts(10), 10), ("u", _ts(9, 30), _ts(13), 11)],
        "k string, lo timestamp, hi timestamp, iid int",
    )
    out = range_join(points, intervals, by="k", bucket="1 hour")
    pairs = {(r.pid, r.iid) for r in out.collect()}
    # point 1 (9:30) falls in both u intervals; point 2 (12:00) only in
    # the second; v has no intervals
    assert pairs == {(1, 10), (1, 11), (2, 11)}


def test_range_join_no_nested_loop(spark):
    points = spark.createDataFrame(
        [("u", _ts(9, 30), 1)], "k string, ts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [("u", _ts(9), _ts(10), 10)],
        "k string, lo timestamp, hi timestamp, iid int",
    )
    plan = (
        range_join(points, intervals, by="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
