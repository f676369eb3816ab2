"""profile_columns: one-scan per-column stats (n / nulls / distinct /
numeric range), approx (HLL) and exact modes."""

from __future__ import annotations

import pytest

from pql_spark.operators import profile_columns


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "a", 1.5, None),
        (2, "b", -2.0, "x"),
        (3, None, 1.5, "x"),
        (4, "a", None, "y"),
        (5, "c", 99.25, None),
    ]
    return spark.createDataFrame(
        rows, "id long, s string, v double, t string"
    )


def test_exact_profile(table):
    out = {
        r.column: r
        for r in profile_columns(table, approx=False).collect()
    }
    assert set(out) == {"id", "s", "v", "t"}
    assert all(r.n == 5 for r in out.values())
    assert (out["id"].n_null, out["id"].n_distinct) == (0, 5)
    assert (out["s"].n_null, out["s"].n_distinct) == (1, 3)
    assert (out["v"].n_null, out["v"].n_distinct) == (1, 3)
    assert (out["t"].n_null, out["t"].n_distinct) == (2, 2)
    # numeric ranges; non-numeric columns stay NULL
    assert (out["id"].min_num, out["id"].max_num) == (1.0, 5.0)
    assert (out["v"].min_num, out["v"].max_num) == (-2.0, 99.25)
    assert out["s"].min_num is None and out["s"].max_num is None
    assert out["id"].dtype == "bigint" and out["s"].dtype == "string"


def test_approx_profile_close(table):
    out = {
        r.column: r for r in profile_columns(table).collect()
    }
    # HLL at this cardinality is exact-ish; ±1 is generous
    assert abs(out["id"].n_distinct - 5) <= 1
    assert abs(out["s"].n_distinct - 3) <= 1


def test_column_subset_and_errors(table):
    out = profile_columns(table, cols=["id"], approx=False).collect()
    assert [r.column for r in out] == ["id"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(table, cols=["nope"])


def test_single_scan_plan(table):
    """All stats come from ONE aggregation over the input — the plan
    must contain exactly one scan of the source."""
    df = profile_columns(table, approx=True)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_empty_table(spark):
    empty = spark.createDataFrame([], "a long, b string")
    out = {r.column: r for r in
           profile_columns(empty, approx=False).collect()}
    assert out["a"].n == 0 and out["a"].n_null == 0
    assert out["a"].n_distinct == 0
    assert out["a"].min_num is None


# ------------------------------------------------------------- histogram


def test_histogram_explicit_bounds(spark):
    from pql_spark.operators import numeric_histogram

    df = spark.createDataFrame(
        [(float(x) if x is not None else None,)
         for x in [0, 1, 2, 5, 5, 9, 10, -3, 42, None]],
        "v double",
    )
    out = {r.bin: (r.lo, r.hi, r.n) for r in
           numeric_histogram(df, "v", bins=5, lo=0.0, hi=10.0)
           .collect()}
    # width 2: [0,2)x2{0,1}, [2,4)x1{2}, [4,6)x2{5,5}, [8,10]x2{9,10}
    # clamped: -3 -> bin 0, 42 -> bin 4; null dropped
    assert out[0] == (0.0, 2.0, 3)
    assert out[1] == (2.0, 4.0, 1)
    assert out[2] == (4.0, 6.0, 2)
    assert out[4] == (8.0, 10.0, 3)
    assert 3 not in out  # empty bin omitted
    assert sum(n for _, _, n in out.values()) == 9


def test_histogram_auto_bounds(spark):
    from pql_spark.operators import numeric_histogram

    df = spark.createDataFrame(
        [(float(x),) for x in range(100)], "v double"
    )
    rows = numeric_histogram(df, "v", bins=10).collect()
    assert len(rows) == 10
    assert rows[0].lo == 0.0 and abs(rows[-1].hi - 99.0) < 1e-9
    # max value closes into the top bin
    assert [r.n for r in rows] == [10] * 9 + [10]


def test_histogram_degenerate_range(spark):
    from pql_spark.operators import numeric_histogram

    df = spark.createDataFrame([(7.0,)] * 5, "v double")
    rows = numeric_histogram(df, "v", bins=4).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n == 5


def test_histogram_validation(spark):
    from pql_spark.operators import numeric_histogram

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        numeric_histogram(df, "v", bins=0)
    with pytest.raises(ValueError):
        numeric_histogram(df, "v", bins=4, lo=5.0, hi=5.0)


def test_grouped_profile(table):
    """group_by= profiles per group: same stats computed within each
    group, group column leads and is excluded from profiled columns."""
    out = {}
    for r in profile_columns(
        table, approx=False, group_by="s"
    ).collect():
        out[(r.s, r.column)] = (r.n, r.n_null, r.n_distinct)
    # group 'a': rows (1,a,1.5,None) and (4,a,None,'y')
    assert out[("a", "id")] == (2, 0, 2)
    assert out[("a", "v")] == (2, 1, 1)
    assert out[("a", "t")] == (2, 1, 1)
    # null group key forms its own group (Spark groupBy semantics)
    assert out[(None, "id")] == (1, 0, 1)
    assert "s" not in {c for _, c in out}
