"""series_fill_backward, series_iir, dcount_intersect, parse_csv —
DataFrame-backend semantics vs python references plus SQL-backend
equivalence (both backends emit the same fold shapes)."""

from __future__ import annotations

import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [
            (1, [1.0, None, None, 4.0, None], [1.0, 2.0, 3.0, 4.0],
             'a,b,"c,d",e'),
            (2, [None, 2.0], [], 'x,"he said ""hi""",z\nsecond,line'),
            (3, [], None, ""),
        ],
        "id long, a array<double>, x array<double>, csv string",
    )
    u = spark.createDataFrame(
        [(i, i % 7, i % 5) for i in range(50)], "id long, u long, v long"
    )
    return {"T": t, "U": u}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_fill_backward(engine):
    out = {
        r.id: r.f
        for r in engine.query("T | project id, f = series_fill_backward(a)")
        .collect()
    }
    assert out[1] == [1.0, 4.0, 4.0, 4.0, None]
    assert out[2] == [2.0, 2.0]
    assert out[3] == []


def _iir_ref(x, b, a):
    y = []
    for i in range(len(x)):
        acc = sum(
            b[j] * (x[i - j] or 0.0)
            for j in range(len(b))
            if 0 <= i - j < len(x)
        )
        acc -= sum(
            a[k] * y[i - k] for k in range(1, len(a)) if 0 <= i - k < len(y)
        )
        y.append(acc / a[0])
    return y


def test_series_iir_matches_reference(engine):
    out = {
        r.id: r.f
        for r in engine.query(
            "T | project id, f = series_iir(x, pack_array(1.0),"
            " pack_array(1.0, -0.5))"
        ).collect()
    }
    # exponential smoothing y[i] = x[i] + 0.5*y[i-1]
    ref = _iir_ref([1.0, 2.0, 3.0, 4.0], [1.0], [1.0, -0.5])
    assert out[1] == pytest.approx(ref)
    assert out[2] == []
    assert out[3] == []  # null array → ELSE branch, series-family norm

    # multi-tap feed-forward + feedback
    out2 = (
        engine.query(
            "T | where id == 1 | project f = series_iir(x,"
            " pack_array(0.5, 0.5), pack_array(2.0, -1.0, 0.25))"
        )
        .head()
        .f
    )
    ref2 = _iir_ref([1.0, 2.0, 3.0, 4.0], [0.5, 0.5], [2.0, -1.0, 0.25])
    assert out2 == pytest.approx(ref2)


def test_series_iir_moving_sum_equiv(engine):
    # pure-FIR coefficients (a = [1]) reduce to a convolution
    out = (
        engine.query(
            "T | where id == 1 | project f = series_iir(x,"
            " pack_array(1.0, 1.0), pack_array(1.0))"
        )
        .head()
        .f
    )
    assert out == [1.0, 3.0, 5.0, 7.0]


def test_dcount_intersect(engine):
    # u ∈ 0..6, v ∈ 0..4 → |u ∩ v| = 5 (HLL sparse mode is exact here)
    n = (
        engine.query(
            "U | summarize a = hll(u), b = hll(v)"
            " | project n = dcount_intersect(a, b)"
        )
        .head()
        .n
    )
    assert n == 5
    n3 = (
        engine.query(
            "U | summarize a = hll(u), b = hll(v), c = hll(id)"
            " | project n = dcount_intersect(a, b, c)"
        )
        .head()
        .n
    )
    assert n3 == 5  # id covers 0..49 ⊇ both
    with pytest.raises(QueryError):
        engine.query("U | summarize a = hll(u)"
                     " | project n = dcount_intersect(a)")


def test_parse_csv(engine):
    out = {
        r.id: r.f
        for r in engine.query("T | project id, f = parse_csv(csv)").collect()
    }
    assert out[1] == ["a", "b", "c,d", "e"]
    # quoted quotes unescape; only the FIRST line is parsed
    assert out[2] == ["x", 'he said "hi"', "z"]
    assert out[3] == [""]


_EQUIV = [
    "T | project id, f = series_fill_backward(a)",
    "T | project id, f = series_iir(x, pack_array(0.5, 0.5),"
    " pack_array(2.0, -1.0, 0.25))",
    "T | project id, f = parse_csv(csv)",
    "U | summarize a = hll(u), b = hll(v)"
    " | project n = dcount_intersect(a, b)",
    "U | summarize a = hll(u), b = hll(v), c = hll(id)"
    " | project n = dcount_intersect(a, b, c)",
]


@pytest.mark.parametrize("q", _EQUIV)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    df_rows = _rows(engine.query(q))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == df_rows, sql
