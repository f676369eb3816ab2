"""series_fft / series_ifft — numpy reference comparison, roundtrip,
and DataFrame↔SQL backend equivalence."""

from __future__ import annotations

import numpy as np
import pytest

from pql_spark import PqlEngine, QueryError, compile_to_sql


@pytest.fixture(scope="module")
def tables(spark):
    t = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0], [0.5, -0.5, 0.25, 0.0]),
            (2, [5.0], [1.0]),
            (3, [], []),
        ],
        "id long, r array<double>, i array<double>",
    )
    return {"T": t}


@pytest.fixture(scope="module")
def engine(spark, tables):
    return PqlEngine(spark, resolver=tables)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_fft_matches_numpy(engine):
    out = {
        r.id: r.f
        for r in engine.query("T | project id, f = series_fft(r)").collect()
    }
    ref = np.fft.fft([1.0, 2.0, 3.0, 4.0])
    assert out[1].real == pytest.approx(ref.real.tolist(), abs=1e-9)
    assert out[1].imag == pytest.approx(ref.imag.tolist(), abs=1e-9)
    assert out[2].real == [5.0] and out[2].imag == [0.0]
    assert out[3].real == [] and out[3].imag == []


def test_fft_complex_input_and_roundtrip(engine):
    out = (
        engine.query(
            "T | where id == 1"
            " | extend f = series_fft(r, i)"
            " | project b = series_ifft(f.real, f.imag)"
        )
        .head()
        .b
    )
    assert out.real == pytest.approx([1.0, 2.0, 3.0, 4.0], abs=1e-9)
    assert out.imag == pytest.approx([0.5, -0.5, 0.25, 0.0], abs=1e-9)
    ref = np.fft.fft(np.array([1, 2, 3, 4]) + 1j * np.array([0.5, -0.5, 0.25, 0]))
    f = (
        engine.query("T | where id == 1 | project f = series_fft(r, i)")
        .head()
        .f
    )
    assert f.real == pytest.approx(ref.real.tolist(), abs=1e-9)
    assert f.imag == pytest.approx(ref.imag.tolist(), abs=1e-9)


def test_fft_argc(engine):
    with pytest.raises(QueryError):
        engine.query("T | project f = series_fft()")


_EQUIV = [
    "T | project id, f = series_fft(r)",
    "T | project id, f = series_fft(r, i)",
    "T | project id, f = series_ifft(r, i)",
]


@pytest.mark.parametrize("q", _EQUIV)
def test_sql_backend_equivalence(spark, tables, engine, q):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    df_rows = _rows(engine.query(q))
    sql = compile_to_sql(q, lambda n: tables[n].columns)
    assert _rows(spark.sql(sql)) == df_rows, sql
