"""``series_decompose_forecast(arr, period, points)``: additive
decomposition trained on the first n-points elements, OLS-extrapolated
trend + centered phase pattern over the horizon.  Reference
implementation for the tests: numpy with the identical arithmetic."""

from __future__ import annotations

import numpy as np
import pytest

from pql_spark import PqlEngine
from pql_spark.parser import QueryError

N, P, PTS = 28, 7, 7
VALS = [10 + 0.5 * i + [3, 1, -2, 0, 2, -1, -3][i % 7] for i in range(N)]


def _np_reference():
    m = N - PTS
    train = np.array(VALS[:m])
    lo, hi = (P - 1) // 2, P // 2
    tr = np.array(
        [train[max(0, i - lo):min(m, i + hi + 1)].mean() for i in range(m)]
    )
    det = train - tr
    ps = np.array([det[q::P].mean() for q in range(P)])
    raw = np.array([ps[i % P] for i in range(m)])
    rawmean = raw.mean()
    x = np.arange(1, m + 1)
    xbar = (m + 1) / 2.0
    slope = ((x - xbar) * tr).sum() / (m * (m * m - 1) / 12.0)
    inter = tr.mean() - slope * xbar
    return [
        tr[i - 1] + raw[i - 1] - rawmean
        if i <= m
        else inter + slope * i + ps[(i - 1) % P] - rawmean
        for i in range(1, N + 1)
    ]


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame([(1, VALS)], "id long, arr array<double>")
    return PqlEngine(spark, {"T": df})


def test_matches_numpy_reference(engine):
    out = engine.query(
        "T | extend f = series_decompose_forecast(arr, 7, 7) | project f"
    )
    assert np.allclose(out.collect()[0].f, _np_reference())


def test_short_series_is_null(engine):
    out = engine.query(
        "T | extend f = series_decompose_forecast(arr, 7, 25) | project f"
    )
    assert out.collect()[0].f is None


def test_errors(engine):
    with pytest.raises(QueryError, match="points must be"):
        engine.query(
            "T | extend f = series_decompose_forecast(arr, 7, 0)"
        )
    with pytest.raises(QueryError, match="integer literal"):
        engine.to_sql(
            "T | extend f = series_decompose_forecast(arr, 7, n)"
        )


def test_sql_backend_bit_identical(spark, engine):
    """The r10 SQL text twin reproduces the DataFrame backend's values
    EXACTLY (same let-binding shape and FP op order), incl. the
    short-series NULL."""
    spark.createDataFrame(
        [(1, VALS)], "id long, arr array<double>"
    ).createOrReplaceTempView("T")
    for text in (
        "T | extend f = series_decompose_forecast(arr, 7, 7)"
        " | project f",
        "T | extend f = series_decompose_forecast(arr, 7, 25)"
        " | project f",
        "T | extend f = series_decompose_forecast(arr, 4, 9)"
        " | project f",
    ):
        want = engine.query(text).collect()[0].f
        got = spark.sql(engine.to_sql(text)).collect()[0].f
        assert got == want, text
