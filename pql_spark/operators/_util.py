"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame) -> DataFrame:
    """Spread a under-partitioned input across the cluster's cores.

    Small single-file tables arrive as ONE input split, which would
    serialize every narrow stage of a compute-heavy operator onto one
    core.  A round-robin repartition to the default parallelism costs
    one small shuffle and buys full-width execution — the same layout a
    real multi-split dataset gets for free.  No-op when the input is
    already parallel enough (the 100 TB case: thousands of splits).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
