"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join resilient to extreme key skew.

    When one join-key value dominates (the classic SIEM/user-activity
    hot key), a plain hash join puts that key's entire partition on one
    task.  AQE's skew-join splitting handles moderate skew; for the
    pathological case this spreads the LEFT side over ``salt``
    sub-partitions (deterministic hash of the whole row) and replicates
    the matching RIGHT rows to every sub-partition, so the hot key runs
    on ``salt`` tasks instead of one.  Result is exactly the plain
    join's (verified by tests); cost is ``salt``× replication of the
    right side — use with a small-to-medium right side.
    """
    if how not in ("inner", "left", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt))
    )
    salt_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salt_l.join(salt_r, [on, "__salt"], how)
    return out.drop("__salt")
