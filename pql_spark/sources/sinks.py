"""Sinks: partitioned and bucketed table writers.

The reference has no sink surface (results are SQL text); these are the
write paths a Spark deployment needs to make the READ side fast at
100 TB:

- partition-by columns → partition pruning (a `where` on the partition
  key skips whole directories at plan time);
- bucket-by join keys → co-located joins: two tables bucketed the same
  way join with NO shuffle exchange on either side (verified by
  ``tests/test_sinks.py`` asserting the exchange-free plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a partition-pruning-friendly table to ``path``.

    Partition columns become directory levels; Catalyst prunes them on
    read when a filter fixes the partition key.
    """
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed catalog table.

    Rows are hash-bucketed on ``bucket_by``; a join between two tables
    bucketed identically on the join key reads both sides pre-shuffled —
    Catalyst drops the Exchange on each side, which at 100 TB removes
    the single most expensive stage of a fact-fact join.  ``sort_by``
    additionally pre-sorts within buckets (sort-merge join without the
    sort).
    """
    writer = (
        df.write.mode(mode)
        .format(fmt)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
