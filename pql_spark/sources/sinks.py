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


def compact_table(
    spark,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction — the lakehouse maintenance job that keeps
    a streamed-into / incrementally-appended table readable.  A table
    fed by micro-batches accumulates thousands of KB-sized files; at
    100 TB the scan's task-planning and file-open overhead then
    dominates the read.  Rewrites the table into
    ``ceil(total_bytes / target_file_bytes)`` files via a round-robin
    repartition (`rebalance` would leave AQE free to skew-split, but a
    deterministic file count makes the job idempotent), staging into a
    temp dir and atomically swapping so readers never see a partial
    table.  Returns the new file count.
    """
    import math
    import shutil
    from pathlib import Path

    p = Path(path)
    total = sum(
        f.stat().st_size for f in p.rglob("*") if f.is_file()
        and not f.name.startswith((".", "_"))
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.format(fmt).load(str(p))
    staged = p.with_name(p.name + ".__compact__")
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(
        str(staged)
    )
    old = p.with_name(p.name + ".__old__")
    shutil.rmtree(old, ignore_errors=True)
    p.rename(old)
    staged.rename(p)
    shutil.rmtree(old, ignore_errors=True)
    return n_files


def cluster_by(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int | None = None,
) -> DataFrame:
    """Range-cluster rows on ``cols`` before writing — the
    data-skipping layout step (the same goal as Delta's OPTIMIZE
    ZORDER, with linear range clustering instead of a space-filling
    curve: perfect skipping on the leading column, good on
    correlated ones).  Each output file then covers a narrow min/max
    band of ``cols``, so parquet row-group stats let a point/range
    predicate skip almost every file at plan time.

    ``repartitionByRange`` samples the keys to build balanced range
    bounds (one pass + shuffle), and the within-partition sort keeps
    row groups tight inside each file.  Write the result with
    :func:`write_partitioned`.
    """
    cs = [df[c] for c in cols]
    ranged = (
        df.repartitionByRange(num_files, *cs)
        if num_files
        else df.repartitionByRange(*cs)
    )
    return ranged.sortWithinPartitions(*cs)
