"""Sink + physical-layout tests: bucketed co-located joins (no
exchange), partition pruning, and skew-salted join equivalence."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pql_spark.operators._util import salted_join
from pql_spark.sources import write_bucketed, write_partitioned


@pytest.fixture()
def tmp_table(spark, tmp_path):
    names = []

    def make(name):
        names.append(name)
        return name

    yield make
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, tmp_table):
    """Two tables bucketed identically on the join key must join with
    NO shuffle exchange on either side — the co-located join that makes
    fact-fact joins viable at 100 TB."""
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 10000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("b")
    )
    write_bucketed(left, tmp_table("bkt_left"), ["k"], num_buckets=8)
    write_bucketed(right, tmp_table("bkt_right"), ["k"], num_buckets=8)
    l_t, r_t = spark.table("bkt_left"), spark.table("bkt_right")
    joined = l_t.join(r_t, "k")
    # disable broadcast so the plan must choose a shuffle-or-bucketed join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    )
    path = str(tmp_path / "ptab")
    write_partitioned(df, path, partition_by=["part"])
    back = spark.read.parquet(path).filter(F.col("part") == 2)
    assert back.count() == 250
    # the scan must prune on the partition column at plan time
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "(part#" in plan.split(
        "PartitionFilters"
    )[1][:120]
    shutil.rmtree(path, ignore_errors=True)


def test_ivf_cells_as_partition_keys_prune(spark, tmp_path, sf_catalog):
    """The IVF scale path: persist the corpus partitioned by the trained
    cell id, and an nprobe query's cell filter becomes partition pruning
    at the scan — the nprobe/n_centroids scan-fraction claim made real
    in the physical plan."""
    from pql_spark.operators import ivf_assign, train_centroids
    from pql_spark.sources.sinks import write_partitioned

    emb = sf_catalog("embeddings")
    cents = train_centroids(emb, n_centroids=4, sample_size=128)
    assigned = ivf_assign(emb, cents)
    path = str(tmp_path / "ivf")
    write_partitioned(assigned, path, partition_by=["cell"])
    back = spark.read.parquet(path).filter(F.col("cell").isin([0, 2]))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell#" in plan.split(
        "PartitionFilters"
    )[1][:160]
    # pruned read returns exactly the rows assigned to the probed cells
    expect = assigned.filter(F.col("cell").isin([0, 2])).count()
    assert back.count() == expect > 0
    shutil.rmtree(path, ignore_errors=True)


def test_salted_join_matches_plain_join(spark):
    """Salting must be a pure physical rewrite: identical result rows,
    including duplicate multiplicity, on a heavily skewed key."""
    # 90% of left rows share key 0 — the pathological hot key
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    plain = left.join(right, "k").select("k", "payload", "rv")
    salted = salted_join(left, right, "k").select("k", "payload", "rv")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_join_matches(spark):
    left = spark.range(0, 500).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    right = spark.range(0, 2).select(
        F.col("id").alias("k"), F.lit("x").alias("rv")
    )
    plain = left.join(right, "k", "left").select("k", "payload", "rv")
    salted = salted_join(left, right, "k", how="left").select(
        "k", "payload", "rv"
    )
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_compact_table_reduces_files(spark, tmp_path):
    from pql_spark.sources import compact_table

    path = str(tmp_path / "frag")
    # fragment: 40 tiny files
    spark.range(0, 4000).withColumn(
        "v", F.col("id") * 2
    ).repartition(40).write.parquet(path)
    import pathlib

    n_before = len(list(pathlib.Path(path).glob("*.parquet")))
    assert n_before >= 30
    n = compact_table(spark, path, target_file_bytes=1 << 30)
    files = list(pathlib.Path(path).glob("*.parquet"))
    assert n == 1 and len(files) == 1
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert back.agg(F.sum("v")).head()[0] == 2 * sum(range(4000))
    # idempotent: rerun keeps content
    compact_table(spark, path, target_file_bytes=1 << 30)
    assert spark.read.parquet(path).count() == 4000


def test_cluster_by_tightens_file_stats(spark, tmp_path):
    from pql_spark.sources import cluster_by

    import pyarrow.parquet as pq
    import pathlib

    df = spark.range(0, 10000).withColumn(
        "k", (F.col("id") * 7919) % 10000  # scrambled key
    )
    path = str(tmp_path / "clustered")
    cluster_by(df, ["k"], num_files=8).write.parquet(path)
    spans = []
    for f in pathlib.Path(path).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) == 8
    # ranges are disjoint (perfect skipping on the cluster column)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # each file covers ~1/8 of the key space, not the whole range
    assert all(hi - lo < 3000 for lo, hi in spans)


def test_merge_upsert_sql_shape():
    from pql_spark.streaming import merge_upsert_sql

    sql = merge_upsert_sql("lake.events_cur", "batchv", ["user_id", "day"])
    assert sql.startswith("MERGE INTO lake.events_cur t USING `batchv` s ON ")
    assert "t.`user_id` = s.`user_id`" in sql
    assert "t.`day` = s.`day`" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_stream_upsert_to_table_requires_runtime(spark):
    """No Delta/Iceberg runtime in this container: the sink must be an
    HONEST capability boundary, not a silent parquet fallback."""
    import pytest as _pytest

    from pql_spark.streaming import stream_upsert_to_table

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with _pytest.raises(NotImplementedError, match="Delta or Iceberg"):
        stream_upsert_to_table(stream, "lake.t", keys=["value"])
