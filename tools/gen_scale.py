"""Synthesize a 10x ("sf1") dataset from sf0.1 for the scaling study.

Each replica i offsets the id columns and perturbs content so the
scaled data does not contain artificial exact/near duplicates:
documents get a per-replica suffix token, embeddings are rolled by i
positions (cosine between replicas of the same vector is ~random).
Output: .scratch/sf1/{events,documents,embeddings,lineitem}.parquet
directories plus symlinks for the small dimension tables.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pql_spark.sources import build_session, parquet_catalog

SRC = "/root/testdata/sf0.1"
DST = Path(__file__).resolve().parent.parent / ".scratch" / "sf1"
REPLICAS = 10


def main() -> int:
    spark = build_session("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    cat = parquet_catalog(spark, SRC)
    DST.mkdir(parents=True, exist_ok=True)

    def write(df, name):
        df.write.mode("overwrite").parquet(str(DST / f"{name}.parquet"))
        print(name, "rows:", spark.read.parquet(
            str(DST / f"{name}.parquet")).count())

    rep = spark.range(REPLICAS).select(F.col("id").alias("__r"))

    ev = cat("events")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).head()[0] + 1
    write(
        ev.crossJoin(rep).select(
            (F.col("event_id") + F.col("__r") * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__r") * n_users).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events",
    )

    docs = cat("documents")
    n_docs = docs.agg(F.max("doc_id")).head()[0] + 1
    others = [c for c in docs.columns if c not in ("doc_id", "text")]
    write(
        docs.crossJoin(rep).select(
            (F.col("doc_id") + F.col("__r") * n_docs).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rv"), F.col("__r").cast("string")
            ).alias("text"),
            *others,
        ),
        "documents",
    )

    emb = cat("embeddings")
    n_emb = emb.agg(F.max("vec_id")).head()[0] + 1
    dim = emb.select(F.size("embedding")).head()[0]
    rolled = F.expr(
        f"concat(slice(embedding, CAST(__r AS INT) + 1, {dim} -"
        f" CAST(__r AS INT)), slice(embedding, 1, CAST(__r AS INT)))"
    )
    others = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    write(
        emb.crossJoin(rep).select(
            (F.col("vec_id") + F.col("__r") * n_emb).alias("vec_id"),
            rolled.alias("embedding"),
            *others,
        ),
        "embeddings",
    )

    li = cat("lineitem")
    n_ok = li.agg(F.max("l_orderkey")).head()[0] + 1
    others = [c for c in li.columns if c != "l_orderkey"]
    write(
        li.crossJoin(rep).select(
            (F.col("l_orderkey") + F.col("__r") * n_ok).alias("l_orderkey"),
            *others,
        ),
        "lineitem",
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        link = DST / f"{t}.parquet"
        if not link.exists():
            link.symlink_to(Path(SRC) / f"{t}.parquet")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
