"""Scratch experiment (VERDICT r13 item 5): does packing the stacked
struct-min window's sort key / payload as BIGINT micros (instead of
timestamp-typed struct fields) shave the sequence_detect constant?

Variants at sf1 (10^6 events), best-of-3 each:
  A. current compiler plan (pql_sequence_detect gate, minus final sort)
  B. long-packed structs: struct fields are unix_micros longs,
     post-filters compare longs, final select converts back
  C. B + bare-long min for the last step (no 1-field struct)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from pql_spark.sources import build_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "sf1"


def variant_current(df):
    TS = "__sq_ts"
    base = df.select(
        F.col("user_id"),
        F.col("ts").alias(TS),
        (F.col("event_type") == "view").alias("__sq_p0"),
        (F.col("event_type") == "click").alias("__sq_p1"),
        (F.col("event_type") == "purchase").alias("__sq_p2"),
    )
    n = 3
    tsm = F.unix_micros(F.col(TS))
    wr = (
        Window.partitionBy("user_id")
        .orderBy(tsm.desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    any_p = (
        F.coalesce(F.col("__sq_p0"), F.lit(False))
        | F.coalesce(F.col("__sq_p1"), F.lit(False))
        | F.coalesce(F.col("__sq_p2"), F.lit(False))
    )
    evs = base.filter(any_p)
    for j in range(n - 1, 0, -1):
        fields = [F.col(TS).alias("t")]
        if j < n - 1:
            fields.append(F.col(f"__sq_g{j + 1}").alias("g"))
        evs = evs.withColumn(
            f"__sq_g{j}",
            F.min(F.when(F.col(f"__sq_p{j}"), F.struct(*fields))).over(wr),
        )
    cur = evs.filter(F.col("__sq_p0"))
    tcols = [F.col(TS).alias("__t0")]
    tail = F.col("__sq_g1")
    for i in range(1, n):
        tcols.append(tail.getField("t").alias(f"__t{i}"))
        if i < n - 1:
            tail = tail.getField("g")
    cur = cur.select("user_id", *tcols)
    step = 86400_000_000
    span = 2 * 86400_000_000
    for i in range(1, n):
        cur = cur.filter(
            F.col(f"__t{i}").isNotNull()
            & (
                F.unix_micros(F.col(f"__t{i}"))
                <= F.unix_micros(F.col(f"__t{i - 1}")) + step
            )
        )
    cur = cur.filter(
        F.unix_micros(F.col(f"__t{n - 1}"))
        <= F.unix_micros(F.col("__t0")) + span
    )
    return cur.select(
        "user_id",
        F.col("__t0").alias("v_ts"),
        F.col("__t1").alias("c_ts"),
        F.col("__t2").alias("p_ts"),
    )


def variant_packed(df, bare_last: bool):
    TSM = "__sq_tsm"
    base = df.select(
        F.col("user_id"),
        F.unix_micros(F.col("ts")).alias(TSM),
        (F.col("event_type") == "view").alias("__sq_p0"),
        (F.col("event_type") == "click").alias("__sq_p1"),
        (F.col("event_type") == "purchase").alias("__sq_p2"),
    )
    n = 3
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.col(TSM).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    any_p = (
        F.coalesce(F.col("__sq_p0"), F.lit(False))
        | F.coalesce(F.col("__sq_p1"), F.lit(False))
        | F.coalesce(F.col("__sq_p2"), F.lit(False))
    )
    evs = base.filter(any_p)
    for j in range(n - 1, 0, -1):
        if j == n - 1 and bare_last:
            payload = F.col(TSM)
        else:
            fields = [F.col(TSM).alias("t")]
            if j < n - 1:
                fields.append(F.col(f"__sq_g{j + 1}").alias("g"))
            payload = F.struct(*fields)
        evs = evs.withColumn(
            f"__sq_g{j}",
            F.min(F.when(F.col(f"__sq_p{j}"), payload)).over(wr),
        )
    cur = evs.filter(F.col("__sq_p0"))
    tcols = [F.col(TSM).alias("__t0")]
    tail = F.col("__sq_g1")
    for i in range(1, n):
        if i == n - 1 and bare_last and n > 1:
            tcols.append(
                (tail if i == 1 else tail).alias(f"__t{i}")
                if False
                else tail.alias(f"__t{i}")
            )
        else:
            tcols.append(tail.getField("t").alias(f"__t{i}"))
        if i < n - 1:
            tail = (
                tail.getField("g")
            )
    cur = cur.select("user_id", *tcols)
    step = 86400_000_000
    span = 2 * 86400_000_000
    for i in range(1, n):
        cur = cur.filter(
            F.col(f"__t{i}").isNotNull()
            & (F.col(f"__t{i}") <= F.col(f"__t{i - 1}") + step)
        )
    cur = cur.filter(F.col(f"__t{n - 1}") <= F.col("__t0") + span)
    return cur.select(
        "user_id",
        F.timestamp_micros(F.col("__t0")).alias("v_ts"),
        F.timestamp_micros(F.col("__t1")).alias("c_ts"),
        F.timestamp_micros(F.col("__t2")).alias("p_ts"),
    )


def main() -> None:
    spark = build_session("exp_seq")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores, 1, cores).mapInPandas(lambda it: it, "id long").count()
    df = spark.read.parquet(str(Path(__file__).resolve().parent.parent / ".scratch" / SF / "events.parquet"))
    df.count()

    variants = {
        "A_current": lambda: variant_current(df),
        "B_packed": lambda: variant_packed(df, bare_last=False),
        "C_packed_bare_last": lambda: variant_packed(df, bare_last=True),
    }
    results = {}
    for name, build in variants.items():
        rows = None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rows = build().collect()
            best = min(best, time.perf_counter() - t0)
        results[name] = (round(best, 3), len(rows), sorted(rows)[:1])
        print(name, results[name][0], "s rows=", results[name][1], flush=True)
    a = {tuple(r) for r in variant_current(df).collect()}
    b = {tuple(r) for r in variant_packed(df, False).collect()}
    c = {tuple(r) for r in variant_packed(df, True).collect()}
    print("values equal:", a == b == c)
    spark.stop()


if __name__ == "__main__":
    main()
