"""Synthesize scaled datasets from sf0.1 for the scaling study.

``python tools/gen_scale.py``        → 10x  into .scratch/sf1
``python tools/gen_scale.py sf10``   → 100x into .scratch/sf10
``python tools/gen_scale.py zipf``   → the Zipf PPJoin ON-case corpus

Each replica i offsets the id columns.  Document content is perturbed
with a DENSITY-PRESERVING scheme (r12): replicas are grouped in tens;
within a group, members differ only by a one-token suffix (" rv<m>",
shingle-Jaccard ~0.96 — near-dups, exactly the sf1/r11 corpus shape),
while across groups every 4th token gains a "_g<g>" tag, so no
5-shingle survives between groups (measured J = 0.0 at k=5).  At
k=3 (the op_ngram_jaccard setting, _NGRAM_K=3) shingles whose tokens
all fall between tagged positions DO survive across groups —
cross-group Jaccard is ~0.14, still far below every threshold in use
(0.6/0.7), so no cross-group pair clears a detector at either k
(ADVICE r12: the old claim of exact zero overlap only holds for
k=5).  Near-dup pair count therefore grows LINEARLY with scale (one
10-member family per source doc per group) instead of quadratically
in the replica count — at sf1 (one group) the output is bit-identical
to the r11 generator.
Embeddings are rolled by i positions (cosine between replicas of the
same vector is ~random); past 64 replicas the roll repeats, so replica
r additionally sign-flips odd positions when r DIV 64 is odd —
collision-free at 100 replicas, bit-identical to the old generator at
≤ 64 (sf10 embeddings joined the set in r15 for the op_embedding_dups
second-decade row).
Output: .scratch/<name>/{events,documents,...}.parquet directories
plus symlinks for the small dimension tables.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pql_spark.sources import build_session, parquet_catalog

SRC = "/root/testdata/sf0.1"
_SCRATCH = Path(__file__).resolve().parent.parent / ".scratch"


def gen_zipf() -> int:
    """Zipfian-boilerplate corpus for the PPJoin prefix-filter ON-case.

    The synthetic `documents` table has no gram-frequency skew, so
    prefix filtering prunes nothing there (measured r8: 26.8 s →
    177 s).  Real web text is the opposite: a few boilerplate phrases
    ("all rights reserved …") appear in a large fraction of documents
    and their grams dominate the inverted index.  This corpus models
    that: each doc = 20 unique content tokens (hash-derived) + one
    8-token boilerplate sentence drawn Zipf(s=1.1) from 50 templates
    (top template ≈ 24 % of docs), plus a real near-dup signal (every
    doc_id ≡ 1 (mod 40) clones the previous doc's content with one
    token changed, same template → Jaccard ≈ 0.7).  Output:
    .scratch/zipf/documents.parquet (doc_id, text).
    """
    import os

    N = int(os.environ.get("SPARK_GRAFT_ZIPF_N", "30000"))
    T, S = 50, 1.1
    spark = build_session("gen-zipf")
    spark.sparkContext.setLogLevel("ERROR")
    w = [1.0 / (i + 1) ** S for i in range(T)]
    tot = sum(w)
    cdf = []
    acc = 0.0
    for x in w:
        acc += x / tot
        cdf.append(acc)
    cdf_lit = F.array(*[F.lit(c) for c in cdf])
    docs = spark.range(N).select(F.col("id").alias("doc_id"))
    dup = (F.col("doc_id") % 40) == 1
    seed = F.when(dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    content = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda i: F.concat(
            F.lit("c"),
            F.substring(
                F.md5(F.concat_ws("_", seed.cast("string"),
                                  i.cast("string"))), 1, 10),
        ),
    )
    # the near-dup clone perturbs its LAST content token
    content = F.when(
        dup,
        F.concat(
            F.slice(content, 1, 19),
            F.array(F.concat(
                F.lit("x"),
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10),
            )),
        ),
    ).otherwise(content)
    # uniform u in [0,1) from the seed, inverse-CDF to a template id
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("z"), seed.cast("string"))),
                           1, 6), 16, 10).cast("double")
        / F.lit(float(16**6))
    )
    tmpl = F.size(F.filter(cdf_lit, lambda c: c < u))
    bp = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.concat_ws("", F.lit("b"), tmpl.cast("string"),
                              F.lit("t"), i.cast("string")),
    )
    out = docs.select(
        "doc_id",
        F.concat_ws(" ", F.concat(content, bp)).alias("text"),
    )
    sub = "zipf" if N == 30_000 else f"zipf{N}"
    dst = Path(__file__).resolve().parent.parent / ".scratch" / sub
    dst.mkdir(parents=True, exist_ok=True)
    out.repartition(32).write.mode("overwrite").parquet(
        str(dst / "documents.parquet"))
    got = spark.read.parquet(str(dst / "documents.parquet"))
    print("docs:", got.count())
    spark.stop()
    return 0


def _perturbed_text(replicas: int):
    """Replica text: group g = __r // 10 tags every 4th token with
    "_g<g>" (zero shared 5-shingles across groups), member m = __r %
    10 appends the r11 " rv<m>" suffix (J~0.96 within a group).  At
    replicas=10 (sf1) g is always 0 and the expression reduces to the
    r11 generator exactly."""
    g = (F.col("__r") / 10).cast("long")
    m = F.col("__r") % 10
    toks = F.split(F.col("text"), " ")
    tagged = F.transform(
        toks,
        lambda t, i: F.when(
            (g > 0) & (i % 4 == 0),
            F.concat(t, F.lit("_g"), g.cast("string")),
        ).otherwise(t),
    )
    return F.concat(
        F.array_join(tagged, " "), F.lit(" rv"), m.cast("string")
    ).alias("text")


def main(
    name: str = "sf1",
    replicas: int = 10,
    tables: set[str] | None = None,
) -> int:
    """``tables=None`` → the scale's default set: everything at both
    sf1 and sf10 (lineitem joined the sf10 set in r13 for the
    floor-dominated pql_q1_pricing row; embeddings joined in r15 for
    the op_embedding_dups second-decade row, enabled by the
    sign-flip extension to the roll scheme).  Pass an explicit set to
    (re)materialize just those tables into an existing directory."""
    if tables is None:
        tables = {"events", "documents", "embeddings", "lineitem"}
    dst = _SCRATCH / name
    spark = build_session("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    cat = parquet_catalog(spark, SRC)
    dst.mkdir(parents=True, exist_ok=True)

    def write(df, name):
        df.write.mode("overwrite").parquet(str(dst / f"{name}.parquet"))
        print(name, "rows:", spark.read.parquet(
            str(dst / f"{name}.parquet")).count())

    rep = spark.range(replicas).select(F.col("id").alias("__r"))

    if "events" in tables:
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

    if "documents" in tables:
        docs = cat("documents")
        n_docs = docs.agg(F.max("doc_id")).head()[0] + 1
        others = [c for c in docs.columns if c not in ("doc_id", "text")]
        write(
            docs.crossJoin(rep).select(
                (F.col("doc_id") + F.col("__r") * n_docs).alias("doc_id"),
                _perturbed_text(replicas),
                *others,
            ),
            "documents",
        )

    if "embeddings" in tables:
        emb = cat("embeddings")
        n_emb = emb.agg(F.max("vec_id")).head()[0] + 1
        dim = emb.select(F.size("embedding")).head()[0]
        # replica r: roll by r % dim, then sign-flip odd positions for
        # odd r // dim (r15: roll alone is only collision-free for
        # r < dim(=64) — at 100 replicas, r and r+64 of one source
        # vector would be IDENTICAL, planting 36·n_emb spurious exact
        # dups).  The flip leaves within-replica planted pairs intact
        # (both members flip the same positions, cosine unchanged) and
        # makes same-roll cross-group cosine ≈ (Σeven−Σodd)/|v|² ≈ 0.
        # For replicas ≤ 64 the group index is always 0 and this
        # reduces bit-exactly to the r3 roll-by-i generator.
        rolled = F.expr(
            f"transform(concat("
            f" slice(embedding, CAST(__r % {dim} AS INT) + 1,"
            f"       {dim} - CAST(__r % {dim} AS INT)),"
            f" slice(embedding, 1, CAST(__r % {dim} AS INT))),"
            f" (x, i) -> IF(__r DIV {dim} % 2 = 1 AND i % 2 = 1,"
            f"             -x, x))"
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

    if "lineitem" in tables:
        li = cat("lineitem")
        n_ok = li.agg(F.max("l_orderkey")).head()[0] + 1
        others = [c for c in li.columns if c != "l_orderkey"]
        write(
            li.crossJoin(rep).select(
                (F.col("l_orderkey") + F.col("__r") * n_ok)
                .alias("l_orderkey"),
                *others,
            ),
            "lineitem",
        )

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        link = dst / f"{t}.parquet"
        if not link.exists():
            link.symlink_to(Path(SRC) / f"{t}.parquet")
    spark.stop()
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "zipf":
        sys.exit(gen_zipf())
    if len(sys.argv) > 1 and sys.argv[1] == "sf10":
        # extra args name just the tables to (re)materialize, e.g.
        # ``gen_scale.py sf10 lineitem`` backfills one table
        only = set(sys.argv[2:]) or None
        sys.exit(main("sf10", 100, tables=only))
    sys.exit(main())
