"""Deterministic sampling and splitting for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning and non-reproducible
across runs/engines; these operators decide membership from a hash of a
stable key instead — the same row lands in the same sample/split on any
cluster size, any engine, any day.  That determinism is what makes
train/test contamination checks and incremental re-runs possible at
100 TB, and it makes every operator here exactly verifiable by a SQL
oracle.

All membership tests are single narrow projections (md5 → bucket →
compare): no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bucket space for rate comparisons; ~4.3e9 buckets ⇒ rate granularity 2e-10
_SPACE = float(1 << 32)


def _bucket(col: Column, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, 2^32) from a key column.
    Matches ``('0x'||substr(md5(salt||CAST(x AS VARCHAR)),1,8))::BIGINT``
    in an ANSI-SQL oracle."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash.

    Reproducible: the same keys are kept on every run; a row's fate
    never depends on partitioning.  ``salt`` decorrelates independent
    samples over the same keys.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_bucket(F.col(key), salt) < int(rate * _SPACE))


def train_test_split(
    df: DataFrame,
    key: str,
    test_rate: float = 0.1,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Append a deterministic 'train'/'test' column keyed on ``key``.

    All rows with the same key land in the same split — the property
    that prevents near-duplicate leakage across splits when ``key`` is
    a content fingerprint (pair with ``doc_fingerprint`` /
    ``minhash_dup_pairs`` cluster ids).
    """
    is_test = _bucket(F.col(key), salt) < int(test_rate * _SPACE)
    return df.withColumn(
        split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%,
    keep all 'pt') — the language/source rebalancing step of corpus
    construction, as one narrow filter."""
    bucket = _bucket(F.col(key), salt)
    threshold = F.lit(int(default_rate * _SPACE))
    for value, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _SPACE))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def pack_sequences(
    df: DataFrame,
    length_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    shards: int = 0,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    concatenation order — the "concat then cut every ``budget`` tokens"
    packing used to build pretraining batches.

    Documents are laid out in deterministic id order; each gets its
    running token offset and the sequence index its FIRST token falls in
    (a doc may straddle a boundary — the loader splits it, standard for
    causal-LM packing).  Output: id, offset (within shard), seq (global
    sequence index), plus the shard.

    Scale: a single global running sum would be one task.  ``shards > 0``
    hash-partitions documents first (md5 of the id — deterministic,
    engine-reproducible) and packs per shard in parallel — exactly how
    production pipelines shard packing — with sequence indices made
    globally unique via (shard, within-shard seq).
    """
    from pyspark.sql import Window

    shard = (
        (_bucket(F.col(id_col)) % shards).cast("int")
        if shards > 0
        else F.lit(0).cast("int")
    )
    base = df.select(
        F.col(id_col), F.col(length_col).alias("n"), shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n").over(w)
    return base.select(
        F.col(id_col),
        F.col("shard"),
        (cum - F.col("n")).alias("offset"),
        F.floor((cum - F.col("n")) / budget).cast("long").alias("seq"),
    )


def mix_corpora(
    df: DataFrame,
    key: str,
    domain_col: str,
    token_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    salt: str = "mix",
) -> DataFrame:
    """Domain-weighted token-budget mixing — the "data mixture" step of
    training-corpus construction (e.g. 60% web / 30% code / 10% papers
    into a 1T-token budget).

    Each domain ``d`` gets a token target ``budget · w_d / Σw``; its
    rows are kept by deterministic key-hash at rate
    ``min(1, target_d / total_d)``, so expected kept-tokens ≈ target
    and the SAME documents are chosen on every run / any partitioning.
    Domains absent from ``weights`` are dropped.

    Scale shape: one partial-aggregated groupBy for the per-domain
    token totals (|domains| rows, broadcast back) + one narrow filter —
    no per-domain sort, no windows, no skew sensitivity.  Exact-budget
    cutting (cumulative-sum windows per domain) deliberately NOT used:
    it serializes each domain into one task at 100 TB; rate-based
    selection parallelizes perfectly and lands within sampling noise of
    the target."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if not weights:
        raise ValueError("weights must not be empty")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    totals = df.groupBy(F.col(domain_col).alias("__mx_dom")).agg(
        F.sum(F.col(token_col)).cast("double").alias("__mx_total")
    )
    target = F.lit(None).cast("double")
    for dom, w in weights.items():
        target = F.when(
            F.col("__mx_dom") == dom,
            F.lit(float(budget_tokens) * float(w) / wsum),
        ).otherwise(target)
    # guard the NULL target explicitly — F.least() IGNORES nulls, so
    # least(1.0, null) would silently keep unweighted domains at 100%
    rates = totals.select(
        "__mx_dom",
        F.when(
            target.isNotNull(),
            F.least(F.lit(1.0), target / F.col("__mx_total")),
        ).alias("__mx_rate"),
    ).filter(F.col("__mx_rate").isNotNull())
    # rates derives FROM df (self-join lineage): alias both sides so
    # the equi-condition binds left-vs-right, not attribute-vs-itself
    la, ra = "__mx_l", "__mx_r"
    joined = df.alias(la).join(
        F.broadcast(rates.alias(ra)),
        F.col(f"{la}.`{domain_col}`") == F.col(f"{ra}.__mx_dom"),
        "inner",
    )
    keep = _bucket(F.col(key), salt) < F.floor(
        F.col("__mx_rate") * _SPACE
    ).cast("long")
    return joined.filter(keep).drop("__mx_dom", "__mx_rate")


def temperature_mix(
    df: DataFrame,
    key: str,
    domain_col: str,
    token_col: str,
    budget_tokens: int,
    alpha: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-sampled corpus mixing: like :func:`mix_corpora`, but
    the domain weights are DERIVED from corpus sizes —
    ``w_d = total_d ** alpha`` — the standard multilingual recipe
    (alpha=1/T; mBERT/XLM-R exponent-smoothed sampling).  ``alpha=1``
    is proportional sampling, ``alpha=0`` a uniform split; values in
    between lift tail domains without UniMax's hard epoch cap.

    Each domain's token target is ``budget · w_d / Σ w``; rows are kept
    by the same deterministic key-hash device as the other samplers, so
    the chosen documents are stable across runs and partitionings.

    Scale shape: one partial-aggregated groupBy for per-domain totals
    (|domains| rows), ONE broadcast 1-row aggregate for ``Σ w`` (no
    driver collect), a broadcast rate join + narrow filter — identical
    to :func:`mix_corpora`, no windows, no skew sensitivity.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    totals = df.groupBy(F.col(domain_col).alias("__tm_dom")).agg(
        F.sum(F.col(token_col)).cast("double").alias("__tm_total")
    )
    w = F.pow(F.col("__tm_total"), F.lit(float(alpha)))
    wsum = totals.agg(F.sum(w).alias("__tm_wsum"))
    rates = totals.crossJoin(F.broadcast(wsum)).select(
        "__tm_dom",
        F.least(
            F.lit(1.0),
            F.lit(float(budget_tokens))
            * w
            / F.col("__tm_wsum")
            / F.col("__tm_total"),
        ).alias("__tm_rate"),
    )
    la, ra = "__tm_l", "__tm_r"
    joined = df.alias(la).join(
        F.broadcast(rates.alias(ra)),
        F.col(f"{la}.`{domain_col}`") == F.col(f"{ra}.__tm_dom"),
        "inner",
    )
    keep = _bucket(F.col(key), salt) < F.floor(
        F.col("__tm_rate") * _SPACE
    ).cast("long")
    return joined.filter(keep).drop("__tm_dom", "__tm_rate")


def _gram_array(toks_col: str, n: int):
    """All n-grams (with multiplicity) of a pre-projected token-array
    column — the :func:`~pql_spark.operators.text.word_grams` shape
    over a materialized array, so the tokenization is NOT re-inlined
    into the lambda."""
    toks = F.col(toks_col)
    m = F.size(toks)
    return F.when(
        m <= F.lit(n), F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), m - F.lit(n) + F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def hashed_gram_counts(
    df: DataFrame,
    text_col: str = "text",
    gram_n: int = 2,
    buckets: int = 10007,
) -> DataFrame:
    """Per-bucket hashed n-gram counts of a corpus → ``(bucket, cnt)``
    (≤ ``buckets`` rows).  The md5 bucket hash is engine-reproducible
    (same scheme as :func:`hash_sample`'s oracle twin).

    The token array is projected behind a :func:`rebalance` barrier
    before the gram HOF — CollapseProject would otherwise inline the
    regex tokenization into the lambda and re-run it per reference
    (the shingle_rows hazard; measured ~3× on this pass)."""
    from ._util import rebalance
    from .text import tokens

    tk = rebalance(
        df.select(tokens(F.col(text_col)).alias("__toks"))
    )
    g = tk.select(F.explode(_gram_array("__toks", gram_n)).alias("__ig"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("__ig")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(buckets),
    )
    return g.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def importance_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 2,
    buckets: int = 10007,
    smoothing: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169): score each source document by how much its
    hashed n-gram distribution looks like the TARGET corpus —
    ``log_weight = Σ_grams log(p_target(bucket) / p_source(bucket))``
    with add-``smoothing`` Laplace estimates.  Select data for a
    domain by keeping the top-weighted documents (compose with
    ``top``/:func:`hash_sample`).

    Scale shape: two bounded aggregates (≤ ``buckets`` rows each,
    broadcast back), one gram explode over the source (O(tokens)),
    one broadcast join, one groupBy(id) — the bucket relation never
    exceeds ``buckets`` rows, so the only data-sized costs are narrow.
    Returns ``(id_col, log_weight)``."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    if smoothing <= 0:
        raise ValueError("smoothing must be positive")
    src_counts = hashed_gram_counts(df, text_col, gram_n, buckets)
    tgt_counts = hashed_gram_counts(target, text_col, gram_n, buckets)
    merged = (
        src_counts.withColumnRenamed("cnt", "sc")
        .join(
            tgt_counts.withColumnRenamed("cnt", "tc"),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            F.coalesce(F.col("sc"), F.lit(0)).alias("sc"),
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
        )
    )
    # totals via an unpartitioned window over the ≤buckets-row relation
    from pyspark.sql import Window

    w = Window.partitionBy()
    s, b = F.lit(float(smoothing)), F.lit(float(buckets))
    ratios = merged.select(
        "bucket",
        (
            F.log((F.col("tc") + s) / (F.sum("tc").over(w) + s * b))
            - F.log((F.col("sc") + s) / (F.sum("sc").over(w) + s * b))
        ).alias("__ir"),
    )
    from ._util import rebalance
    from .text import tokens

    docgrams = rebalance(
        df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("__toks")
        )
    ).select(
        F.col(id_col),
        F.explode(_gram_array("__toks", gram_n)).alias("__ig"),
    ).select(
        id_col,
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("__ig")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(buckets),
        ).alias("bucket"),
    )
    return (
        docgrams.join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum("__ir").alias("log_weight"))
    )


def deterministic_shuffle(
    df: DataFrame, key: str, seed: str = "0"
) -> DataFrame:
    """Total order by keyed hash — a reproducible global shuffle for
    training-order randomization.  One range-partitioned sort; change
    ``seed`` for a fresh permutation."""
    return df.orderBy(_bucket(F.col(key), seed).asc(), F.col(key).asc())


def unimax_plan(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    budget_tokens: float,
    max_epochs: float = 4.0,
) -> DataFrame:
    """UniMax language/domain budget allocation (Chung et al.,
    arXiv:2304.09151): distribute a token budget as UNIFORMLY as
    possible across domains, capping each domain at ``max_epochs``
    passes over its data — the anti-skew alternative to proportional
    or temperature sampling for multilingual corpora (head languages
    stop swallowing the budget; tail languages are never repeated more
    than ``max_epochs`` times).

    Closed-form water-filling, no driver loop: sort domains by their
    cap ``c_l = max_epochs · total_l`` ascending; domain ``i`` (and all
    before it) saturates iff ``prefix_i + c_i · (L − i) ≤ B``; with
    ``k`` the last saturated index the water level is
    ``s = (B − prefix_k) / (L − k)`` and every allocation is
    ``min(c_l, s)``.  All window functions over the DOMAIN-count-sized
    aggregate (≤ thousands of rows — the single-partition window is on
    that tiny relation, never on the corpus), so the plan is exactly
    reproducible in an ANSI-SQL oracle.

    Returns one row per domain: ``(domain, total_tokens, allocation,
    epochs)`` with ``epochs = allocation / total`` (> 1 ⇒ the trainer
    repeats the domain; a one-pass filter clamps at 1 via
    ``unimax_sample``).  Floats rounded to 4 decimals.
    """
    from pyspark.sql import Window

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    tot = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(token_col)).cast("double").alias("total_tokens")
    )
    cap = (F.col("total_tokens") * F.lit(float(max_epochs))).alias("__cap")
    w = Window.orderBy(F.col("__cap").asc(), F.col("domain").asc())
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = tot.select("domain", "total_tokens", cap).select(
        "*",
        F.row_number().over(w).alias("__i"),
        F.sum("__cap").over(w).alias("__pre"),
        F.count(F.lit(1)).over(wall).alias("__L"),
    )
    B = F.lit(float(budget_tokens))
    sat = F.col("__pre") + F.col("__cap") * (
        F.col("__L") - F.col("__i")
    ) <= B
    planned = ranked.select(
        "*",
        F.max(F.when(sat, F.col("__i")).otherwise(F.lit(0)))
        .over(wall)
        .alias("__k"),
    ).select(
        "*",
        F.max(
            F.when(F.col("__i") == F.col("__k"), F.col("__pre"))
        ).over(wall).alias("__prek"),
    )
    level = F.when(
        F.col("__L") > F.col("__k"),
        (B - F.coalesce(F.col("__prek"), F.lit(0.0)))
        / (F.col("__L") - F.col("__k")),
    )  # NULL ⇒ every domain saturated (budget exceeds all caps)
    alloc = F.round(
        F.least(F.col("__cap"), F.coalesce(level, F.col("__cap"))), 4
    )
    return planned.select(
        "domain",
        "total_tokens",
        alloc.alias("allocation"),
        F.round(alloc / F.col("total_tokens"), 4).alias("epochs"),
    )


def unimax_sample(
    df: DataFrame,
    key: str,
    domain_col: str,
    token_col: str,
    budget_tokens: float,
    max_epochs: float = 4.0,
    salt: str = "unimax",
) -> DataFrame:
    """One-pass UniMax selection: keep each domain's rows at rate
    ``min(1, allocation / total)`` from :func:`unimax_plan`, chosen by
    deterministic key hash (same shape as :func:`mix_corpora` — one
    tiny broadcast join + a narrow filter; epochs > 1 can't duplicate
    rows in a filter, so over-allocated domains keep everything and
    the trainer applies the repeat factor from the plan)."""
    plan = unimax_plan(
        df, domain_col, token_col, budget_tokens, max_epochs
    ).select(
        F.col("domain").alias("__ux_dom"),
        F.least(
            F.lit(1.0), F.col("allocation") / F.col("total_tokens")
        ).alias("__ux_rate"),
    )
    la, ra = "__ux_l", "__ux_r"
    joined = df.alias(la).join(
        F.broadcast(plan.alias(ra)),
        F.col(f"{la}.`{domain_col}`") == F.col(f"{ra}.__ux_dom"),
        "inner",
    )
    keep = _bucket(F.col(key), salt) < F.floor(
        F.col("__ux_rate") * _SPACE
    ).cast("long")
    return joined.filter(keep).drop("__ux_dom", "__ux_rate")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key: str = "doc_id",
    by: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``k`` rows where a row's
    inclusion probability is proportional to ``weight_col`` — the
    Efraimidis–Spirakis (2006) one-pass reservoir scheme, the standard
    way to subsample a training corpus by quality score or domain
    weight in a single scan.

    Each row gets the score ``u^(1/w)`` for a uniform ``u``; the top-k
    scores ARE a weight-proportional sample without replacement.  ``u``
    is the package's deterministic md5 bucket of ``key`` (+``salt``),
    so the sample is reproducible run-to-run and engine-to-engine, and
    a SQL oracle can replay it exactly.  We maximize the monotone
    transform ``ln(u)/w`` (ties broken by ``key``).

    ``by=None``: global top-k — compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge of k·partitions rows, no global
    sort).  ``by=<col>``: top-k PER GROUP via one window shuffle.

    Rows with NULL or non-positive weight are excluded (zero weight =
    never sampled; ES is undefined for w ≤ 0).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (_bucket(F.col(key), salt) + F.lit(1).cast("long")) / F.lit(
        _SPACE
    )
    w = F.col(weight_col).cast("double")
    es = (F.ln(u) / w).alias("__es_key")
    pruned = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "__es_key", es
    )
    if by is None:
        return (
            pruned.orderBy(F.col("__es_key").desc(), F.col(key))
            .limit(k)
            .drop("__es_key")
        )
    from pyspark.sql import Window

    win = Window.partitionBy(by).orderBy(
        F.col("__es_key").desc(), F.col(key)
    )
    return (
        pruned.withColumn("__es_rn", F.row_number().over(win))
        .filter(F.col("__es_rn") <= k)
        .drop("__es_key", "__es_rn")
    )
