"""Deterministic sampling operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pql_spark.operators import (
    deterministic_shuffle,
    hash_sample,
    mix_corpora,
    stratified_hash_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def pop(spark):
    return spark.range(10000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_hash_sample_rate_and_determinism(pop):
    a = hash_sample(pop, "id", 0.3)
    b = hash_sample(pop, "id", 0.3)
    na = a.count()
    assert abs(na / 10000 - 0.3) < 0.03  # ~binomial 3σ
    assert na == b.count()
    assert a.exceptAll(b).count() == 0  # same rows, not just same count


def test_hash_sample_nested_rates(pop):
    """A 10% sample is a subset of the 30% sample (same salt) —
    the property that makes sample-size sweeps consistent."""
    small = {r.id for r in hash_sample(pop, "id", 0.1).collect()}
    large = {r.id for r in hash_sample(pop, "id", 0.3).collect()}
    assert small <= large


def test_salt_decorrelates(pop):
    a = {r.id for r in hash_sample(pop, "id", 0.2, salt="x").collect()}
    b = {r.id for r in hash_sample(pop, "id", 0.2, salt="y").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.1 < overlap < 0.3  # independent ⇒ ~rate overlap


def test_train_test_split_partition(pop):
    out = train_test_split(pop, "id", test_rate=0.25)
    counts = dict(
        out.groupBy("split").count().rdd.map(tuple).collect()
    )
    assert set(counts) == {"train", "test"}
    assert abs(counts["test"] / 10000 - 0.25) < 0.03
    # stable across invocations
    again = train_test_split(pop, "id", test_rate=0.25)
    assert out.exceptAll(again).count() == 0


def test_stratified_rates(pop):
    out = stratified_hash_sample(
        pop, key="id", strata_col="lang",
        rates={"en": 0.1}, default_rate=0.8,
    )
    got = dict(out.groupBy("lang").count().rdd.map(tuple).collect())
    n_en = 10000 // 3 + 1
    assert abs(got["en"] / n_en - 0.1) < 0.04
    assert abs(got["de"] / (10000 - n_en) - 0.8) < 0.04


def test_deterministic_shuffle_is_permutation(pop):
    a = [r.id for r in deterministic_shuffle(pop, "id").collect()]
    b = [r.id for r in deterministic_shuffle(pop, "id").collect()]
    c = [r.id for r in deterministic_shuffle(pop, "id", seed="7").collect()]
    assert a == b  # reproducible
    assert sorted(a) == list(range(10000))  # a permutation
    assert a != c and a != sorted(a)  # actually shuffled; seed changes it


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 domains × 2000 docs × 100 tokens each = 200k tokens/domain
    return spark.range(6000).select(
        F.col("id"),
        F.concat(F.lit("dom"), (F.col("id") % 3).cast("string")).alias(
            "dom"
        ),
        F.lit(100).alias("tokens"),
    )


def test_mix_corpora_hits_targets(corpus):
    # budget 100k: dom0 target 60k (rate .3), dom1 30k (.15), dom2 10k
    mixed = mix_corpora(
        corpus, "id", "dom", "tokens",
        weights={"dom0": 6, "dom1": 3, "dom2": 1},
        budget_tokens=100_000,
    )
    got = {
        r.dom: r.t
        for r in mixed.groupBy("dom")
        .agg(F.sum("tokens").alias("t"))
        .collect()
    }
    assert set(got) == {"dom0", "dom1", "dom2"}
    for dom, target in (("dom0", 60_000), ("dom1", 30_000),
                        ("dom2", 10_000)):
        # binomial noise: 3σ ≈ 3·sqrt(rate·n)·100 tokens
        assert abs(got[dom] - target) < 12_000, (dom, got[dom])


def test_mix_corpora_caps_rate_at_one(corpus):
    # dom0 target (480k) exceeds its 200k total → keep ALL of dom0
    mixed = mix_corpora(
        corpus, "id", "dom", "tokens",
        weights={"dom0": 24, "dom1": 1}, budget_tokens=500_000,
    )
    got = {
        r.dom: r.n
        for r in mixed.groupBy("dom").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got["dom0"] == 2000  # rate capped at 1.0
    assert "dom2" not in got  # unweighted domain dropped


def test_mix_corpora_deterministic(corpus):
    kw = dict(weights={"dom0": 1, "dom1": 1}, budget_tokens=50_000)
    a = mix_corpora(corpus, "id", "dom", "tokens", **kw)
    b = mix_corpora(corpus, "id", "dom", "tokens", **kw)
    assert a.exceptAll(b).count() == 0 and a.count() == b.count()


def test_mix_corpora_validation(corpus):
    with pytest.raises(ValueError, match="budget"):
        mix_corpora(corpus, "id", "dom", "tokens", {"dom0": 1}, 0)
    with pytest.raises(ValueError, match="weights"):
        mix_corpora(corpus, "id", "dom", "tokens", {}, 10)


@pytest.fixture(scope="module")
def dsir_corpora(spark):
    src = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "stock market prices fell sharply today"),
            (3, "cats and cat food and cat toys"),
            (4, "quarterly earnings report for the market"),
        ],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [
            (1, "cat cats cat food the cat"),
            (2, "a cat sat with another cat"),
        ],
        "doc_id long, text string",
    )
    return src, tgt


def test_importance_weights_rank_target_like_docs(dsir_corpora):
    from pql_spark.operators import importance_weights

    src, tgt = dsir_corpora
    lengths = {1: 7, 2: 6, 3: 7, 4: 6}
    w = {
        r.doc_id: r.log_weight / lengths[r.doc_id]
        for r in importance_weights(src, tgt, gram_n=1).collect()
    }
    # per-token weights: cat docs (1, 3) beat market docs (2, 4)
    assert w[1] > w[2] and w[3] > w[2] and w[3] > w[4]
    assert set(w) == {1, 2, 3, 4}  # every doc scored


def test_importance_weights_deterministic(dsir_corpora):
    from pql_spark.operators import importance_weights

    src, tgt = dsir_corpora
    a = {tuple(r) for r in importance_weights(src, tgt).collect()}
    b = {tuple(r) for r in importance_weights(src, tgt).collect()}
    assert a == b


def test_importance_weights_validation(dsir_corpora):
    from pql_spark.operators import importance_weights

    src, tgt = dsir_corpora
    with pytest.raises(ValueError, match="buckets"):
        importance_weights(src, tgt, buckets=1)
    with pytest.raises(ValueError, match="smoothing"):
        importance_weights(src, tgt, smoothing=0)


def test_connected_components_chain_and_stars(spark):
    import pql_spark.operators.dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    cc = {(r.id, r.component)
          for r in D.connected_components(pairs).collect()}
    assert cc == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_chain(spark):
    import pql_spark.operators.dedup as D

    # a 30-node path exercises multi-round propagation + early exit
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    cc = D.connected_components(pairs)
    comps = {r.component for r in cc.collect()}
    assert comps == {0} and cc.count() == 31


def test_connected_components_driver_vs_distributed(spark):
    """The r15 size-gated driver fast path must return EXACTLY the
    distributed loop's labels (same min-label + pointer-doubling
    algorithm, two execution strategies)."""
    import pql_spark.operators.dedup as D

    # chain + stars + descending-id edges + a self-contained triangle:
    # exercises multi-round propagation, min-through-doubling, and
    # edges listed in both (lo, hi) and (hi, lo) order
    raw = (
        [(i, i + 1) for i in range(25)]
        + [(100, 90), (90, 80), (80, 70)]
        + [(200, 201), (201, 202), (200, 202)]
        + [(7, 300)]
    )
    pairs = spark.createDataFrame(raw, "id_a long, id_b long")
    fast = {(r.id, r.component)
            for r in D.connected_components(pairs).collect()}
    dist = {(r.id, r.component)
            for r in D.connected_components(
                pairs, driver_pairs_max=0).collect()}
    assert fast == dist and len(fast) == 26 + 4 + 3 + 1
    # over-threshold inputs fall through to the distributed loop
    wide = {(r.id, r.component)
            for r in D.connected_components(
                pairs, driver_pairs_max=5).collect()}
    assert wide == fast


def test_connected_components_star_adversarial(spark):
    """r16 star-alternation distributed path: self-loop-only nodes,
    duplicate/reversed edges, a long chain (the small-star worst
    case), and a dense clique must all match the driver union-find
    exactly."""
    import pql_spark.operators.dedup as D

    raw = (
        [(500, 500)]                            # self-loop-only node
        + [(1, 2), (2, 1), (1, 2)]              # dup + reversed edges
        + [(i, i + 1) for i in range(100, 160)] # 61-node chain
        + [(a, b) for a in range(700, 710)      # 10-clique
           for b in range(a + 1, 710)]
        + [(600, 600), (600, 601)]              # self-loop + real edge
    )
    pairs = spark.createDataFrame(raw, "id_a long, id_b long")
    fast = {(r.id, r.component)
            for r in D.connected_components(pairs).collect()}
    dist = {(r.id, r.component)
            for r in D.connected_components(
                pairs, driver_pairs_max=0).collect()}
    assert fast == dist
    assert (500, 500) in fast and (600, 600) in fast
    assert {(c, comp) for c, comp in fast if 700 <= c < 710} == {
        (c, 700) for c in range(700, 710)
    }
    assert {comp for c, comp in fast if 100 <= c <= 160} == {100}


def test_dedup_by_pairs_transitive(spark):
    import pql_spark.operators.dedup as D

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 30]], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in D.dedup_by_pairs(docs, pairs, "doc_id")
        .collect()
    )
    # chain 1-2-3-4 collapses to its min id even though (1,4) was
    # never a pair; untouched rows survive
    assert kept == [1, 5, 30]


# ------------------------------------------------- weighted_sample (ES)


def _es_reference(ids_weights, k, salt=""):
    """Driver-side Efraimidis–Spirakis replay via hashlib md5."""
    import hashlib
    import math

    scored = []
    for i, w in ids_weights:
        if w is None or w <= 0:
            continue
        b = int(
            hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16
        )
        u = (b + 1) / float(1 << 32)
        scored.append((math.log(u) / w, i))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return sorted(i for _, i in scored[:k])


def test_weighted_sample_matches_reference(spark):
    from pql_spark.operators import weighted_sample

    rows = [(i, float(1 + (i * 37) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(df, 100, "w", key="doc_id").collect()
    )
    assert got == _es_reference(rows, 100)


def test_weighted_sample_skips_nonpositive(spark):
    from pql_spark.operators import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r["doc_id"] for r in weighted_sample(df, 10, "w").collect()}
    assert got == {1, 5}


def test_weighted_sample_weight_proportional(spark):
    # a 100x-weight row should appear in nearly every independent
    # sample; draw independence from the salt
    from pql_spark.operators import weighted_sample

    rows = [(i, 100.0 if i == 0 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    hits = sum(
        any(
            r["doc_id"] == 0
            for r in weighted_sample(
                df, 25, "w", salt=f"s{s}"
            ).collect()
        )
        for s in range(10)
    )
    assert hits >= 9


def test_weighted_sample_grouped(spark):
    from pql_spark.operators import weighted_sample

    rows = [
        (i, f"g{i % 3}", float(1 + i % 7)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    out = weighted_sample(df, 5, "w", key="doc_id", by="g").collect()
    per = {}
    for r in out:
        per.setdefault(r["g"], []).append(r["doc_id"])
    assert set(per) == {"g0", "g1", "g2"}
    for g, ids in per.items():
        want = _es_reference(
            [(i, w) for i, gg, w in rows if gg == g], 5
        )
        assert sorted(ids) == want


# ------------------------------------------------------------ temperature


def test_temperature_mix_alpha_one_is_proportional(corpus):
    """alpha=1 -> w_d = total_d, so every domain gets the SAME rate
    budget/sum(total): proportional down-sampling."""
    from pql_spark.operators import temperature_mix

    tot = {
        r.dom: r.t
        for r in corpus.groupBy("dom").agg(F.sum("tokens").alias("t"))
        .collect()
    }
    budget = int(sum(tot.values()) * 0.4)
    mixed = temperature_mix(corpus, "id", "dom", "tokens",
                            budget_tokens=budget, alpha=1.0)
    got = {
        r.dom: r.t
        for r in mixed.groupBy("dom").agg(F.sum("tokens").alias("t"))
        .collect()
    }
    for dom, t in tot.items():
        target = 0.4 * t
        assert abs(got[dom] - target) < 0.25 * t, (dom, got[dom], target)


def test_temperature_mix_lifts_tail(spark):
    """0 < alpha < 1 boosts tail domains vs proportional: the smallest
    domain's kept fraction must EXCEED the largest domain's (needs a
    SKEWED corpus — the shared fixture's domains are equal-sized)."""
    from pql_spark.operators import temperature_mix

    rows = (
        [(i, "head", 100) for i in range(3000)]
        + [(100_000 + i, "tail", 100) for i in range(300)]
    )
    df = spark.createDataFrame(rows, "id long, dom string, tokens int")
    budget = int(330_000 * 0.3)
    mixed = temperature_mix(df, "id", "dom", "tokens",
                            budget_tokens=budget, alpha=0.3)
    got = {
        r.dom: r.t
        for r in mixed.groupBy("dom").agg(F.sum("tokens").alias("t"))
        .collect()
    }
    frac_tail = got.get("tail", 0) / 30_000
    frac_head = got.get("head", 0) / 300_000
    assert frac_tail > frac_head


def test_temperature_mix_expected_rates(spark):
    """Hand-checkable: totals 80k/20k, alpha=0.5 -> weights sqrt:
    ~283/~141 (2:1 despite 4:1 sizes); budget 30k -> targets 20k/10k ->
    rates .25/.5."""
    from pql_spark.operators import temperature_mix

    rows = [(i, "big", 100) for i in range(800)] + [
        (10_000 + i, "small", 100) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, dom string, tokens int")
    mixed = temperature_mix(df, "id", "dom", "tokens",
                            budget_tokens=30_000, alpha=0.5)
    got = {
        r.dom: r.t
        for r in mixed.groupBy("dom").agg(F.sum("tokens").alias("t"))
        .collect()
    }
    # targets: w = (283, 141); shares (2/3, 1/3) -> 20k, 10k
    assert abs(got["big"] - 20_000) < 6_000
    assert abs(got["small"] - 10_000) < 4_000


def test_temperature_mix_deterministic(corpus):
    from pql_spark.operators import temperature_mix

    a = sorted(r.id for r in temperature_mix(
        corpus, "id", "dom", "tokens", budget_tokens=50_000, alpha=0.5
    ).select("id").collect())
    b = sorted(r.id for r in temperature_mix(
        corpus.repartition(7), "id", "dom", "tokens",
        budget_tokens=50_000, alpha=0.5,
    ).select("id").collect())
    assert a == b and a
