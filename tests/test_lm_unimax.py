"""unigram_lm_fit/score (CCNet-style quality model) and
unimax_plan/sample (UniMax budget allocation) — python-reference
comparisons plus determinism/edge cases."""

from __future__ import annotations

import math

import pytest

from pql_spark.operators.sampling import unimax_plan, unimax_sample
from pql_spark.operators.text import unigram_lm_fit, unigram_lm_score


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "zyx qwv"),  # all-OOV under a tiny vocab
            (4, "the the the"),
        ],
        "doc_id long, text string",
    )


def test_unigram_lm_fit_deterministic_topv(spark, docs):
    m = unigram_lm_fit(docs, vocab_size=3).collect()
    # counts: the=6, sat=2, rest 1 — ties broken alphabetically
    assert [(r["__lm_w"], r["__lm_cnt"]) for r in m] == [
        ("the", 6), ("sat", 2), ("cat", 1)
    ]
    assert all(r["__lm_total"] == 14.0 for r in m)


def test_unigram_lm_score_reference(spark, docs):
    vocab = {"the": 6, "sat": 2, "cat": 1}
    total, V = 14.0, 3  # total counts ALL corpus words, not just vocab

    def ref(words):
        lps = [
            math.log((vocab.get(w, 0) + 1) / (total + V)) for w in words
        ]
        return round(sum(math.log(vocab.get(w, 0) + 1) for w in words)
                     / len(lps) - math.log(total + V), 4)

    out = {
        r.doc_id: r
        for r in unigram_lm_score(docs, vocab_size=3).collect()
    }
    assert out[1].n_tokens == 6
    assert out[1].avg_logprob == ref("the cat sat on the mat".split())
    assert out[1].oov_frac == round(2 / 6, 4)
    # all-OOV doc still scores (smoothing floor), oov_frac = 1
    assert out[3].oov_frac == 1.0
    assert out[3].avg_logprob == ref(["zyx", "qwv"])
    assert out[4].oov_frac == 0.0


def test_unigram_lm_score_external_model(spark, docs):
    # score corpus A against a model fit on corpus B
    target = spark.createDataFrame(
        [(1, "cat cat cat")], "doc_id long, text string"
    )
    m = unigram_lm_fit(target, vocab_size=2)
    out = unigram_lm_score(docs, model=m, vocab_size=2).collect()
    by_id = {r.doc_id: r.avg_logprob for r in out}
    # doc 1 contains 'cat' → scores above the all-OOV doc 3
    assert by_id[1] > by_id[3]


def _ref_waterfill(totals, budget, max_epochs):
    caps = sorted((max_epochs * t, d) for d, t in totals.items())
    L = len(caps)
    pre, k, prek = 0.0, 0, 0.0
    for i, (c, _) in enumerate(caps, start=1):
        pre += c
        if pre + c * (L - i) <= budget + 1e-9:
            k, prek = i, pre
    s = (budget - prek) / (L - k) if L > k else float("inf")
    return {
        d: round(min(max_epochs * totals[d], s), 4) for d in totals
    }


@pytest.mark.parametrize(
    "budget,epochs",
    [(100.0, 2.0), (1000.0, 2.0), (5000.0, 2.0), (3.0, 0.5)],
)
def test_unimax_plan_matches_reference(spark, budget, epochs):
    totals = {"en": 1000.0, "fr": 100.0, "sw": 10.0, "yo": 2.0}
    rows = [
        (d, i, t / 5.0) for d, t in totals.items() for i in range(5)
    ]
    df = spark.createDataFrame(rows, "lang string, i long, toks double")
    plan = {
        r.domain: (r.total_tokens, r.allocation, r.epochs)
        for r in unimax_plan(df, "lang", "toks", budget, epochs).collect()
    }
    ref = _ref_waterfill(totals, budget, epochs)
    assert set(plan) == set(totals)
    total_alloc = 0.0
    for d in totals:
        tot, alloc, ep = plan[d]
        assert tot == totals[d]
        assert alloc == pytest.approx(ref[d], abs=1e-3), (d, plan, ref)
        assert ep == pytest.approx(round(alloc / tot, 4), abs=1e-3)
        assert alloc <= epochs * tot + 1e-6  # cap respected
        total_alloc += alloc
    assert total_alloc <= budget + 1e-6 or all(
        plan[d][1] == pytest.approx(epochs * totals[d], abs=1e-3)
        for d in totals
    )


def test_unimax_uniform_when_budget_tight(spark):
    # tight budget, nobody saturates → equal split
    df = spark.createDataFrame(
        [("a", 1, 100.0), ("b", 1, 900.0)], "lang string, i long, toks double"
    )
    plan = {
        r.domain: r.allocation
        for r in unimax_plan(df, "lang", "toks", 50.0, 4.0).collect()
    }
    assert plan == {"a": 25.0, "b": 25.0}


def test_unimax_sample_rates_and_determinism(spark):
    rows = [(f"d{i}", "big" if i < 900 else "small", 10.0)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, lang string, toks double")
    out1 = unimax_sample(df, "key", "lang", "toks", 4000.0, 2.0)
    out2 = unimax_sample(df, "key", "lang", "toks", 4000.0, 2.0)
    r1 = sorted(r.key for r in out1.collect())
    assert r1 == sorted(r.key for r in out2.collect())
    # small domain (1000 toks, cap 2000) saturates under uniform split
    # → keep-rate 1; big keeps ~2000/9000
    small = [k for k in r1 if int(k[1:]) >= 900]
    assert len(small) == 100
    big = len(r1) - len(small)
    assert 150 <= big <= 300  # ≈ 900 * (3000/9000) = 300 … hash noise


def test_unimax_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "lang string, toks double")
    with pytest.raises(ValueError):
        unimax_plan(df, "lang", "toks", 0.0)
    with pytest.raises(ValueError):
        unimax_plan(df, "lang", "toks", 10.0, max_epochs=0.0)
