"""``bm25_score``: Okapi BM25 relevance against a small query-term
bag.  Reference: brute-force python over the same normalized
tokenization."""

from __future__ import annotations

import math

import pytest

from pql_spark.operators import bm25_score

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat and the cat ran"),
    (3, "quantum computing with superconducting qubits"),
    (4, "Cats  and DOGS "),  # case + whitespace normalization
    (5, "cat cat cat cat cat"),
]
TERMS = ["cat", "dog", "qubits"]
K1, B = 1.2, 0.75


def _py_bm25():
    toks = {
        i: " ".join(t.lower().split()).split(" ") for i, t in DOCS
    }
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for term in TERMS:
            tf = sum(1 for x in tk if x == term)
            df = sum(
                1 for v in toks.values() if any(x == term for x in v)
            )
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += (
                idf
                * tf
                * (K1 + 1)
                / (tf + K1 * (1 - B + B * len(tk) / avgdl))
            )
        out[i] = s
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.bm25
        for r in bm25_score(df, TERMS, k1=K1, b=B).collect()
    }
    want = _py_bm25()
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    # doc 3 matches only 'qubits'; doc 5 is saturated-tf 'cat'
    assert got[3] > 0 and got[5] > got[1] > 0


def test_append_and_plan_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = bm25_score(df, ["cat"], append=True)
    assert out.columns == ["doc_id", "text", "bm25"]
    # zero corpus shuffles: the only exchanges belong to the 1-row
    # stats aggregate + its broadcast (no hashpartitioning of the
    # corpus by any key)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_errors(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_score(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_score(df, ["cat", "Cat"])
