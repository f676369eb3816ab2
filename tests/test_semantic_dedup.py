"""SemDeDup-style semantic dedup (coarse k-means cells + exact
within-cell cosine pairs).  Correctness contract: emitted pairs are a
SUBSET of exact brute-force pairs (precision 1 — within-cell cosines
are exact); recall is high when duplicates are semantically clustered,
and exactly 1 when n_clusters=1."""

from __future__ import annotations

import numpy as np
import pytest

from pql_spark.operators import (
    embedding_dup_pairs,
    semantic_dedup,
    semantic_dedup_pairs,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(3, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(60):
        v = base[i % 3] + rng.normal(
            scale=0.02 if i < 30 else 0.5, size=16
        )
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_precision_one_vs_brute_force(vectors):
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            vectors, threshold=0.99, n_clusters=6
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(vectors, threshold=0.99).collect()
    }
    assert got <= exact  # never a false pair
    assert len(got) >= 0.8 * len(exact)  # clustered dups are found


def test_single_cell_equals_brute_force(vectors):
    got = sorted(
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in semantic_dedup_pairs(
            vectors, threshold=0.99, n_clusters=1
        ).collect()
    )
    exact = sorted(
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in embedding_dup_pairs(vectors, threshold=0.99).collect()
    )
    assert got == exact


def test_dedup_keeps_min_id_and_unpaired(vectors):
    kept = {
        r.vec_id
        for r in semantic_dedup(
            vectors, threshold=0.99, n_clusters=6
        ).collect()
    }
    pairs = semantic_dedup_pairs(
        vectors, threshold=0.99, n_clusters=6
    ).collect()
    losers = set()
    # transitive min-label by simple union-find over the pair list
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.id_a), find(p.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, set] = {}
    for p in pairs:
        for x in (p.id_a, p.id_b):
            comps.setdefault(find(x), set()).add(x)
    for root, members in comps.items():
        losers |= members - {min(members)}
    assert kept == set(range(60)) - losers


def test_deterministic(vectors):
    a = {
        tuple(r)
        for r in semantic_dedup_pairs(
            vectors, threshold=0.99, n_clusters=6
        ).collect()
    }
    b = {
        tuple(r)
        for r in semantic_dedup_pairs(
            vectors, threshold=0.99, n_clusters=6
        ).collect()
    }
    assert a == b
