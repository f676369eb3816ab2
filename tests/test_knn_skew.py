"""Skew-resilient grouped kNN: pairwise_topk_skew must return exactly
pairwise_topk's results while spreading each (hot) group over `salt`
Arrow tasks instead of one."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pql_spark.operators import pairwise_topk, pairwise_topk_skew


def _vecs(spark, n, hot_frac=0.8, dim=8, seed=7):
    """Skewed corpus: `hot_frac` of the vectors share one label."""
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        label = "hot" if i < n * hot_frac else f"cold{i % 3}"
        rows.append((i, label, [rnd.uniform(-1, 1) for _ in range(dim)]))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


@pytest.fixture(scope="module")
def emb(spark):
    return _vecs(spark, 120).cache()


def _norm_rows(rows):
    return sorted(
        (r.id, r.neighbor, round(r.cosine, 9), r.rank) for r in rows
    )


def test_matches_plain_pairwise_topk(spark, emb):
    want = _norm_rows(
        pairwise_topk(emb, k=4, key_col="label").collect()
    )
    got = _norm_rows(
        pairwise_topk_skew(emb, k=4, key_col="label", salt=8).collect()
    )
    assert got == want
    assert got  # non-degenerate


def test_global_group_no_key(spark, emb):
    want = _norm_rows(pairwise_topk(emb, k=3).collect())
    got = _norm_rows(pairwise_topk_skew(emb, k=3, salt=4).collect())
    assert got == want


def test_salt_one_degenerates_to_plain(spark, emb):
    want = _norm_rows(
        pairwise_topk(emb, k=2, key_col="label").collect()
    )
    got = _norm_rows(
        pairwise_topk_skew(emb, k=2, key_col="label", salt=1).collect()
    )
    assert got == want


def test_plan_groups_by_salt(spark, emb):
    # the hot group must NOT be a single Arrow task: the grouping key
    # of the FlatMapGroupsInPandas stage includes the salt column
    df = pairwise_topk_skew(emb, k=3, key_col="label", salt=8)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "__salt" in plan


def test_self_excluded_and_ranked(spark, emb):
    out = pairwise_topk_skew(emb, k=3, key_col="label", salt=8)
    rows = out.collect()
    assert all(r.id != r.neighbor for r in rows)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append((r.rank, r.cosine))
    for rk in by_id.values():
        rk.sort()
        assert [x[0] for x in rk] == list(range(1, len(rk) + 1))
        cos = [x[1] for x in rk]
        assert all(
            a >= b - 1e-12 for a, b in zip(cos, cos[1:])
        )  # non-increasing
        assert all(not math.isnan(c) for c in cos)


def test_duplicate_ids_match_plain(spark):
    """With DUPLICATE ids in a group, the skew path must still equal
    pairwise_topk: positional self-exclusion keeps a duplicate as its
    twin's cosine-1.0 neighbor (r7 ADVICE / VERDICT item — previously
    value-based exclusion dropped all copies)."""
    base = _vecs(spark, 40)
    dup = base.filter(F.col("vec_id") < 6)  # 6 duplicate-id rows
    emb = base.unionByName(dup)
    want = _norm_rows(pairwise_topk(emb, k=4, key_col="label").collect())
    got = _norm_rows(
        pairwise_topk_skew(emb, k=4, key_col="label", salt=8).collect()
    )
    assert got == want
    # the duplicates really do appear as their own-id neighbors
    assert any(i == n for (i, n, c, r) in want if c > 1 - 1e-9)
