"""Deterministic sampling operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pql_spark.operators import (
    deterministic_shuffle,
    hash_sample,
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
