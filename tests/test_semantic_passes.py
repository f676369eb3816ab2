"""semantic_dedup_pairs(passes=N) — the cross-cell recall knob.

SemDeDup misses duplicate pairs that straddle a k-means cell boundary
BY DESIGN.  The construction here makes that miss observable and
deterministic: 60 points uniformly spaced on the unit circle (no
natural blobs, so the 5-cell spherical-k-means optimum is
rotation-degenerate — any rotation of the partition is an optimum,
and a rotated init converges to a different one), where every
adjacent pair is a planted duplicate (cos(2*pi/60) = 0.9945 >= 0.99
threshold; second neighbours at 0.9781 stay below it).  Any 5-cell
partition must split exactly 5 of the 60 adjacent pairs — recall
11/12 on pass 1 — and the pass-2 rotated-init boundaries land on
different pairs, so the union recovers all 60.  Precision is 1 in
every case (cosines are exact; the threshold admits only adjacent
pairs)."""

import math

import pytest

from pql_spark.operators.dedup import semantic_dedup_pairs

N = 60
THRESHOLD = 0.99
PLANTED = frozenset(
    (i, i + 1) if i + 1 < N else (0, i) for i in range(N)
)


@pytest.fixture(scope="module")
def circle(spark):
    rows = [
        (i, [math.cos(2 * math.pi * i / N), math.sin(2 * math.pi * i / N)])
        for i in range(N)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _planted_recall(df, passes: int) -> tuple[float, int]:
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            df, threshold=THRESHOLD, n_clusters=5, sample_size=N,
            passes=passes,
        ).collect()
    }
    extras = len(got - PLANTED)
    return len(got & PLANTED) / len(PLANTED), extras


def test_single_pass_misses_boundary_pairs(spark, circle):
    recall, extras = _planted_recall(circle, passes=1)
    # the miss the knob exists for: every 5-cell partition of the
    # circle splits exactly 5 adjacent pairs
    assert recall == pytest.approx(55 / 60)
    assert extras == 0  # exact cosines: nothing but planted pairs


def test_second_pass_recovers_them(spark, circle):
    r2, extras2 = _planted_recall(circle, passes=2)
    assert r2 == 1.0  # rotated boundaries cover the stragglers
    assert extras2 == 0  # precision unchanged


def test_passes_equal_one_is_the_legacy_plan(spark, circle):
    # passes=1 must be bit-identical to the pre-knob operator output
    a = semantic_dedup_pairs(
        circle, threshold=THRESHOLD, n_clusters=5, sample_size=N,
    ).collect()
    b = semantic_dedup_pairs(
        circle, threshold=THRESHOLD, n_clusters=5, sample_size=N,
        passes=1,
    ).collect()
    assert a == b
