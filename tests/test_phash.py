"""Perceptual-hash image near-dup: reference-math parity, perturbation
robustness, and the banded-Hamming join vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pql_spark.operators._png import decode_png, encode_png
from pql_spark.operators.multimodal import (
    image_phash,
    phash_dup_pairs,
    phash_reference,
    synth_image,
)


def _ham(a, b) -> int:
    return int(sum(x != y for x, y in zip(a, b)))


def test_reference_properties():
    img = synth_image(3)
    h = phash_reference(img)
    assert len(h) == 64 and set(h) <= {0, 1}
    # deterministic
    assert h == phash_reference(img)
    # brightness shift + mild noise stays near
    rng = np.random.RandomState(7)
    noisy = np.clip(
        img.astype(np.int64) + 12
        + rng.randint(-6, 7, img.shape), 0, 255
    ).astype(np.uint8)
    assert _ham(h, phash_reference(noisy)) <= 6
    # a different image is far
    assert _ham(h, phash_reference(synth_image(29))) > 12


@pytest.fixture(scope="module")
def media(spark):
    """40 distinct images + 6 perturbed near-dup clones (ids 1000+k of
    k in 0..5, brightness/noise perturbed re-encodes)."""
    rows = []
    rng = np.random.RandomState(11)
    for k in range(40):
        rows.append((k, encode_png(synth_image(k))))
    for k in range(6):
        img = synth_image(k).astype(np.int64)
        img = np.clip(
            img + 6 + rng.randint(-3, 4, img.shape), 0, 255
        ).astype(np.uint8)
        rows.append((1000 + k, encode_png(img)))
    return spark.createDataFrame(
        rows, "media_id long, payload binary"
    )


def test_image_phash_matches_reference(spark, media):
    got = {
        r.media_id: list(r.phash)
        for r in image_phash(media).collect()
    }
    for r in media.collect():
        want = phash_reference(decode_png(bytes(r.payload)))
        assert got[r.media_id] == want, r.media_id


def test_phash_dup_pairs_vs_brute_force(spark, media):
    out = phash_dup_pairs(media, threshold_bits=6, bands=8)
    got = sorted((r.id_a, r.id_b, r.hamming) for r in out.collect())
    # brute force over the reference hashes
    hs = {
        r.media_id: phash_reference(decode_png(bytes(r.payload)))
        for r in media.collect()
    }
    ids = sorted(hs)
    want = sorted(
        (a, b, _ham(hs[a], hs[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if _ham(hs[a], hs[b]) <= 6
    )
    # threshold < bands => the banded join is lossless
    assert got == want
    # no self pairs / ordering respected
    assert all(a < b for a, b, _ in got)
    # a wider lossless config (12 < 16 bands of 4 bits) must find
    # every planted clone pair
    wide = phash_dup_pairs(media, threshold_bits=12, bands=16)
    found = {(r.id_a, r.id_b) for r in wide.collect()}
    for k in range(6):
        assert (k, 1000 + k) in found, (k, _ham(hs[k], hs[1000 + k]))


def test_phash_validation(spark, media):
    with pytest.raises(ValueError, match="divide"):
        phash_dup_pairs(media, bands=7)
    with pytest.raises(ValueError, match="need columns"):
        image_phash(media.withColumnRenamed("payload", "p"))


# ------------------------------------------------------ audio twin

def test_audio_fingerprint_volume_invariant(spark):
    from pql_spark.operators.multimodal import (
        audio_dup_pairs,
        audio_fingerprint,
        encode_wav,
        synth_audio,
    )

    rows = []
    for k in range(24):
        rows.append((k, encode_wav(synth_audio(k))))
    # planted clones: volume-scaled + tiny deterministic noise
    for k in range(4):
        sig = synth_audio(k) * 0.5
        sig = sig + 0.002 * np.sin(np.arange(sig.size))
        rows.append((1000 + k, encode_wav(sig)))
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    fps = {r.media_id: list(r.afp) for r in
           audio_fingerprint(media).collect()}
    assert all(len(v) == 32 for v in fps.values())
    for k in range(4):
        assert _ham(fps[k], fps[1000 + k]) <= 3, k

    out = audio_dup_pairs(media, threshold=3, bands=8)
    got = sorted((r.id_a, r.id_b, r.hamming) for r in out.collect())
    ids = sorted(fps)
    want = sorted(
        (a, b, _ham(fps[a], fps[b]))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if _ham(fps[a], fps[b]) <= 3
    )
    assert got == want  # banding lossless at threshold < bands
    found = {(a, b) for a, b, _ in got}
    for k in range(4):
        assert (k, 1000 + k) in found


def test_hamming_dup_pairs_validation(spark):
    from pql_spark.operators.dedup import hamming_dup_pairs

    sig = spark.createDataFrame(
        [(1, [1, 2, 3, 4])], "id long, s array<int>"
    )
    with pytest.raises(ValueError, match="divide"):
        hamming_dup_pairs(sig, "s", "id", 4, 1, 3)
    with pytest.raises(ValueError, match="bands"):
        hamming_dup_pairs(sig, "s", "id", 4, 1, 0)


def test_hamming_dup_pairs_star_cap(spark):
    """An oversized bucket under max_bucket emits min-id stars: the
    planted clone of the min id survives; pairs among non-min members
    of the hot bucket may drop (recall-only trade, precision exact)."""
    from pql_spark.operators.dedup import hamming_dup_pairs

    # 12 identical signatures (one hot bucket) + 1 near-clone of id 0
    rows = [(k, [5] * 8) for k in range(12)]
    rows.append((100, [5] * 7 + [6]))
    sig = spark.createDataFrame(rows, "id long, s array<int>")
    capped = hamming_dup_pairs(sig, "s", "id", 8, 2, 4, max_bucket=5)
    got = sorted((r.id_a, r.id_b) for r in capped.collect())
    # star: min id 0 paired with every other hot member + the clone
    assert (0, 1) in got and (0, 11) in got and (0, 100) in got
    assert all(h <= 2 for _, _, h in
               ((r.id_a, r.id_b, r.hamming) for r in capped.collect()))
    # uncapped finds the full clique
    full = hamming_dup_pairs(sig, "s", "id", 8, 2, 4)
    assert len(full.collect()) == 12 * 13 // 2


# --------------------------------------------------- property-based

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    sigs=st.lists(
        st.lists(st.integers(0, 3), min_size=16, max_size=16),
        min_size=2, max_size=30, unique_by=lambda s: tuple(s),
    ),
    threshold=st.integers(0, 7),
    bands=st.sampled_from([8, 16]),
)
def test_hamming_join_lossless_property(spark, sigs, threshold, bands):
    """Random signatures: whenever threshold < bands the banded join
    returns EXACTLY the brute-force pair set."""
    from pql_spark.operators.dedup import hamming_dup_pairs

    rows = [(i, s) for i, s in enumerate(sigs)]
    df = spark.createDataFrame(rows, "id long, s array<int>")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_dup_pairs(
            df, "s", "id", 16, threshold, bands
        ).collect()
    )
    want = sorted(
        (a, b, _ham(sa, sb))
        for a, sa in rows
        for b, sb in rows[a + 1:]
        if _ham(sa, sb) <= threshold
    )
    assert got == want
