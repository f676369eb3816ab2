"""Baseline JPEG codec: entropy bit-exactness, lossy roundtrip quality,
chroma subsampling, restart markers, honest codec boundary — the
_png.py/_avi.py test precedent for the dominant real-world image
format.  Pure numpy, no Spark session."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pql_spark.operators._jpeg import (
    decode_jpeg,
    decode_jpeg_quantized,
    encode_jpeg,
    quantized_planes,
)


def _img(seed: int, h: int = 32, w: int = 48) -> np.ndarray:
    """Deterministic smooth-ish RGB test image (gradients + low-freq
    waves — the content JPEG is designed for)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 90 * np.sin(xx / (7 + seed % 5) + seed)
    g = 128 + 90 * np.cos(yy / (6 + seed % 3) - seed)
    b = 128 + 80 * np.sin((xx + 2 * yy) / (9 + seed % 7) - 2 * seed)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0**2 / max(mse, 1e-12)))


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_entropy_layer_bit_exact(subsample):
    # the decoder's parsed quantized coefficients must equal the
    # encoder's quantizer output EXACTLY — proves Huffman coding,
    # byte stuffing, and MCU interleaving are lossless
    img = _img(3)
    payload = encode_jpeg(img, quality=80, subsample=subsample)
    got = decode_jpeg_quantized(payload)
    want, factors, _ = quantized_planes(img, quality=80, subsample=subsample)
    for cid, coef, (fh, fv) in zip((1, 2, 3), want, factors):
        g = got[cid]
        rb, cb = g.shape[:2]
        w_grid = coef.reshape(rb, cb, 8, 8)
        assert (g == w_grid).all(), f"component {cid} coefficients differ"


def test_entropy_layer_bit_exact_with_restarts():
    img = _img(7, 48, 64)
    plain = encode_jpeg(img, quality=75, subsample="420")
    rst = encode_jpeg(img, quality=75, subsample="420", restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    a = decode_jpeg_quantized(plain)
    b = decode_jpeg_quantized(rst)
    for cid in a:
        assert (a[cid] == b[cid]).all()
    assert (decode_jpeg(plain) == decode_jpeg(rst)).all()


@pytest.mark.parametrize(
    "subsample,min_psnr", [("444", 33.0), ("420", 30.0)]
)
def test_roundtrip_quality(subsample, min_psnr):
    img = _img(1)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > min_psnr


def test_q100_near_lossless_444():
    # quality 100 → all-ones quantizers → only DCT float rounding
    img = _img(2)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsample="444"))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_odd_sizes_and_grey():
    for h, w in ((9, 9), (17, 45), (8, 8), (1, 1), (15, 16)):
        img = _img(5, h, w)
        out = decode_jpeg(encode_jpeg(img, quality=92, subsample="420"))
        assert out.shape == (h, w, 3)
        assert _psnr(img, out) > 24.0
    grey = _img(6)[:, :, 0]
    out = decode_jpeg(encode_jpeg(grey, quality=92, subsample="444"))
    assert out.shape == (*grey.shape, 3)
    assert _psnr(np.stack([grey] * 3, -1), out) > 30.0


def test_mislabeled_progressive_rejected():
    # a baseline stream whose SOF marker is flipped to SOF2 is
    # malformed: its single scan covers ss=0..se=63, which progressive
    # mode forbids (DC scans need Se=0) — clean ValueError, not a
    # silent mis-decode
    buf = bytearray(encode_jpeg(_img(4), quality=80))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(buf))


def test_arithmetic_sof_refused():
    buf = bytearray(encode_jpeg(_img(4), quality=80))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(buf))


def test_16bit_dqt_refused():
    buf = bytearray(encode_jpeg(_img(4), quality=80))
    i = buf.find(b"\xff\xdb")
    buf[i + 4] |= 0x10  # Pq=1 (16-bit)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bytes(buf))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")


def test_container_structure():
    p = encode_jpeg(_img(0), quality=85)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in p
    # SOF0 dims match
    i = p.find(b"\xff\xc0")
    _, hh, ww, nc = struct.unpack_from(">BHHB", p, i + 4)
    assert (hh, ww, nc) == (32, 48, 3)


def test_mjpeg_avi_roundtrip():
    from pql_spark.operators._avi import decode_avi, encode_avi

    frames = [_img(k, 32, 48) for k in range(3)]
    avi = encode_avi(frames, fps=10, codec="MJPG", quality=92)
    assert b"MJPG" in avi and b"00dc" in avi
    out, fps = decode_avi(avi)
    assert fps == 10.0 and out.shape == (3, 32, 48, 3)
    for i in range(3):
        assert _psnr(frames[i], out[i]) > 30.0


def test_annex_k_tables_match_spec():
    # spot-check the generated canonical codewords against the
    # expanded code tables printed in ITU-T T.81 itself (Annex K) —
    # independent of our own roundtrip, so a transcription error in
    # the BITS/HUFFVAL lists cannot self-consistently hide
    from pql_spark.operators._jpeg import _ANNEX_K_ENC, _ANNEX_K_SPECS

    for (_tc, _th), (bits, vals) in _ANNEX_K_SPECS.items():
        assert sum(bits) == len(vals)
    dc_lum = _ANNEX_K_ENC[(0, 0)]
    assert dc_lum[0] == (0b00, 2)
    assert dc_lum[5] == (0b110, 3)
    assert dc_lum[11] == (0b111111110, 9)
    dc_chr = _ANNEX_K_ENC[(0, 1)]
    assert dc_chr[0] == (0b00, 2)
    assert dc_chr[2] == (0b10, 2)
    assert dc_chr[11] == (0b11111111110, 11)
    ac_lum = _ANNEX_K_ENC[(1, 0)]
    assert ac_lum[0x01] == (0b00, 2)
    assert ac_lum[0x00] == (0b1010, 4)         # EOB
    assert ac_lum[0x11] == (0b1100, 4)
    assert ac_lum[0xF0] == (0b11111111001, 11)  # ZRL
    assert ac_lum[0xFA] == (0xFFFE, 16)
    ac_chr = _ANNEX_K_ENC[(1, 1)]
    assert ac_chr[0x00] == (0b00, 2)           # EOB
    assert ac_chr[0x01] == (0b01, 2)
    assert ac_chr[0xF0] == (0b1111111010, 10)  # ZRL
    assert ac_chr[0xFA] == (0xFFFE, 16)


def test_jpeg_annex_k_tables_pixel_identical():
    # same quantized data, different entropy tables → the decoded
    # pixels must be bit-identical; the DHT-carrying Annex K frame
    # exercises the generic table parser with the real-world defaults
    img = _img(3)
    fast = decode_jpeg(encode_jpeg(img, quality=85))
    kk = decode_jpeg(encode_jpeg(img, quality=85, tables="annex_k"))
    assert (fast == kk).all()


def test_jpeg_omit_dht_strict_vs_default_huffman():
    img = _img(6)
    with_dht = encode_jpeg(img, quality=88, tables="annex_k")
    bare = encode_jpeg(img, quality=88, tables="annex_k", omit_dht=True)
    assert b"\xff\xc4" in with_dht and b"\xff\xc4" not in bare
    # standalone JFIF decoding stays strict: no silent table guessing
    with pytest.raises(ValueError, match="missing DHT"):
        decode_jpeg(bare)
    out = decode_jpeg(bare, default_huffman=True)
    assert (out == decode_jpeg(with_dht)).all()
    # omit_dht only makes sense under the Annex K convention
    with pytest.raises(ValueError, match="annex_k"):
        encode_jpeg(img, omit_dht=True)


def test_mjpeg_dht_less_avi_decodes():
    # legacy MJPEG convention: frames without in-stream Huffman
    # tables decode via the Annex K defaults (RFC 2435 Appendix A)
    from pql_spark.operators._avi import decode_avi, encode_avi

    frames = [_img(k, 32, 48) for k in range(3)]
    avi = encode_avi(frames, fps=10, codec="MJPG", quality=92,
                     mjpeg_dht=False)
    assert b"\xff\xc4" not in avi  # truly DHT-less frames
    out, fps = decode_avi(avi)
    assert fps == 10.0 and out.shape == (3, 32, 48, 3)
    carried, _ = decode_avi(
        encode_avi(frames, fps=10, codec="MJPG", quality=92)
    )
    assert (out == carried).all()
    for i in range(3):
        assert _psnr(frames[i], out[i]) > 30.0


def test_image_decoder_auto_sniffs_magic():
    from pql_spark.operators._jpeg import decode_jpeg
    from pql_spark.operators._png import decode_png, encode_png
    from pql_spark.operators.multimodal import _image_decoder

    img = _img(9)
    dec = _image_decoder("auto")
    assert (dec(encode_png(img)) == decode_png(encode_png(img))).all()
    jp = encode_jpeg(img, quality=90)
    assert (dec(jp) == decode_jpeg(jp)).all()
    from pql_spark.operators._gif import encode_gif

    pal_img = np.stack([img[:, :, 0]] * 3, axis=-1)  # grey → ≤256 colors
    assert (dec(encode_gif(pal_img)) == pal_img).all()  # GIF sniffed too
    # BM magic now routes to the BMP decoder (r15) → malformed BMP
    with pytest.raises(ValueError, match="not a BMP"):
        dec(b"BM not a supported image")
    with pytest.raises(NotImplementedError, match="not"):
        dec(b"\x00\x01 definitely not an image")


def test_extract_features_jpeg_and_auto(spark):
    from pql_spark.operators.multimodal import (
        extract_features,
        image_feature,
        synth_image,
        synthesize_jpeg_media,
    )
    from pql_spark.operators._jpeg import decode_jpeg, encode_jpeg

    media = synthesize_jpeg_media(spark, n=8)
    for decoder in ("jpeg", "auto"):
        rows = {
            r["media_id"]: list(r["feature"])
            for r in extract_features(media, dim=16, decoder=decoder)
            .collect()
        }
        assert set(rows) == set(range(8))
        want = image_feature(
            decode_jpeg(encode_jpeg(synth_image(3), quality=90,
                                    subsample="420")),
            16,
        )
        assert np.allclose(rows[3], want, atol=1e-9)


def test_entropy_bit_exact_property_fuzz():
    # hypothesis sweep over sizes / content / quality / subsampling /
    # restart intervals: the entropy layer must stay bit-exact and the
    # decode must reconstruct to the right shape for EVERY combination
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        quality=st.integers(1, 100),
        subsample=st.sampled_from(["444", "420"]),
        restart=st.sampled_from([0, 1, 2, 7]),
        grain=st.sampled_from(["smooth", "noise", "flat"]),
    )
    def check(h, w, seed, quality, subsample, restart, grain):
        rng = np.random.default_rng(seed)
        if grain == "noise":
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif grain == "flat":
            img = np.full((h, w, 3), rng.integers(0, 256, 3,
                                                  dtype=np.uint8))
        else:
            img = _img(seed % 97, h, w)
        payload = encode_jpeg(
            img, quality=quality, subsample=subsample,
            restart_interval=restart,
        )
        got = decode_jpeg_quantized(payload)
        want, factors, _ = quantized_planes(img, quality, subsample)
        for cid, coef in zip((1, 2, 3), want):
            g = got[cid]
            assert (g == coef.reshape(g.shape)).all()
        out = decode_jpeg(payload)
        assert out.shape == (h, w, 3) and out.dtype == np.uint8
        if grain == "flat" and subsample == "444" and quality >= 95:
            assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2

    check()


def test_decoder_handles_annexk_standard_tables():
    # real-world encoders ship the Annex K Huffman tables; the decoder
    # must treat them as just another canonical DHT.  Re-emit an
    # encoded file with DIFFERENT (standard-style, variable-length)
    # tables by transcoding the coefficient stream: simplest proxy —
    # decode a file whose DHT segments were re-ordered and duplicated
    # (decoder must key tables by (class, id), last definition wins).
    img = _img(8)
    p = bytearray(encode_jpeg(img, quality=80))
    # duplicate the first DHT segment right before SOS (re-definition)
    i = p.find(b"\xff\xc4")
    (ln,) = struct.unpack_from(">H", p, i + 2)
    dht = bytes(p[i : i + 2 + ln])
    j = p.find(b"\xff\xda")
    p2 = bytes(p[:j]) + dht + bytes(p[j:])
    assert (decode_jpeg(p2) == decode_jpeg(bytes(p))).all()


# ---------------------------------------------------------------------
# progressive (SOF2)


def test_progressive_full_decode_matches_baseline():
    # the default scan script takes every coefficient to approximation
    # 0, so the decoded pixels must be BIT-IDENTICAL to the baseline
    # encoding of the same quantized planes — this exercises DC first/
    # refine, split AC bands, AC refinement with EOB runs in one shot
    from pql_spark.operators._jpeg import encode_jpeg_progressive

    for sub in ("444", "420"):
        img = _img(11, 40, 56)  # 40 px: used grid < padded MCU grid
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        prog_payload = encode_jpeg_progressive(
            img, quality=85, subsample=sub
        )
        assert b"\xff\xc2" in prog_payload
        prog = decode_jpeg(prog_payload)
        assert (prog == base).all(), sub


def test_progressive_quantized_grids_match_baseline():
    # stronger than pixels: the accumulated coefficient grids after
    # all scans equal the single-scan baseline grids exactly
    from pql_spark.operators._jpeg import (
        decode_jpeg_quantized,
        encode_jpeg_progressive,
    )

    img = _img(12, 32, 48)
    qb = decode_jpeg_quantized(encode_jpeg(img, quality=80))
    qp = decode_jpeg_quantized(encode_jpeg_progressive(img, quality=80))
    assert sorted(qb) == sorted(qp)
    for cid in qb:
        assert (qb[cid] == qp[cid]).all(), cid


def test_progressive_grey_input_matches_baseline():
    img = _img(13, 24, 40)[..., 0]  # 2-D grey
    from pql_spark.operators._jpeg import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert (prog == base).all()


def test_progressive_single_component_scan_script():
    # non-interleaved DC scans + luma-only AC: for grey input the
    # chroma planes quantize to all-zero blocks, so skipping their AC
    # scans is lossless and the result still matches baseline
    from pql_spark.operators._jpeg import (
        _default_prog_scans,
        encode_jpeg_progressive,
    )

    img = _img(14, 16, 24)[..., 1]
    base = decode_jpeg(encode_jpeg(img, quality=75))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img, quality=75, scans=_default_prog_scans(1)
        )
    )
    assert (prog == base).all()


def test_progressive_spectral_selection_only():
    # a no-successive-approximation script (Ah=Al=0 everywhere)
    from pql_spark.operators._jpeg import encode_jpeg_progressive

    img = _img(15, 32, 32)
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 5, 0, 0),
        ([0], 6, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=92, subsample="444"))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img, quality=92, subsample="444", scans=scans
        )
    )
    assert (prog == base).all()


def test_progressive_restart_intervals():
    from pql_spark.operators._jpeg import encode_jpeg_progressive

    img = _img(16, 48, 64)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    payload = encode_jpeg_progressive(img, quality=85, restart_interval=2)
    assert b"\xff\xd0" in payload  # RST0 present
    assert (decode_jpeg(payload) == base).all()


def test_progressive_truncated_raises_clean():
    from pql_spark.operators._jpeg import encode_jpeg_progressive

    payload = encode_jpeg_progressive(_img(17), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) * 2 // 3])


# ---------------------------------------------------------------------
# differential fuzz: the peek-table reader vs the scalar reference


def _random_canonical_table(rng) -> dict:
    """Random canonical (prefix-free) Huffman table, DHT-style: assign
    canonical codes to a random ascending list of code lengths."""
    while True:
        n = int(rng.integers(1, 9))
        lengths = sorted(int(rng.integers(1, 12)) for _ in range(n))
        table, ok = {}, True
        code, prev_len = 0, lengths[0]
        for i, ln in enumerate(lengths):
            if i:
                code = (code + 1) << (ln - prev_len)
            if code >= (1 << ln):
                ok = False
                break
            table[(ln, code)] = int(rng.integers(0, 256))
            prev_len = ln
        if ok:
            return table


def _scalar_decode_block(ref, dc_tab, ac_tab):
    """The r14 per-block entropy loop, composed from the scalar
    reference reader — the behavioural spec for decode_block."""
    from pql_spark.operators._jpeg import _extend

    size = ref.huff(dc_tab)
    if size > 11:
        raise ValueError("decode_jpeg: bad DC category")
    diff = _extend(ref.receive(size), size)
    zz = [0] * 64
    k = 1
    while k < 64:
        rs = ref.huff(ac_tab)
        run, sz = rs >> 4, rs & 0xF
        if sz == 0:
            if run == 15:
                k += 16
                continue
            break
        k += run
        if k > 63:
            raise ValueError("decode_jpeg: AC run overflows block")
        zz[k] = _extend(ref.receive(sz), sz)
        k += 1
    return diff, zz


def test_bitreader_differential_fuzz():
    # drive _BitReader and _BitReaderScalar with identical random op
    # sequences over random data and random canonical tables: values,
    # consumed bit positions on success, and every ValueError message
    # must agree (the exact claim in the _BitReader docstring)
    from pql_spark.operators._jpeg import _BitReader, _BitReaderScalar

    rng = np.random.default_rng(20250817)
    errors = 0
    for _trial in range(600):
        data = rng.integers(
            0, 256, int(rng.integers(0, 24)), dtype=np.uint8
        ).tobytes()
        tables = [_random_canonical_table(rng) for _ in range(2)]
        fast, ref = _BitReader(data), _BitReaderScalar(data)
        for _step in range(int(rng.integers(1, 24))):
            op = int(rng.integers(0, 3))
            arg = int(rng.integers(0, 17)) if op == 1 else int(
                rng.integers(0, 2)
            )

            def run(r):
                if op == 0:
                    return r.read_bit()
                if op == 1:
                    return r.receive(arg)
                return r.huff(tables[arg])

            got = want = gerr = werr = None
            try:
                got = run(fast)
            except ValueError as e:
                gerr = str(e)
            try:
                want = run(ref)
            except ValueError as e:
                werr = str(e)
            assert got == want, (data.hex(), op, arg, got, want)
            assert gerr == werr, (data.hex(), op, arg, gerr, werr)
            if gerr is not None:
                errors += 1
                break  # post-error cursor state is unspecified
            assert fast.bitpos == 8 * ref.pos + ref.bit
    assert errors > 50  # the sweep must actually hit error paths


def test_decode_block_differential_fuzz():
    # the fused decode_block against the r14 huff/receive/EXTEND
    # composition over the scalar reader: identical (diff, zz),
    # identical cursor on success, identical ValueError on failure
    from pql_spark.operators._jpeg import (
        _BitReader,
        _BitReaderScalar,
        _peek_tables,
    )

    rng = np.random.default_rng(1234)
    errors = 0
    for _trial in range(600):
        data = rng.integers(
            0, 256, int(rng.integers(0, 64)), dtype=np.uint8
        ).tobytes()
        dc_tab = _random_canonical_table(rng)
        ac_tab = _random_canonical_table(rng)
        dc_syms, dc_lens = _peek_tables(dc_tab)
        ac_syms, ac_lens = _peek_tables(ac_tab)
        fast, ref = _BitReader(data), _BitReaderScalar(data)
        while True:
            got = want = gerr = werr = None
            try:
                got = fast.decode_block(dc_syms, dc_lens, ac_syms, ac_lens)
            except ValueError as e:
                gerr = str(e)
            try:
                want = _scalar_decode_block(ref, dc_tab, ac_tab)
            except ValueError as e:
                werr = str(e)
            assert got == want, (data.hex(), got, want)
            assert gerr == werr, (data.hex(), gerr, werr)
            if gerr is not None:
                errors += 1
                break
            assert fast.bitpos == 8 * ref.pos + ref.bit
    assert errors > 100  # exhaustion/invalid-code paths must be hit


def test_encode_scan_differential_fuzz():
    # the vectorized scan encoder against the r14 per-block reference
    # loop: byte-identical entropy sections (incl. RSTn rotation,
    # per-chunk padding, byte stuffing) over sizes / content / quality
    # / subsampling / restart intervals / both table sets
    from pql_spark.operators._jpeg import (
        _ANNEX_K_ENC,
        _ENC_AC_CODES,
        _ENC_DC_CODES,
        _encode_scan,
        _encode_scan_scalar,
        quantized_planes,
    )

    rng = np.random.default_rng(20250818)
    for trial in range(60):
        h = int(rng.integers(1, 41))
        w = int(rng.integers(1, 41))
        grain = ["smooth", "noise", "flat"][trial % 3]
        if grain == "noise":
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif grain == "flat":
            img = np.full(
                (h, w, 3), rng.integers(0, 256, 3, dtype=np.uint8)
            )
        else:
            img = _img(trial % 97, h, w)
        q = int(rng.integers(1, 101))
        ss = ["444", "420"][trial % 2]
        rst = [0, 1, 2, 7][trial % 4]
        comps, factors, _ = quantized_planes(img, q, ss)
        mh = max(f[0] for f in factors)
        mv = max(f[1] for f in factors)
        mcu_cols = -(-w // (8 * mh))
        mcu_rows = -(-h // (8 * mv))
        if trial % 5 == 0:
            cc = [
                (_ANNEX_K_ENC[(0, 0)], _ANNEX_K_ENC[(1, 0)]),
                (_ANNEX_K_ENC[(0, 1)], _ANNEX_K_ENC[(1, 1)]),
                (_ANNEX_K_ENC[(0, 1)], _ANNEX_K_ENC[(1, 1)]),
            ]
        else:
            cc = [(_ENC_DC_CODES, _ENC_AC_CODES)] * 3
        got = _encode_scan(comps, factors, mcu_rows, mcu_cols, cc, rst)
        want = _encode_scan_scalar(
            comps, factors, mcu_rows, mcu_cols, cc, rst
        )
        assert got == want, (h, w, q, ss, rst, grain)
