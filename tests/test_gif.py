"""GIF codec (LZW, palettes, interlace, refusals) and the G.711
µ-law/A-law WAV paths — the _png.py test precedent for the two r14
format additions.  Pure numpy except one Spark dispatch test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pql_spark.operators._gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from pql_spark.operators.multimodal import (
    _alaw_decode,
    _alaw_encode,
    _ulaw_decode,
    _ulaw_encode,
    decode_wav,
    encode_wav,
)


def _pal_image(seed: int, h: int, w: int, ncolors: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = np.unique(
        rng.integers(0, 256, (ncolors, 3), dtype=np.uint8), axis=0
    )
    return pal[rng.integers(0, pal.shape[0], (h, w))]


@pytest.mark.parametrize(
    "h,w,ncolors", [(1, 1, 1), (8, 8, 2), (33, 47, 64), (50, 61, 256)]
)
def test_gif_roundtrip_bit_exact(h, w, ncolors):
    img = _pal_image(ncolors, h, w, ncolors)
    out = decode_gif(encode_gif(img))
    assert out.shape == (h, w, 3) and (out == img).all()


def test_gif_lzw_table_reset_path():
    # enough entropy to fill the 4096-entry LZW table → in-stream
    # clear-code reset, still bit-exact
    img = _pal_image(9, 200, 300, 64)
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_grey_and_refusals():
    g = (np.arange(32 * 48) % 7 * 36).astype(np.uint8).reshape(32, 48)
    out = decode_gif(encode_gif(g))
    assert (out[:, :, 0] == g).all() and (out[:, :, 1] == g).all()
    with pytest.raises(ValueError, match="distinct colors"):
        encode_gif(
            np.random.default_rng(0).integers(
                0, 256, (40, 40, 3), dtype=np.uint8
            )
        )
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG definitely not")


def test_gif_interlaced_decode():
    # build an interlaced file: rows pre-permuted into GIF 4-pass
    # storage order, then the interlace flag set on the descriptor —
    # decode must reassemble the original
    img = _pal_image(4, 23, 17, 16)
    h = img.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    buf = bytearray(encode_gif(img[order]))
    i = buf.find(b"\x2c")
    buf[i + 9] |= 0x40  # image-descriptor flags: interlaced
    out = decode_gif(bytes(buf))
    assert (out == img).all()


def test_gif_animated_yields_first_frame_and_extensions_skipped():
    a = _pal_image(1, 12, 14, 8)
    b = _pal_image(2, 12, 14, 8)
    fa, fb = encode_gif(a), encode_gif(b)
    # splice: header+LSD+GCT of fa, a NETSCAPE app extension, image A,
    # image B's image block, trailer
    i_img_a = fa.find(b"\x2c")
    i_img_b = fb.find(b"\x2c")
    ext = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    spliced = (
        fa[:i_img_a] + ext + fa[i_img_a:-1] + fb[i_img_b:-1] + b"\x3b"
    )
    out = decode_gif(spliced)
    assert (out == a).all()


def test_gif_local_color_table():
    img = _pal_image(7, 9, 11, 4)
    f = bytearray(encode_gif(img))
    # move the global color table into a local one: clear the LSD GCT
    # flag, set the descriptor's LCT flag, relocate the palette bytes
    flags = f[10]
    bits = (flags & 0x07) + 1
    npal = 3 * (1 << bits)
    pal = bytes(f[13 : 13 + npal])
    rest = bytes(f[13 + npal :])
    f2 = bytearray(bytes(f[:10]) + bytes([0x00]) + bytes(f[11:13]) + rest)
    j = f2.find(b"\x2c")
    f2[j + 9] |= 0x80 | (bits - 1)
    f2[j + 10 : j + 10] = pal
    assert (decode_gif(bytes(f2)) == img).all()


def test_lzw_kwk_case():
    # the classic KwK sequence exercises code == len(table)
    idx = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1], dtype=np.uint8)
    assert (
        _lzw_decode(2, _lzw_encode(2, idx), len(idx))
        == idx
    ).all()


# --- G.711 -----------------------------------------------------------


@pytest.mark.parametrize(
    "enc,dec,min_snr",
    [(_ulaw_encode, _ulaw_decode, 35.0), (_alaw_encode, _alaw_decode, 35.0)],
)
def test_g711_companding_quality(enc, dec, min_snr):
    pcm = np.clip(
        np.linspace(-1, 1, 20001) * 32767, -32768, 32767
    ).astype(np.int16)
    y = dec(enc(pcm)).astype(np.float64)
    err = y - pcm
    snr = 10 * np.log10(np.mean(pcm.astype(float) ** 2) / np.mean(err**2))
    assert snr > min_snr  # G.711 textbook SNR ≈ 37-38 dB on a ramp
    assert bool(np.all(np.diff(y) >= 0))  # monotone transfer curve
    big = np.abs(pcm) > 64
    assert np.all(np.sign(y[big]) == np.sign(pcm[big].astype(float)))


@pytest.mark.parametrize("codec", ["pcm16", "ulaw", "alaw"])
def test_wav_container_roundtrip(codec):
    sig = np.sin(np.arange(2000) / 10) * 0.7
    out, sr = decode_wav(encode_wav(sig, 8000, codec=codec))
    assert sr == 8000 and len(out) == 2000
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((out - sig) ** 2))
    assert snr > (60.0 if codec == "pcm16" else 30.0)


def test_wav_pcm16_still_stdlib_compatible():
    import io
    import wave

    sig = np.sin(np.arange(500) / 5) * 0.5
    w = wave.open(io.BytesIO(encode_wav(sig, 8000)), "rb")
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
        1, 2, 8000,
    )


def test_wav_unknown_format_refused():
    buf = bytearray(encode_wav(np.zeros(16), 8000))
    i = buf.find(b"fmt ")
    struct.pack_into("<H", buf, i + 8, 2)  # ADPCM tag
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"junk")


def test_g711_encoders_bit_exact_vs_reference():
    # scalar transcription of the public g711.c / audioop algorithm
    # (one's-complement negative handling) — the r15 encoders must
    # match it code-for-code (ADVICE r14: |x| magnitude was one code
    # off at negative segment boundaries)
    seg_uend = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
    seg_aend = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]

    def search(val, table):
        for i, t in enumerate(table):
            if val <= t:
                return i
        return len(table)

    def ref_ulaw(x):
        p = x >> 2
        mask = 0x7F if p < 0 else 0xFF
        p = min(-p if p < 0 else p, 8159) + (0x84 >> 2)
        seg = search(p, seg_uend)
        if seg >= 8:
            return 0x7F ^ mask
        return ((seg << 4) | ((p >> (seg + 1)) & 0xF)) ^ mask

    def ref_alaw(x):
        p = x >> 3
        if p >= 0:
            mask = 0xD5
        else:
            mask, p = 0x55, -p - 1
        seg = search(p, seg_aend)
        if seg >= 8:
            return 0x7F ^ mask
        aval = seg << 4
        aval |= (p >> 1) & 0xF if seg < 2 else (p >> seg) & 0xF
        return aval ^ mask

    # every segment boundary ±2 plus a dense lattice
    edges = []
    for t in seg_uend + seg_aend:
        for base in (t << 2, t << 3):
            edges += [base - 2, base - 1, base, base + 1, base + 2]
            edges += [-v for v in edges[-5:]]
    xs = np.unique(
        np.clip(
            np.concatenate(
                [np.arange(-32768, 32768, 7), np.array(edges), [-1, 0, 1, -32768, 32767]]
            ),
            -32768,
            32767,
        ).astype(np.int16)
    )
    assert list(_ulaw_encode(xs)) == [ref_ulaw(int(v)) for v in xs]
    assert list(_alaw_encode(xs)) == [ref_alaw(int(v)) for v in xs]
    assert _ulaw_encode(np.array([-1], np.int16))[0] == 0x7E


def test_wav_ima_adpcm_roundtrip_and_tail_trim():
    rng = np.random.default_rng(3)
    t = np.arange(4000) / 8000.0
    sig = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=4000)
    sig = np.clip(sig, -1, 1)
    # lengths spanning partial/exact/multi blocks (spb = 505 at
    # block_align 256): fact-chunk trim must restore every length
    for n in [1, 2, 7, 504, 505, 506, 1011, 4000]:
        out, sr = decode_wav(encode_wav(sig[:n], 8000, codec="ima"))
        assert sr == 8000 and len(out) == n
    out, _ = decode_wav(encode_wav(sig, 8000, codec="ima"))
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((out - sig) ** 2))
    assert snr > 18.0  # 4-bit ADPCM: ~20-26 dB on tonal content


def test_wav_ima_adpcm_stereo_refused():
    buf = bytearray(encode_wav(np.zeros(600), 8000, codec="ima"))
    i = buf.find(b"fmt ")
    struct.pack_into("<H", buf, i + 10, 2)  # nChannels = 2
    with pytest.raises(NotImplementedError, match="stereo"):
        decode_wav(bytes(buf))


def test_gif_every_truncated_prefix_raises_clean_valueerror():
    # ADVICE r14: the container reads must match the LZW path's error
    # contract — no struct.error / IndexError leaks on ANY prefix
    img = _pal_image(5, 9, 13, 8)
    gif = encode_gif(img)
    # len-1 cuts only the 0x3B trailer: the first image is complete
    # and the tolerant first-frame decode legitimately succeeds
    for k in range(len(gif) - 1):
        with pytest.raises(ValueError):
            decode_gif(gif[:k])
    assert decode_gif(gif[:-1]).shape == (9, 13, 3)


# --- MP3 frame-header featurization (r15) ----------------------------


def test_mp3_headers_cbr_and_duration():
    from pql_spark.operators.multimodal import mp3_headers, synth_mp3

    m = mp3_headers(synth_mp3(1, 20))
    assert m["n_frames"] == 20
    assert m["sample_rate"] == 44100
    assert abs(m["duration_sec"] - 20 * 1152 / 44100) < 1e-6
    assert m["bitrate_kbps_mean"] == 128.0
    assert not m["vbr"]
    assert (m["version"], m["layer"], m["channels"]) == ("1", 3, 1)


def test_mp3_headers_vbr_id3_and_trailing_garbage():
    from pql_spark.operators.multimodal import mp3_headers, synth_mp3

    v = mp3_headers(synth_mp3(2, 30, vbr=True))
    assert v["vbr"] and v["n_frames"] == 30
    # ID3v2 tag with a syncsafe size is skipped
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + bytes(100)
    assert mp3_headers(id3 + synth_mp3(1, 5))["n_frames"] == 5
    # trailing ID3v1/garbage after the last frame is tolerated
    assert mp3_headers(synth_mp3(1, 5) + b"TAGjunk")["n_frames"] == 5


def test_mp3_headers_refusals():
    from pql_spark.operators.multimodal import mp3_headers, synth_mp3

    with pytest.raises(ValueError, match="no MPEG audio frame sync"):
        mp3_headers(b"\x00" * 64)
    with pytest.raises(ValueError):
        mp3_headers(b"")
    # a truncated final frame is dropped, the complete prefix counts
    full = synth_mp3(1, 4)
    assert mp3_headers(full[: len(full) - 10])["n_frames"] == 3


def test_wav_ms_adpcm_roundtrip_and_tail_trim():
    rng = np.random.default_rng(9)
    t = np.arange(4000) / 8000.0
    sig = np.clip(
        0.6 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.normal(size=4000),
        -1, 1,
    )
    # spb = (256-7)*2+2 = 500 at block_align 256
    for n in [1, 2, 3, 499, 500, 501, 2000, 4000]:
        out, sr = decode_wav(encode_wav(sig[:n], 8000, codec="msadpcm"))
        assert sr == 8000 and len(out) == n
    out, _ = decode_wav(encode_wav(sig, 8000, codec="msadpcm"))
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((out - sig) ** 2))
    assert snr > 18.0  # measured ~24-25 dB on tonal content


def test_wav_ms_adpcm_refusals():
    buf = bytearray(encode_wav(np.zeros(600), 8000, codec="msadpcm"))
    i = buf.find(b"fmt ")
    struct.pack_into("<H", buf, i + 10, 2)  # nChannels = 2
    with pytest.raises(NotImplementedError, match="stereo"):
        decode_wav(bytes(buf))
    # bad predictor index in the first block header raises cleanly
    buf2 = bytearray(encode_wav(np.zeros(600), 8000, codec="msadpcm"))
    j = buf2.find(b"data") + 8
    buf2[j] = 9  # predictor index > 6
    with pytest.raises(ValueError, match="predictor index"):
        decode_wav(bytes(buf2))


def test_adpcm_lockstep_matches_scalar_path():
    # decode_wav uses the lockstep (block-axis vectorized) decoder for
    # full blocks; it must be bit-identical to the scalar per-sample
    # reference on multi-block files, for BOTH 4-bit codecs
    import struct as _struct

    from pql_spark.operators.multimodal import (
        _ima_decode_block,
        _ms_decode_block,
    )

    t = np.arange(505 * 8 + 137) / 8000.0
    sig = np.clip(
        0.7 * np.sin(2 * np.pi * 300 * t) + 0.1 * np.sin(2 * np.pi * 77 * t),
        -1, 1,
    )
    for codec, hdr, scalar, spb, extra in [
        ("ima", 4, _ima_decode_block, 505, 1),
        ("msadpcm", 7, _ms_decode_block, 500, 2),
    ]:
        wav = encode_wav(sig, 8000, codec=codec)
        out, _ = decode_wav(wav)
        i = wav.find(b"data")
        (sz,) = _struct.unpack_from("<I", wav, i + 4)
        frames = wav[i + 8 : i + 8 + sz]
        chunks = [
            scalar(
                frames[o : o + 256],
                min(spb, (len(frames[o : o + 256]) - hdr) * 2 + extra),
            )
            for o in range(0, len(frames), 256)
            if len(frames[o : o + 256]) >= hdr
        ]
        ref = np.concatenate(chunks)[: len(sig)]
        got = (out * 32767.0).round().astype(np.int16)
        assert (got == ref).all(), codec


# ---------------------------------------------------------------------
# animation (r15): full multi-frame decode with disposal compositing


def _frames_rgb(n, h=10, w=14, seed=0):
    rng = np.random.RandomState(seed)
    return [
        (rng.randint(0, 8, size=(h, w, 3)) * 32).astype(np.uint8)
        for _ in range(n)
    ]


def test_gif_animated_full_frames_roundtrip():
    from pql_spark.operators._gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animated,
    )

    frames = _frames_rgb(4, seed=1)
    gif = encode_gif_animated(frames, delays_cs=[5, 10, 15, 20])
    out, delays = decode_gif_frames(gif)
    assert out.shape == (4, 10, 14, 3)
    for i, f in enumerate(frames):
        assert (out[i] == f).all(), i  # full-frame draws are lossless
    assert delays == [0.05, 0.10, 0.15, 0.20]
    # the still-image contract still returns exactly the first image
    assert (decode_gif(gif) == frames[0]).all()


def test_gif_animated_subrect_accumulates_disposal1():
    from pql_spark.operators._gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    base = _frames_rgb(1, 12, 16, seed=2)[0]
    patch = _frames_rgb(1, 4, 5, seed=3)[0]
    gif = encode_gif_animated(
        [base, patch], disposals=1, offsets=[(0, 0), (6, 3)]
    )
    out, _ = decode_gif_frames(gif)
    assert (out[0] == base).all()
    want = base.copy()
    want[3:7, 6:11] = patch
    assert (out[1] == want).all()


def test_gif_animated_disposal2_restores_background():
    from pql_spark.operators._gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    base = _frames_rgb(1, 8, 8, seed=4)[0]
    patch = _frames_rgb(1, 3, 3, seed=5)[0]
    tail = _frames_rgb(1, 2, 2, seed=6)[0]
    gif = encode_gif_animated(
        [base, patch, tail],
        disposals=[1, 2, 1],
        offsets=[(0, 0), (2, 2), (6, 6)],
    )
    out, _ = decode_gif_frames(gif)
    f1 = base.copy()
    f1[2:5, 2:5] = patch
    assert (out[1] == f1).all()
    # disposal 2 wiped the patch rect to background (black: no GCT)
    f2 = base.copy()
    f2[2:5, 2:5] = 0
    f2[6:8, 6:8] = tail
    assert (out[2] == f2).all()


def test_gif_animated_disposal3_restores_previous():
    from pql_spark.operators._gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    base = _frames_rgb(1, 8, 8, seed=7)[0]
    patch = _frames_rgb(1, 4, 4, seed=8)[0]
    tail = _frames_rgb(1, 2, 2, seed=9)[0]
    gif = encode_gif_animated(
        [base, patch, tail],
        disposals=[1, 3, 1],
        offsets=[(0, 0), (1, 1), (0, 0)],
    )
    out, _ = decode_gif_frames(gif)
    # frame 3 draws on the PRE-patch canvas
    f2 = base.copy()
    f2[0:2, 0:2] = tail
    assert (out[2] == f2).all()


def test_gif_animated_transparency_leaves_canvas():
    from pql_spark.operators._gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    base = _frames_rgb(1, 6, 6, seed=10)[0]
    patch = np.zeros((6, 6, 3), np.uint8)
    patch[:] = (1, 2, 3)            # the transparent key color
    patch[2:4, 2:4] = (200, 50, 9)  # the only opaque pixels
    gif = encode_gif_animated(
        [base, patch], transparent_color=(1, 2, 3)
    )
    out, _ = decode_gif_frames(gif)
    want = base.copy()
    want[2:4, 2:4] = (200, 50, 9)
    assert (out[1] == want).all()


def test_gif_still_decodes_as_single_frame():
    from pql_spark.operators._gif import decode_gif_frames, encode_gif

    img = _frames_rgb(1, 9, 7, seed=11)[0]
    out, delays = decode_gif_frames(encode_gif(img))
    assert out.shape == (1, 9, 7, 3) and (out[0] == img).all()
    assert delays == [0.0]


def test_decode_video_sniffs_gif_and_avi():
    from pql_spark.operators._avi import encode_avi
    from pql_spark.operators._gif import encode_gif_animated
    from pql_spark.operators.multimodal import decode_video

    frames = _frames_rgb(3, 8, 8, seed=12)
    g, gfps = decode_video(encode_gif_animated(frames, delays_cs=4))
    assert g.shape == (3, 8, 8, 3) and gfps == pytest.approx(25.0)
    for i, f in enumerate(frames):
        assert (g[i] == f).all()
    a, afps = decode_video(encode_avi(frames, fps=10))
    assert a.shape == (3, 8, 8, 3) and afps == 10.0
    with pytest.raises(ValueError, match="not an AVI or GIF"):
        decode_video(b"\x00" * 32)


def test_video_phash_mixed_avi_gif_corpus(spark):
    # animated GIFs participate in the video near-dup tier: the same
    # clip encoded as AVI and as GIF must hash identically (both are
    # lossless containers for the same frames)
    from pql_spark.operators._avi import encode_avi
    from pql_spark.operators._gif import encode_gif_animated
    from pql_spark.operators.multimodal import synth_video, video_phash

    rows = []
    for k in range(4):
        frames = [
            (f // 64 * 64).astype(np.uint8) for f in synth_video(k)
        ]  # coarsen to ≤64 distinct colors per frame for GIF
        rows.append((2 * k, bytearray(encode_avi(frames, fps=10))))
        rows.append((2 * k + 1, bytearray(encode_gif_animated(frames))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: tuple(r.vhash) for r in video_phash(df).collect()}
    assert len(got) == 8
    for k in range(4):
        assert got[2 * k] == got[2 * k + 1], k


# ---------------------------------------------------------------------
# r15: vectorized LZW decode vs the scalar reference — bit-exact on
# every input class, including every error path


def _check_lzw_pair(mcs: int, data: bytes, n: int) -> None:
    from pql_spark.operators._gif import _lzw_decode, _lzw_decode_scalar

    try:
        a, ea = _lzw_decode_scalar(mcs, data, n), None
    except ValueError as e:
        a, ea = None, str(e)
    try:
        b, eb = _lzw_decode(mcs, data, n), None
    except ValueError as e:
        b, eb = None, str(e)
    assert ea == eb, (mcs, n, ea, eb)
    if a is not None:
        assert np.array_equal(a, b), (mcs, n)


def test_lzw_vectorized_matches_scalar_roundtrips():
    from pql_spark.operators._gif import _lzw_encode

    rng = np.random.default_rng(2024)
    for trial in range(60):
        mcs = int(rng.integers(2, 9))
        npx = int(rng.integers(1, 3000))
        reps = int(rng.integers(1, 20))
        vals = rng.integers(0, 1 << mcs, npx // reps + 1)
        idx = np.repeat(vals, reps)[:npx].astype(np.uint8)
        if idx.size < npx:
            idx = np.pad(idx, (0, npx - idx.size))
        data = _lzw_encode(mcs, idx)
        _check_lzw_pair(mcs, data, npx)
        # oversized request: stream ends before the image fills
        _check_lzw_pair(mcs, data, npx + 17)


def test_lzw_vectorized_matches_scalar_truncation_every_byte():
    from pql_spark.operators._gif import _lzw_encode

    rng = np.random.default_rng(7)
    for mcs in (2, 5, 8):
        npx = 200
        idx = rng.integers(0, 1 << mcs, npx).astype(np.uint8)
        data = _lzw_encode(mcs, idx)
        for cut in range(len(data)):
            _check_lzw_pair(mcs, data[:cut], npx)


def test_lzw_vectorized_matches_scalar_garbage_and_edges():
    rng = np.random.default_rng(99)
    for trial in range(200):
        mcs = int(rng.integers(0, 9))  # incl. degenerate 0/1
        npx = int(rng.integers(1, 400))
        data = bytes(
            rng.integers(0, 256, int(rng.integers(0, 150))).astype(np.uint8)
        )
        _check_lzw_pair(mcs, data, npx)
    _check_lzw_pair(4, b"", 0)
    _check_lzw_pair(4, b"", 5)
    # mcs=1: width bumps right after the segment's first code
    from pql_spark.operators._gif import _lzw_encode

    idx = rng.integers(0, 2, 300).astype(np.uint8)
    _check_lzw_pair(2, _lzw_encode(2, idx), 300)


def test_lzw_encode_differential_fuzz():
    # the int-keyed encoder against the r14 bytes-keyed reference:
    # byte-identical output across palette sizes, content shapes
    # (smooth runs → long prefixes, noise → table resets), and sizes
    # crossing the 4095-code reset boundary; every payload must also
    # roundtrip through the decoder
    from pql_spark.operators._gif import (
        _lzw_decode,
        _lzw_encode,
        _lzw_encode_scalar,
    )

    rng = np.random.default_rng(20250817)
    for trial in range(120):
        mcs = int(rng.integers(2, 9))
        npx = int(rng.integers(1, 12000))
        kind = trial % 3
        if kind == 0:  # noise: maximal table churn / resets
            idx = rng.integers(0, 1 << mcs, npx)
        elif kind == 1:  # smooth runs: long prefix chains
            idx = (np.arange(npx) // int(rng.integers(1, 40))) % (1 << mcs)
        else:  # constant
            idx = np.full(npx, int(rng.integers(0, 1 << mcs)))
        idx = idx.astype(np.uint8)
        got = _lzw_encode(mcs, idx)
        want = _lzw_encode_scalar(mcs, idx)
        assert got == want, (mcs, npx, kind)
        assert (_lzw_decode(mcs, got, npx) == idx).all()
    # empty input: clear + EOI only
    empty = np.zeros(0, dtype=np.uint8)
    assert _lzw_encode(4, empty) == _lzw_encode_scalar(4, empty)
