"""Extended PNG surface (r15): palette color type, sub-8-bit and
16-bit depths, tRNS alpha, Adam7 interlacing — every decode path has a
locally encoded twin, plus cross-checks between interlaced and plain
encodings of the same pixels.  Pure numpy, no Spark session."""

from __future__ import annotations

import numpy as np
import pytest

from pql_spark.operators._png import (
    decode_png,
    encode_png,
    encode_png_paletted,
)


def _rng(seed):
    return np.random.RandomState(seed)


@pytest.mark.parametrize(
    "shape", [(13, 17), (9, 5, 2), (9, 5, 3), (6, 4, 4), (1, 1), (8, 1, 3)]
)
@pytest.mark.parametrize("interlace", [False, True])
def test_uint8_roundtrip_all_types(shape, interlace):
    a = _rng(1).randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(a, interlace=interlace))
    assert np.array_equal(out, a), (shape, interlace)


@pytest.mark.parametrize("shape", [(11, 7), (5, 9, 3), (4, 6, 4), (3, 3, 2)])
@pytest.mark.parametrize("interlace", [False, True])
def test_uint16_high_byte_reduction(shape, interlace):
    a = _rng(2).randint(0, 1 << 16, size=shape, dtype=np.uint16)
    out = decode_png(encode_png(a, interlace=interlace))
    assert np.array_equal(out, (a >> 8).astype(np.uint8)), (shape, interlace)


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_sub8_grey_scaling(depth, interlace):
    # odd width so packed rows end mid-byte
    a = _rng(depth).randint(0, 1 << depth, size=(9, 13), dtype=np.uint8)
    out = decode_png(encode_png(a, interlace=interlace, grey_depth=depth))
    want = (a.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    assert np.array_equal(out, want), (depth, interlace)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [False, True])
def test_palette_roundtrip(depth, interlace):
    n = 1 << depth
    pal = _rng(10 + depth).randint(0, 256, size=(n, 3), dtype=np.uint8)
    idx = _rng(20 + depth).randint(0, n, size=(10, 11), dtype=np.uint8)
    png = encode_png_paletted(idx, pal, bit_depth=depth, interlace=interlace)
    out = decode_png(png)
    assert out.shape == (10, 11, 3)
    assert np.array_equal(out, pal[idx]), (depth, interlace)


def test_palette_trns_yields_rgba():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    # alpha for indices 0 and 1 only; index 2 defaults to opaque
    png = encode_png_paletted(idx, pal, bit_depth=2, trns=[10, 200])
    out = decode_png(png)
    assert out.shape == (2, 3, 4)
    assert np.array_equal(out[..., :3], pal[idx])
    alpha = np.array([10, 200, 255], np.uint8)
    assert np.array_equal(out[..., 3], alpha[idx])


def test_interlaced_equals_plain_pixels():
    a = _rng(5).randint(0, 256, size=(23, 31, 3), dtype=np.uint8)
    plain = decode_png(encode_png(a))
    adam7 = decode_png(encode_png(a, interlace=True))
    assert np.array_equal(plain, adam7)


def test_interlaced_tiny_images_skip_empty_passes():
    # sizes below the Adam7 lattice leave several passes empty
    for shape in ((1, 1), (2, 2), (3, 5), (7, 3, 3), (4, 4, 4)):
        a = _rng(7).randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(a, interlace=True)), a
        ), shape


def test_palette_missing_plte_rejected():
    pal = np.zeros((4, 3), np.uint8)
    idx = np.zeros((3, 3), np.uint8)
    png = bytearray(encode_png_paletted(idx, pal, bit_depth=2))
    i = png.find(b"PLTE")
    png[i:i + 4] = b"pLTe"  # unknown chunk: skipped by the walker
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bytes(png))


def test_bad_depth_for_type_rejected():
    a = _rng(8).randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    png = bytearray(encode_png(a))
    png[24] = 4  # IHDR bit depth: RGB at depth 4 is illegal
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(bytes(png))


def test_truncated_scanlines_rejected():
    a = _rng(9).randint(0, 256, size=(16, 16), dtype=np.uint8)
    png = encode_png(a)
    with pytest.raises(ValueError):
        decode_png(png[: len(png) // 2])


# ---------------------------------------------------------------------
# differential fuzz: the list-based Average/Paeth unfilter loops vs an
# independent numpy-vectorized FILTERER (forward direction, built here
# from the RFC 2083 definitions) — the in-repo encoder only emits
# filter-0 rows, so this is the only path that exercises decode of
# filters 1-4 with per-row mixes


def _filtered_png(img, filts):
    import struct
    import zlib

    h, w, ch = img.shape
    bpp = ch
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    zpad = np.zeros(bpp, np.int32)
    for y in range(h):
        row = flat[y]
        filt = filts[y % len(filts)]
        left = np.concatenate([zpad, row[:-bpp]])
        cul = np.concatenate([zpad, prev[:-bpp]])
        if filt == 0:
            enc = row
        elif filt == 1:
            enc = (row - left) % 256
        elif filt == 2:
            enc = (row - prev) % 256
        elif filt == 3:
            enc = (row - ((left + prev) >> 1)) % 256
        else:
            p = left + prev - cul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - cul)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, cul),
            )
            enc = (row - pred) % 256
        raw.append(filt)
        raw += enc.astype(np.uint8).tobytes()
        prev = row
    def chunk(tag, data):
        c = tag + data
        return (
            struct.pack(">I", len(data)) + c
            + struct.pack(">I", zlib.crc32(c))
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_unfilter_differential_fuzz_all_filters():
    rng = np.random.default_rng(20250817)
    for t in range(80):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        ch = [3, 4][t % 2]
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        filts = rng.integers(0, 5, h).tolist()
        out = decode_png(_filtered_png(img, filts))
        assert np.array_equal(out[:, :, :ch], img), (t, h, w, ch)


def test_unfilter_paeth_average_long_rows():
    # multi-byte-per-pixel rows long enough that every left/up/up-left
    # phase interaction occurs, single filter held across all rows
    rng = np.random.default_rng(7)
    for filt in (3, 4):
        img = rng.integers(0, 256, (23, 201, 3), dtype=np.uint8)
        out = decode_png(_filtered_png(img, [filt]))
        assert np.array_equal(out[:, :, :3], img), filt
