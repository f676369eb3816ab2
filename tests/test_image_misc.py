"""BMP / netpbm / uncompressed-TIFF containers (r15): bit-exact
roundtrips (all three are lossless for 8-bit pixels), cross-container
identity through the auto-sniffing decoder, white-is-zero inversion,
byte-order coverage, honest refusals.  Pure numpy, no Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pql_spark.operators._image_misc import (
    decode_bmp,
    decode_pnm,
    decode_tiff,
    encode_bmp,
    encode_pnm,
    encode_tiff,
)


def _rgb(seed, h=11, w=17):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_bmp_roundtrip_and_padding():
    for w in (17, 16, 1):  # 17*3=51 → 1-byte pad rows
        a = _rgb(1, 9, w)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a), w


def test_bmp_topdown_and_palette():
    a = _rgb(2, 6, 5)
    buf = bytearray(encode_bmp(a))
    # flip to top-down: negate height and reverse our bottom-up rows
    struct.pack_into("<i", buf, 22, -6)
    flipped = decode_bmp(bytes(buf))
    assert np.array_equal(flipped, a[::-1])
    # 8-bit palettized: hand-build (4 colors)
    pal = np.array(
        [[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], np.uint8)
    h8, w8 = idx.shape
    stride = (w8 + 3) & ~3
    rows = b"".join(
        idx[::-1][y].tobytes() + b"\x00" * (stride - w8)
        for y in range(h8)
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w8, h8, 1, 8, 0, len(rows), 0, 0, 4, 0
    )
    palx = b"".join(bytes([c[2], c[1], c[0], 0]) for c in pal)
    off = 14 + 40 + len(palx)
    bmp = (
        struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
        + dib + palx + rows
    )
    assert np.array_equal(decode_bmp(bmp), pal[idx])


def test_bmp_refusals():
    a = _rgb(3)
    buf = bytearray(encode_bmp(a))
    struct.pack_into("<I", buf, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(NotImplementedError, match="biCompression"):
        decode_bmp(bytes(buf))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(60))


@pytest.mark.parametrize("ascii_format", [False, True])
def test_pnm_roundtrips(ascii_format):
    rgb = _rgb(4)
    assert np.array_equal(
        decode_pnm(encode_pnm(rgb, ascii_format)), rgb
    )
    grey = rgb[..., 0]
    out = decode_pnm(encode_pnm(grey, ascii_format))
    assert np.array_equal(out, np.stack([grey] * 3, -1))


def test_pnm_comments_maxval_and_16bit():
    # comments + non-255 maxval scaling (3x2 = 6 samples, 0..5)
    img = decode_pnm(b"P2\n# c\n3 2\n7\n0 1 2 3 4 5")
    assert img.shape == (2, 3, 3)
    assert img[0, 0, 0] == 0 and img[1, 2, 0] == 5 * 255 // 7
    # 16-bit P5 reduces to high byte
    a16 = np.array([[0, 256, 65535, 513]], dtype=np.uint16)
    p5 = b"P5\n4 1\n65535\n" + a16.astype(">u2").tobytes()
    out = decode_pnm(p5)
    assert list(out[0, :, 0]) == [0, 1, 255, 2]
    with pytest.raises(ValueError, match="maxval"):
        decode_pnm(b"P5\n1 1\n255\n\xff" .replace(b"255", b"254") )


@pytest.mark.parametrize("be", [False, True])
def test_tiff_roundtrip_both_orders(be):
    rgb = _rgb(5)
    assert np.array_equal(decode_tiff(encode_tiff(rgb, be)), rgb), be
    grey = rgb[..., 1]
    out = decode_tiff(encode_tiff(grey, be))
    assert np.array_equal(out, np.stack([grey] * 3, -1)), be


def test_tiff_white_is_zero_inverts():
    grey = _rgb(6)[..., 0]
    buf = bytearray(encode_tiff(grey))
    # photometric tag (262) value: find entry and set SHORT value to 0
    ifd_off = struct.unpack_from("<I", buf, 4)[0]
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", buf, off)[0]
        if tag == 262:
            struct.pack_into("<H", buf, off + 8, 0)
    out = decode_tiff(bytes(buf))
    assert np.array_equal(out, np.stack([255 - grey] * 3, -1))


def test_tiff_compressed_refused():
    buf = bytearray(encode_tiff(_rgb(7)))
    ifd_off = struct.unpack_from("<I", buf, 4)[0]
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", buf, off)[0] == 259:
            struct.pack_into("<H", buf, off + 8, 5)  # LZW
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(buf))


def test_auto_sniff_all_containers_pixel_identical():
    from pql_spark.operators._png import encode_png
    from pql_spark.operators.multimodal import _image_decoder

    a = _rgb(8)
    dec = _image_decoder("auto")
    outs = [
        dec(encode_png(a)),
        dec(encode_bmp(a)),
        dec(encode_pnm(a)),
        dec(encode_pnm(a, ascii_format=True)),
        dec(encode_tiff(a)),
        dec(encode_tiff(a, big_endian=True)),
    ]
    for i, o in enumerate(outs):
        assert np.array_equal(o, a), i
