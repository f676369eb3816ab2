"""Minimal pure-Python PNG codec (stdlib ``zlib`` + numpy).

The container has no Pillow/libpng, but PNG itself is a public,
fully-specified format (RFC 2083): zlib-compressed scanlines with five
per-row predictor filters.  This module implements enough of it — 8-bit
greyscale / RGB / RGBA, non-interlaced — to give the multimodal
operators a REAL decode path end-to-end, not just the deterministic
fake.  Encoding always uses filter 0; decoding handles all five filter
types so externally produced PNGs (libpng defaults to adaptive
filtering) decode correctly.

Filters 0 (None) and 2 (Up) are vectorized; 1 (Sub) is a per-channel
modular cumsum; 3 (Average) and 4 (Paeth) fall back to a per-byte scan
because each pixel depends on the *decoded* left neighbour.  Intended
for the feature-extraction kernels' typical thumbnails, not bulk
transcoding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — (H, W) grey, (H, W, 3) RGB or (H, W, 4)
    RGBA — as a non-interlaced 8-bit PNG (filter 0 rows)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a uint8 array: (H, W) for
    greyscale, (H, W, C) otherwise."""
    data = bytes(data)
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = channels = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"color type {color_type}")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline data size mismatch")
    bpp = channels  # bytes per pixel at 8-bit depth
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: modular cumsum per pixel-channel column
            row = (
                np.cumsum(
                    row.reshape(w, bpp).astype(np.uint32), axis=0
                )
                % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: uint8 addition wraps mod 256 natively
            row += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f}")
        out[y] = row
        prev = row
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img
