"""Pure-stdlib GIF codec (struct + numpy): GIF87a/GIF89a decode with
real variable-width LZW, global/local color tables, interlacing, and
extension skipping; first frame of animated files.  The encoder writes
single-frame GIF89a with a true LZW compressor over a ≤256-color
palette (GIF is lossless for palettized images, so roundtrips are
bit-exact — the test discipline used for ``_png.py``).

Reference: the public GIF89a specification (W3C/CompuServe) — no
reference-repo counterpart; the reference engine has no media codecs.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------
# LZW


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW → palette indices (uint8 array of length n_pixels)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader: LSB-first within bytes
    acc = 0
    acc_n = 0
    pos = 0
    code_size = min_code_size + 1
    # dictionary: list of byte sequences
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None

    while n_out < n_pixels:
        while acc_n < code_size:
            if pos >= len(data):
                raise ValueError("decode_gif: LZW stream truncated")
            acc |= data[pos] << acc_n
            acc_n += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        acc_n -= code_size

        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("decode_gif: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("decode_gif: LZW code out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(
            entry[:take], dtype=np.uint8
        )
        n_out += take
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if n_out < n_pixels:
        raise ValueError("decode_gif: LZW ended before the image filled")
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Palette indices → GIF LZW bytes (with clear/EOI codes)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    acc_n = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, acc_n
        acc |= code << acc_n
        acc_n += code_size
        while acc_n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_n -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in indices.tobytes():
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # GIF increments the code width AFTER the code that fills the
        # current width's range is assigned
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code > 4095:  # table full → reset
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if acc_n:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------
# container


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _need(data: bytes, pos: int, n: int, what: str) -> None:
    """Bounds-check the next ``n`` bytes, keeping the codec's error
    contract uniform: every malformed/truncated payload raises a clean
    ``ValueError`` (the LZW path already did; ADVICE r14 asked the
    container reads to match instead of leaking struct.error /
    IndexError)."""
    if pos + n > len(data):
        raise ValueError(f"decode_gif: truncated {what}")


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB (first image of the stream).

    Handles GIF87a/89a, global and local color tables, interlaced
    images, and skips extension blocks (graphic control, comments,
    application/NETSCAPE loops).  Animated files yield frame 1."""
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("decode_gif: not a GIF file")
    if len(data) < 13:
        raise ValueError("decode_gif: truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        _need(data, pos, 3 * n, "global color table")
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos)
        gct = gct.reshape(n, 3)
        pos += 3 * n

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            _need(data, pos, 1, "extension block")
            while data[pos]:
                pos += 1 + data[pos]
                _need(data, pos, 1, "extension sub-block")
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"decode_gif: unknown block 0x{b:02X}")
        _need(data, pos + 1, 9, "image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            _need(data, pos, 3 * n, "local color table")
            ct = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("decode_gif: image has no color table")
        _need(data, pos, 1, "LZW header")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        _need(data, pos, 1, "image sub-block")
        while data[pos]:
            ln = data[pos]
            _need(data, pos + 1, ln, "image sub-block")
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
            _need(data, pos, 1, "image sub-block")
        pos += 1
        idx = _lzw_decode(int(min_code_size), bytes(lzw), w * h)
        if idx.max(initial=0) >= ct.shape[0]:
            raise ValueError("decode_gif: palette index out of range")
        rows = ct[idx].reshape(h, w, 3)
        if iflags & 0x40:
            rows = _deinterlace(rows)
        return rows.copy()
    raise ValueError("decode_gif: no image block found")


def encode_gif(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB (≤256 distinct colors) or (H, W) grey →
    single-frame GIF89a with real LZW.  Lossless for palettized
    content; >256 distinct colors raise (quantization needs an image
    library this environment doesn't have)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif: need (H, W) grey or (H, W, 3) RGB")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError(
            f"encode_gif: {colors.shape[0]} distinct colors > 256 —"
            " palettize first (no quantizer in this environment)"
        )
    # palette size: power of two ≥ max(2, n)
    bits = max(1, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    min_code_size = max(2, bits)
    lzw = _lzw_encode(min_code_size, idx.astype(np.uint8))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
