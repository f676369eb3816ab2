"""Small uncompressed image containers (struct + numpy): BMP, netpbm
(PGM/PPM, ASCII and binary), and baseline uncompressed TIFF — the
remaining formats a mixed scraped-image corpus realistically carries
that need no entropy codec.  Each has an encoder twin so roundtrips
are bit-exact (all three are lossless containers for 8-bit pixels).

Scope and honest boundaries:

* **BMP** — 24-bit BI_RGB and 8-bit palettized, bottom-up or top-down
  (negative height), 4-byte row padding.  RLE/bitfield compressions
  raise ``NotImplementedError``.
* **PGM/PPM** — P2/P5 grey and P3/P6 RGB, maxval ≤ 65535 (16-bit
  reduces to the high byte, the netpbm convention), ``#`` comments.
* **TIFF** — both byte orders (II/MM), compression 1 (none), 8-bit
  greyscale (photometric 0 white-is-zero — inverted — and 1) and RGB,
  multi-strip.  LZW/JPEG/deflate TIFFs raise ``NotImplementedError``
  at the compression tag.

Reference: the public BMP (MSDN BITMAPINFOHEADER), netpbm and TIFF 6.0
specifications — no reference-repo counterpart; the reference engine
has no media codecs.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------
# BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp: need (H, W[, 3]) uint8")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    bgr = a[::-1, :, ::-1]  # bottom-up, BGR
    pad = b"\x00" * (stride - w * 3)
    for y in range(h):
        rows += bgr[y].tobytes() + pad
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    return hdr + dib + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) uint8 RGB.  24-bit BI_RGB or 8-bit
    palettized, top-down via negative height."""
    data = bytes(payload)
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("decode_bmp: not a BMP file")
    (off,) = struct.unpack_from("<I", data, 10)
    size, w, h = struct.unpack_from("<Iii", data, 14)
    if size < 40:
        raise NotImplementedError("decode_bmp: BITMAPCOREHEADER variant")
    _planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    topdown = h < 0
    h = abs(h)
    if comp != 0:
        raise NotImplementedError(
            f"decode_bmp: biCompression={comp} not supported (BI_RGB only"
            " — RLE/bitfields need an image library)"
        )
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        need = stride * h
        if off + need > len(data):
            raise ValueError("decode_bmp: truncated pixel data")
        rows = np.frombuffer(
            data, np.uint8, need, off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        img = rows[:, :, ::-1]  # BGR → RGB
    elif bpp == 8:
        (ncol,) = struct.unpack_from("<I", data, 46)
        ncol = ncol or 256
        pal_off = 14 + size
        pal = np.frombuffer(
            data, np.uint8, ncol * 4, pal_off
        ).reshape(ncol, 4)[:, :3][:, ::-1]  # BGRX → RGB
        stride = (w + 3) & ~3
        need = stride * h
        if off + need > len(data):
            raise ValueError("decode_bmp: truncated pixel data")
        idx = np.frombuffer(data, np.uint8, need, off).reshape(h, stride)
        idx = idx[:, :w]
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("decode_bmp: palette index out of range")
        img = pal[idx]
    else:
        raise NotImplementedError(
            f"decode_bmp: {bpp}-bit BMP not supported (8/24-bit)"
        )
    return np.ascontiguousarray(img if topdown else img[::-1])


# ---------------------------------------------------------------------
# netpbm (PGM / PPM)


def encode_pnm(img: np.ndarray, ascii_format: bool = False) -> bytes:
    """(H, W) grey → PGM, (H, W, 3) RGB → PPM (binary P5/P6, or the
    ASCII P2/P3 twins)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P2" if ascii_format else b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P3" if ascii_format else b"P6"
    else:
        raise ValueError("encode_pnm: need (H, W) grey or (H, W, 3) RGB")
    h, w = a.shape[:2]
    hdr = magic + f"\n{w} {h}\n255\n".encode()
    if ascii_format:
        return hdr + " ".join(str(int(v)) for v in a.reshape(-1)).encode()
    return hdr + a.tobytes()


def decode_pnm(payload: bytes) -> np.ndarray:
    """PGM/PPM bytes → (H, W, 3) uint8 RGB (grey replicated).  P2/P3
    ASCII and P5/P6 binary; ``#`` comments; 16-bit maxval reduces to
    the high byte (big-endian sample order per the spec)."""
    data = bytes(payload)
    if data[:1] != b"P" or data[1:2] not in b"2356":
        raise ValueError("decode_pnm: not a PGM/PPM file")
    magic = data[:2].decode()
    # header tokenizer: whitespace-separated ints, # to EOL comments
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        if pos >= len(data):
            raise ValueError("decode_pnm: truncated header")
        c = data[pos]
        if c == 0x23:  # '#'
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
        elif chr(c).isspace():
            pos += 1
        elif chr(c).isdigit():
            j = pos
            while j < len(data) and chr(data[j]).isdigit():
                j += 1
            vals.append(int(data[pos:j]))
            pos = j
        else:
            raise ValueError("decode_pnm: bad header token")
    w, h, maxval = vals
    if maxval <= 0 or maxval > 65535:
        raise ValueError("decode_pnm: bad maxval")
    ch = 3 if magic in ("P3", "P6") else 1
    n = w * h * ch
    if magic in ("P2", "P3"):
        toks = data[pos:].split()
        if len(toks) < n:
            raise ValueError("decode_pnm: truncated ASCII samples")
        a = np.array(toks[:n], dtype=np.int64)
    else:
        pos += 1  # single whitespace after maxval
        if maxval > 255:
            raw = np.frombuffer(data, ">u2", n, pos).astype(np.int64)
        else:
            raw = np.frombuffer(data, np.uint8, n, pos).astype(np.int64)
        a = raw
    if (a < 0).any() or (a > maxval).any():
        raise ValueError("decode_pnm: sample exceeds maxval")
    if maxval > 255:
        a = a >> 8
    elif maxval != 255:
        a = a * 255 // maxval
    img = a.astype(np.uint8).reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img


# ---------------------------------------------------------------------
# TIFF (uncompressed baseline)

_TIFF_TYPES = {3: ("H", 2), 4: ("I", 4)}  # SHORT, LONG


def encode_tiff(img: np.ndarray, big_endian: bool = False) -> bytes:
    """(H, W) grey or (H, W, 3) RGB uint8 → single-strip uncompressed
    baseline TIFF in either byte order."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    grey = a.ndim == 2
    if not grey and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_tiff: need (H, W) grey or (H, W, 3) RGB")
    h, w = a.shape[:2]
    spp = 1 if grey else 3
    e = ">" if big_endian else "<"
    pix = a.tobytes()
    # layout: 8-byte header | pixel data | IFD
    data_off = 8
    ifd_off = 8 + len(pix)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h),
        (258, 3, spp, 8 if spp == 1 else None),  # may need offset
        (259, 3, 1, 1),
        (262, 3, 1, 1 if grey else 2),
        (273, 4, 1, data_off),
        (277, 3, 1, spp),
        (278, 4, 1, h),
        (279, 4, 1, len(pix)),
    ]
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    packed = []
    for tag, typ, cnt, val in entries:
        if tag == 258 and spp == 3:
            off = extra_base + len(extra)
            extra += struct.pack(e + "HHH", 8, 8, 8)
            packed.append(struct.pack(e + "HHII", tag, typ, cnt, off))
        elif typ == 3:
            packed.append(
                struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
            )
        else:
            packed.append(struct.pack(e + "HHII", tag, typ, cnt, val))
    hdr = (b"MM" if big_endian else b"II") + struct.pack(
        e + "HI", 42, ifd_off
    )
    ifd = (
        struct.pack(e + "H", len(entries))
        + b"".join(packed)
        + struct.pack(e + "I", 0)
    )
    return hdr + pix + ifd + bytes(extra)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline uncompressed TIFF → (H, W, 3) uint8 RGB (grey
    replicated, white-is-zero inverted).  Both byte orders,
    multi-strip; compressed TIFFs refuse at the compression tag."""
    data = bytes(payload)
    if data[:2] not in (b"II", b"MM") or len(data) < 8:
        raise ValueError("decode_tiff: not a TIFF file")
    e = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(e + "HI", data, 2)
    if magic != 42:
        raise ValueError("decode_tiff: bad TIFF magic")
    if ifd_off + 2 > len(data):
        raise ValueError("decode_tiff: truncated IFD")
    (n,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(data):
            raise ValueError("decode_tiff: truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, off)
        if typ not in _TIFF_TYPES:
            continue  # RATIONAL resolutions etc. — not needed
        fmt, sz = _TIFF_TYPES[typ]
        if cnt * sz <= 4:
            vals = list(
                struct.unpack_from(e + fmt * cnt, data, off + 8)
            )
        else:
            (voff,) = struct.unpack_from(e + "I", data, off + 8)
            if voff + cnt * sz > len(data):
                raise ValueError("decode_tiff: truncated tag values")
            vals = list(struct.unpack_from(e + fmt * cnt, data, voff))
        tags[tag] = vals
    try:
        w, h = tags[256][0], tags[257][0]
        strip_offs = tags[273]
        strip_lens = tags[279]
    except KeyError as k:
        raise ValueError(f"decode_tiff: missing required tag {k}")
    comp = tags.get(259, [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"decode_tiff: compression {comp} not supported (uncompressed"
            " only — LZW/JPEG/deflate TIFFs need an image library)"
        )
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError(
            f"decode_tiff: bits={bits} spp={spp} not supported"
            " (8-bit grey/RGB)"
        )
    photo = tags.get(262, [1])[0]
    buf = bytearray()
    for so, sl in zip(strip_offs, strip_lens):
        if so + sl > len(data):
            raise ValueError("decode_tiff: truncated strip")
        buf += data[so : so + sl]
    need = w * h * spp
    if len(buf) < need:
        raise ValueError("decode_tiff: strip data smaller than image")
    a = np.frombuffer(bytes(buf), np.uint8, need).reshape(h, w, spp)
    if spp == 1:
        if photo == 0:  # white-is-zero
            a = 255 - a
        return np.repeat(a, 3, axis=2)
    if photo != 2:
        raise NotImplementedError(
            f"decode_tiff: photometric {photo} with RGB samples"
        )
    return a.copy()
