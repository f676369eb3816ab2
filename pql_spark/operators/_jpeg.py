"""Pure-stdlib baseline JPEG codec (struct + numpy).

The image twin of ``_png.py``/``_avi.py``: a REAL compressed bitstream
format written and read without Pillow/libjpeg, so the multimodal image
tier covers the dominant real-world format end-to-end.  Scope:

* **decode** — baseline sequential DCT (SOF0/SOF1) AND, since r15,
  Huffman progressive DCT (SOF2, the full T.81 Annex G repertoire:
  spectral selection, successive approximation for DC and AC, EOB
  runs, interleaved/non-interleaved DC scans): any number of DQT/DHT
  tables (8-bit quantizers, arbitrary canonical Huffman tables — the
  Annex K standard tables real encoders emit decode through the same
  generic DHT path, and ``default_huffman=True`` supplies them for
  DHT-less legacy MJPEG frames), component sampling factors 1-2 in
  each axis (4:4:4 / 4:2:2 / 4:2:0), greyscale or YCbCr, restart
  markers (DRI / RSTn), APPn/COM segments skipped.  Arithmetic
  coding, lossless/hierarchical modes, 12-bit precision, and 16-bit
  quantizers raise ``NotImplementedError`` at the exact bitstream
  boundary — the honest codec rule used for non-PNG images and
  compressed AVI streams.
* **encode** — baseline SOF0 with IJG-style quality scaling of the
  Annex K quantization matrices, 4:4:4 or 4:2:0 chroma subsampling,
  optional restart intervals; ``encode_jpeg_progressive`` emits SOF2
  scan scripts (per the G.4-G.7 flowcharts, EOB-run + buffered
  correction bits) whose full decode is bit-identical to the baseline
  path.  The default entropy tables are simple LEGAL canonical
  Huffman tables built here (all DC codes 4 bits, all AC codes 9
  bits — prefix-free, all-ones codeword unused) rather than a
  transcription of the Annex K defaults: any canonical table carried
  in DHT is valid JPEG, the decoder side is fully general either way,
  and a generated table cannot be mistyped.  ``tables="annex_k"``
  selects the spec's typical tables instead (with ``omit_dht=True``
  for the DHT-less legacy MJPEG frame shape).

The DCT is an exact 8×8 matrix product (float64), so
encode→decode loses only quantization: the test suite proves the
entropy layer (Huffman + byte stuffing + restart segmentation) is
BIT-EXACT by comparing the decoder's dequantized coefficients against
the encoder's quantizer output computed directly with numpy.

Reference: ITU-T T.81 (the public JPEG specification) — no
reference-repo counterpart; the reference engine has no media codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = row-major index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization matrices (row-major 8x8)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# exact 8-point DCT-II basis: D @ block @ D.T is the 2-D forward DCT
_D = np.zeros((8, 8))
for _k in range(8):
    for _x in range(8):
        _c = np.sqrt(0.5) if _k == 0 else 1.0
        _D[_k, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _k * np.pi / 16)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality → scaled (luma, chroma) quantizers, clipped 1..255."""
    q = min(max(int(quality), 1), 100)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = np.floor((base * scale + 50.0) / 100.0)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# ---------------------------------------------------------------------
# canonical Huffman tables


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical code assignment → {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} for the bit-at-a-time decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ---------------------------------------------------------------------
# ITU-T T.81 Annex K "typical" Huffman tables (Tables K.3-K.6), as
# BITS/HUFFVAL lists straight from the public spec (also reproduced in
# RFC 2435 Appendix A for RTP/JPEG).  Two uses: (a) the legacy MJPEG
# convention where AVI frames omit DHT entirely and the decoder is
# expected to supply these defaults; (b) an encoder table choice that
# produces interoperable DHT-less frames for that convention.

_K_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_LUM_VALS = list(range(12))
_K_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_K_DC_CHR_VALS = list(range(12))
_K_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_K_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_K_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
# the four (BITS, HUFFVAL) pairs keyed like DHT (tc, th): luminance is
# destination 0, chrominance destination 1 — the assignment every
# Annex-K-convention encoder (and our SOS emission) uses
_ANNEX_K_SPECS = {
    (0, 0): (_K_DC_LUM_BITS, _K_DC_LUM_VALS),
    (0, 1): (_K_DC_CHR_BITS, _K_DC_CHR_VALS),
    (1, 0): (_K_AC_LUM_BITS, _K_AC_LUM_VALS),
    (1, 1): (_K_AC_CHR_BITS, _K_AC_CHR_VALS),
}
_ANNEX_K_DEC = {
    key: _decode_table(bits, vals)
    for key, (bits, vals) in _ANNEX_K_SPECS.items()
}
_ANNEX_K_ENC = {
    key: _canonical_codes(bits, vals)
    for key, (bits, vals) in _ANNEX_K_SPECS.items()
}


# encoder-side tables: every DC symbol (category 0..11) gets a 4-bit
# code, every AC symbol (16 runs x 10 sizes + EOB + ZRL = 162) a 9-bit
# code.  Canonical, prefix-free, and the all-ones codeword of each
# length is unused (12 <= 15, 162 <= 511) — legal per T.81.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_CODES = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC_CODES = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


# ---------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill to byte boundary


# peek-table machinery (r15, guide §4.2 per-task work): decoding one
# Huffman symbol with the scalar reader below costs up to 16 read_bit
# calls plus 16 dict probes; with a 2^16 peek table it is one windowed
# 16-bit peek plus two list lookups.  Codes are canonical (prefix-free),
# so every 16-bit word has at most one code as a prefix — the table
# maps each word to that code's (symbol, length), 0-length = no match.
# Tables are cached by CONTENT (same DHT bytes across a corpus build
# the table once per process) and memoized inside the decode dict under
# a reserved key a (length, code) 2-tuple can never collide with.
_PEEK_KEY = ("peek16",)
_PEEK_CACHE: dict[tuple, tuple[list[int], list[int]]] = {}


def _peek_tables(
    table: dict[tuple[int, int], int],
) -> tuple[list[int], list[int]]:
    pk = table.get(_PEEK_KEY)
    if pk is not None:
        return pk
    items = tuple(sorted(
        (k, v) for k, v in table.items() if k != _PEEK_KEY
    ))
    pk = _PEEK_CACHE.get(items)
    if pk is None:
        sym_a = np.zeros(65536, dtype=np.int32)
        len_a = np.zeros(65536, dtype=np.int32)
        for (length, code), sym in items:
            start = code << (16 - length)
            span = 1 << (16 - length)
            sym_a[start : start + span] = sym
            len_a[start : start + span] = length
        pk = (sym_a.tolist(), len_a.tolist())
        if len(_PEEK_CACHE) >= 16:  # bound worker memory on odd corpora
            _PEEK_CACHE.clear()
        _PEEK_CACHE[items] = pk
    table[_PEEK_KEY] = pk  # type: ignore[assignment]
    return pk


class _BitReader:
    """Reads one entropy-coded segment (already de-stuffed).

    Bit-position cursor over precomputed 32-bit byte windows: any
    16-bit peek is one list index plus a shift, so `huff` is O(1) per
    symbol instead of O(code length) read_bit calls.  Behaviour
    (values, consumed positions, and every ValueError) is bit-exact
    with `_BitReaderScalar`, the r14 reference kept below — fuzz-proved
    in tests/test_jpeg.py."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.nbits = 8 * len(data)
        self.bitpos = 0
        pad = np.zeros(len(data) + 4, dtype=np.uint8)
        pad[: len(data)] = np.frombuffer(data, dtype=np.uint8)
        # w[i] = bytes i..i+3 big-endian (zero-padded tail); exhaustion
        # checks stop any read before fabricated pad bits are consumed
        self._w = (
            (pad[:-3].astype(np.uint32) << 24)
            | (pad[1:-2].astype(np.uint32) << 16)
            | (pad[2:-1].astype(np.uint32) << 8)
            | pad[3:].astype(np.uint32)
        ).tolist()

    def read_bit(self) -> int:
        p = self.bitpos
        if p >= self.nbits:
            raise ValueError("decode_jpeg: entropy data exhausted")
        self.bitpos = p + 1
        return (self._w[p >> 3] >> (31 - (p & 7))) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if n > 16:  # not reachable from T.81 scans; keep the general path
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read_bit()
            return v
        p = self.bitpos
        if p + n > self.nbits:
            raise ValueError("decode_jpeg: entropy data exhausted")
        self.bitpos = p + n
        return (
            (self._w[p >> 3] >> (16 - (p & 7))) & 0xFFFF
        ) >> (16 - n)

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        syms, lens = _peek_tables(table)
        p = self.bitpos
        pk = (self._w[p >> 3] >> (16 - (p & 7))) & 0xFFFF
        ln = lens[pk]
        if ln and p + ln <= self.nbits:
            self.bitpos = p + ln
            return syms[pk]
        self._huff_fail(ln)

    def _huff_fail(self, ln: int) -> None:
        # scalar-walk failure modes: no match within 16 REAL bits →
        # invalid; bits ran out before a match could complete →
        # exhausted.  (Prefix-freedom: a match of length ≤ remaining
        # depends only on real bits, so zero padding can neither hide
        # nor fabricate one.)
        if ln == 0 and self.nbits - self.bitpos >= 16:
            raise ValueError("decode_jpeg: invalid Huffman code in scan")
        raise ValueError("decode_jpeg: entropy data exhausted")

    def decode_block(
        self,
        dc_syms: list[int],
        dc_lens: list[int],
        ac_syms: list[int],
        ac_lens: list[int],
    ) -> tuple[int, list[int]]:
        """One baseline block's entropy data → (DC diff, 64 zigzag
        coefficients, zz[0] left 0 for the caller's predictor).  The
        fused huff+receive+EXTEND loop over local variables replaces
        ~50 method calls per block; values and error behaviour match
        the huff/receive composition exactly (same checks, same
        order, same messages)."""
        w = self._w
        nbits = self.nbits
        p = self.bitpos
        pk = (w[p >> 3] >> (16 - (p & 7))) & 0xFFFF
        ln = dc_lens[pk]
        if not ln or p + ln > nbits:
            self.bitpos = p
            self._huff_fail(ln)
        p += ln
        size = dc_syms[pk]
        if size > 11:
            self.bitpos = p
            raise ValueError("decode_jpeg: bad DC category")
        if size:
            if p + size > nbits:
                self.bitpos = p
                raise ValueError("decode_jpeg: entropy data exhausted")
            v = ((w[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - size)
            p += size
            diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
        else:
            diff = 0
        zz = [0] * 64
        k = 1
        while k < 64:
            pk = (w[p >> 3] >> (16 - (p & 7))) & 0xFFFF
            ln = ac_lens[pk]
            if not ln or p + ln > nbits:
                self.bitpos = p
                self._huff_fail(ln)
            p += ln
            rs = ac_syms[pk]
            sz = rs & 0xF
            if sz == 0:
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += rs >> 4
            if k > 63:
                self.bitpos = p
                raise ValueError("decode_jpeg: AC run overflows block")
            if p + sz > nbits:
                self.bitpos = p
                raise ValueError("decode_jpeg: entropy data exhausted")
            v = ((w[p >> 3] >> (16 - (p & 7))) & 0xFFFF) >> (16 - sz)
            p += sz
            zz[k] = v if v >= (1 << (sz - 1)) else v - (1 << sz) + 1
            k += 1
        self.bitpos = p
        return diff, zz


class _BitReaderScalar:
    """Bit-at-a-time reference reader (the r14 implementation) — the
    behavioural spec for `_BitReader`; the fuzz suite drives both with
    identical op sequences and asserts identical values, positions,
    and exceptions."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("decode_jpeg: entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("decode_jpeg: invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a SIZE-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------
# encoder


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (H/8 * W/8, 8, 8) row-major blocks (H, W multiples of 8)."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def quantized_planes(
    img: np.ndarray, quality: int = 90, subsample: str = "420"
) -> tuple[list[np.ndarray], list[tuple[int, int]], list[np.ndarray]]:
    """The encoder's coefficient pipeline, exposed for the bit-exact
    entropy-roundtrip test: → (per-component quantized coefficient
    block arrays (N, 8, 8) int32 in MCU-interleaved order is NOT
    applied here — blocks are plane-raster), (h, v) factors, quant
    tables used."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg: need (H, W) grey or (H, W, 3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError("encode_jpeg: subsample must be '444' or '420'")
    ycc = _rgb_to_ycbcr(np.asarray(img, dtype=np.uint8))
    qt_l, qt_c = _quality_tables(quality)
    if subsample == "420":
        factors = [(2, 2), (1, 1), (1, 1)]
        y = _pad_edge(ycc[..., 0], 16, 16)
        cb = _pad_edge(ycc[..., 1], 16, 16)
        cr = _pad_edge(ycc[..., 2], 16, 16)
        # 2x2 box mean subsample
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        planes = [y, cb, cr]
    else:
        factors = [(1, 1), (1, 1), (1, 1)]
        planes = [_pad_edge(ycc[..., i], 8, 8) for i in range(3)]
    out = []
    qts = [qt_l, qt_c, qt_c]
    for plane, qt in zip(planes, qts):
        blocks = _blockify(plane - 128.0)
        coef = np.einsum("ky,nyx,xl->nkl", _D, blocks, _D.T)
        out.append(np.round(coef / qt).astype(np.int32))
    return out, factors, [qt_l.astype(np.int32), qt_c.astype(np.int32)]


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    w.put(code, length)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        w.put(c, ln)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.put(c, ln)
    return dc


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "420",
    restart_interval: int = 0,
    tables: str = "fast",
    omit_dht: bool = False,
) -> bytes:
    """uint8 (H, W) grey or (H, W, 3) RGB → baseline JFIF JPEG bytes.

    ``tables="fast"`` (default) entropy-codes with the generated
    simple tables below; ``tables="annex_k"`` uses the T.81 Annex K
    typical tables (luminance destination 0, chrominance 1).
    ``omit_dht=True`` (requires ``tables="annex_k"``) drops the DHT
    segments entirely — the legacy MJPEG frame shape that
    ``decode_jpeg(default_huffman=True)`` reads back."""
    if tables not in ("fast", "annex_k"):
        raise ValueError(f"encode_jpeg: unknown tables={tables!r}")
    if omit_dht and tables != "annex_k":
        raise ValueError(
            "encode_jpeg: omit_dht requires tables='annex_k' — a"
            " DHT-less frame is only decodable via the Annex K"
            " default-table convention"
        )
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    comps, factors, qts = quantized_planes(img, quality, subsample)
    max_h = max(f[0] for f in factors)
    max_v = max(f[1] for f in factors)
    mcu_cols = -(-w // (8 * max_h))
    mcu_rows = -(-h // (8 * max_v))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qts):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([tid]) + zz)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (fh, fv) in zip((1, 2, 3), factors):
        sof += bytes([cid, (fh << 4) | fv, 0 if cid == 1 else 1])
    out += seg(0xC0, sof)
    if tables == "annex_k":
        dht_specs = [
            ((tc << 4) | th, bits, vals)
            for (tc, th), (bits, vals) in sorted(_ANNEX_K_SPECS.items())
        ]
        # per-component code dicts follow the SOS destinations below:
        # cid 1 (luminance) → tables 0, cids 2-3 (chroma) → tables 1
        comp_codes = [
            (_ANNEX_K_ENC[(0, 0)], _ANNEX_K_ENC[(1, 0)]),
            (_ANNEX_K_ENC[(0, 1)], _ANNEX_K_ENC[(1, 1)]),
            (_ANNEX_K_ENC[(0, 1)], _ANNEX_K_ENC[(1, 1)]),
        ]
    else:
        dht_specs = [
            (0x00, _ENC_DC_BITS, _ENC_DC_VALS),
            (0x10, _ENC_AC_BITS, _ENC_AC_VALS),
            (0x01, _ENC_DC_BITS, _ENC_DC_VALS),
            (0x11, _ENC_AC_BITS, _ENC_AC_VALS),
        ]
        comp_codes = [(_ENC_DC_CODES, _ENC_AC_CODES)] * 3
    if not omit_dht:
        for tc_th, bits, vals in dht_specs:
            out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    out += _encode_scan(
        comps, factors, mcu_rows, mcu_cols, comp_codes, restart_interval
    )
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_scan_scalar(
    comps: list[np.ndarray],
    factors: list[tuple[int, int]],
    mcu_rows: int,
    mcu_cols: int,
    comp_codes: list[tuple[dict, dict]],
    restart_interval: int,
) -> bytes:
    """Per-block reference entropy coder (the r14 implementation) —
    the behavioural spec for the vectorized `_encode_scan`; the fuzz
    suite asserts byte-identical output over sizes / content /
    quality / subsampling / restart intervals / table sets."""
    # plane-raster block index → per-MCU interleaved emission: the
    # planes are padded to the MCU multiple, so each plane's block
    # grid is exactly (mcu_rows·fv) × (mcu_cols·fh)
    widths = [mcu_cols * fh for fh, _fv in factors]
    out = bytearray()
    writer = _BitWriter()
    preds = [0, 0, 0]
    mcus_done = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for ci, (coef, (fh, fv)) in enumerate(zip(comps, factors)):
                for by in range(fv):
                    for bx in range(fh):
                        row = my * fv + by
                        col = mx * fh + bx
                        idx = row * widths[ci] + col
                        zz = coef[idx].reshape(-1)[ZIGZAG]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], *comp_codes[ci]
                        )
            mcus_done += 1
    writer.flush()
    out += writer.out
    return bytes(out)


_CODE_ARR_KEY = ("codearr",)
_POW2_17 = (1 << np.arange(17)).astype(np.int64)


def _code_arrays(codes: dict, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(code, length) dict → dense lookup arrays, memoized inside the
    dict under a tuple key an int symbol can never collide with (the
    `_PEEK_KEY` pattern on the decode side)."""
    pk = codes.get(_CODE_ARR_KEY)
    if pk is not None:
        return pk
    vals = np.zeros(n, dtype=np.int64)
    lens = np.zeros(n, dtype=np.int64)
    for sym, (code, length) in codes.items():
        if sym == _CODE_ARR_KEY:
            continue
        vals[sym] = code
        lens[sym] = length
    codes[_CODE_ARR_KEY] = (vals, lens)  # type: ignore[assignment]
    return vals, lens


def _encode_scan(
    comps: list[np.ndarray],
    factors: list[tuple[int, int]],
    mcu_rows: int,
    mcu_cols: int,
    comp_codes: list[tuple[dict, dict]],
    restart_interval: int,
) -> bytes:
    """Vectorized baseline entropy coder (r15, guide §4.2 per-task
    work): the scalar loop above costs ~4 Python calls per nonzero
    coefficient; here every block's symbols are generated with numpy
    (runs via nonzero-gap arithmetic, categories via one searchsorted)
    and the whole scan is bit-packed in one disjoint-bits scatter-add.
    Output is byte-identical to `_encode_scan_scalar` — same emission
    order, per-restart-chunk predictor resets, 1-fill padding, byte
    stuffing, and RSTn rotation (differential fuzz in
    tests/test_jpeg.py)."""
    bpm = sum(fh * fv for fh, fv in factors)
    widths = [mcu_cols * fh for fh, _fv in factors]
    n_mcus = mcu_rows * mcu_cols
    ntot = n_mcus * bpm
    # blocks in emission order: MCU-major, then component, then the
    # fv×fh raster inside the MCU
    ZZ = np.empty((ntot, 64), dtype=np.int64)
    CI = np.empty(ntot, dtype=np.int64)
    off = 0
    for ci, (coef, (fh, fv)) in enumerate(zip(comps, factors)):
        my = np.arange(mcu_rows)[:, None, None, None]
        mx = np.arange(mcu_cols)[None, :, None, None]
        by = np.arange(fv)[None, None, :, None]
        bx = np.arange(fh)[None, None, None, :]
        e = np.broadcast_to(
            (my * mcu_cols + mx) * bpm + off + by * fh + bx,
            (mcu_rows, mcu_cols, fv, fh),
        ).ravel()
        src = np.broadcast_to(
            (my * fv + by) * widths[ci] + (mx * fh + bx),
            (mcu_rows, mcu_cols, fv, fh),
        ).ravel()
        ZZ[e] = coef.reshape(-1, 64)[:, ZIGZAG][src]
        CI[e] = ci
        off += fh * fv
    if restart_interval:
        chunk = (np.arange(ntot) // bpm) // restart_interval
        n_chunks = int(chunk[-1]) + 1
    else:
        chunk = np.zeros(ntot, dtype=np.int64)
        n_chunks = 1

    # DC diffs along each (component, restart-chunk) predictor chain
    dc = ZZ[:, 0]
    diff = np.empty(ntot, dtype=np.int64)
    for ci in range(len(comps)):
        m = CI == ci
        dci = dc[m]
        chk = chunk[m]
        prev = np.concatenate([[0], dci[:-1]])
        new_chunk = np.concatenate([[True], chk[1:] != chk[:-1]])
        diff[m] = dci - np.where(new_chunk, 0, prev)
    dc_size = np.searchsorted(_POW2_17, np.abs(diff), side="right")
    if int(dc_size.max(initial=0)) > 11:
        raise ValueError("encode_jpeg: DC difference out of range")
    dc_mag = np.where(diff >= 0, diff, diff + (1 << dc_size) - 1)

    dcv, dcl, acv, acl = [], [], [], []
    for dcd, acd in comp_codes:
        v, ln = _code_arrays(dcd, 16)
        dcv.append(v)
        dcl.append(ln)
        v, ln = _code_arrays(acd, 256)
        acv.append(v)
        acl.append(ln)
    dcv = np.stack(dcv)
    dcl = np.stack(dcl)
    acv = np.stack(acv)
    acl = np.stack(acl)

    # AC runs: gaps between consecutive nonzeros inside a block; a gap
    # g emits g>>4 ZRLs then symbol ((g&15)<<4)|size — exactly the
    # scalar `while run > 15` loop
    acz = ZZ[:, 1:]
    mask = acz != 0
    any_nz = mask.any(axis=1)
    last_nz = np.where(any_nz, 63 - np.argmax(mask[:, ::-1], axis=1), 0)
    bi, kk = np.nonzero(mask)
    k = kk + 1
    if len(bi):
        first = np.concatenate([[True], bi[1:] != bi[:-1]])
        prev_k = np.where(first, 0, np.concatenate([[0], k[:-1]]))
        run = k - prev_k - 1
        zrl = run >> 4
        rem = run & 15
        v = acz[bi, kk]
        ac_size = np.searchsorted(_POW2_17, np.abs(v), side="right")
        sym = (rem << 4) | ac_size
        ci_nz = CI[bi]
        if (acl[ci_nz, sym] == 0).any():
            raise ValueError("encode_jpeg: AC (run, size) not in table")
        ac_mag = np.where(v >= 0, v, v + (1 << ac_size) - 1)

    # emission entries, ordered by key = block·400 + inner position
    # (inner: DC code 0, DC mag 1, nz at k: ZRLs k·6+j, code k·6+4,
    # mag k·6+5, EOB 390, per-chunk flush padding 399 on the chunk's
    # last block) — blocks are chunk-monotone, so ONE stable argsort
    # yields chunk-major packing order
    parts_v, parts_l, parts_key = [], [], []
    e_all = np.arange(ntot, dtype=np.int64)
    parts_v.append(dcv[CI, dc_size])
    parts_l.append(dcl[CI, dc_size])
    parts_key.append(e_all * 400)
    m = dc_size > 0
    parts_v.append(dc_mag[m])
    parts_l.append(dc_size[m])
    parts_key.append(e_all[m] * 400 + 1)
    if len(bi):
        tz = int(zrl.sum())
        if tz:
            rep = np.repeat(np.arange(len(bi)), zrl)
            j = np.arange(tz) - np.repeat(np.cumsum(zrl) - zrl, zrl)
            parts_v.append(acv[ci_nz[rep], 0xF0])
            parts_l.append(acl[ci_nz[rep], 0xF0])
            parts_key.append(bi[rep] * 400 + k[rep] * 6 + j)
        parts_v.append(acv[ci_nz, sym])
        parts_l.append(acl[ci_nz, sym])
        parts_key.append(bi * 400 + k * 6 + 4)
        parts_v.append(ac_mag)
        parts_l.append(ac_size)
        parts_key.append(bi * 400 + k * 6 + 5)
    meob = last_nz < 63
    parts_v.append(acv[CI[meob], 0x00])
    parts_l.append(acl[CI[meob], 0x00])
    parts_key.append(e_all[meob] * 400 + 390)

    vals = np.concatenate(parts_v)
    lens = np.concatenate(parts_l)
    keys = np.concatenate(parts_key)
    order = np.argsort(keys, kind="stable")
    vals = vals[order]
    lens = lens[order]
    entry_chunk = chunk[keys[order] // 400]

    # per-chunk 1-fill padding to a byte boundary (writer.flush)
    chunk_bits = np.bincount(
        entry_chunk, weights=lens, minlength=n_chunks
    ).astype(np.int64)
    pad = (-chunk_bits) % 8
    vals = np.concatenate([vals, (1 << pad) - 1])
    lens = np.concatenate([lens, pad])
    entry_chunk = np.concatenate(
        [entry_chunk, np.arange(n_chunks, dtype=np.int64)]
    )
    order2 = np.argsort(entry_chunk, kind="stable")
    vals = vals[order2]
    lens = lens[order2]
    entry_chunk = entry_chunk[order2]

    chunk_bits = chunk_bits + pad
    chunk_bytes = chunk_bits >> 3
    chunk_byte_start = np.concatenate([[0], np.cumsum(chunk_bytes)[:-1]])
    total_bytes = int(chunk_bytes.sum())

    # disjoint-bits scatter-add: each ≤16-bit entry lands in a 32-bit
    # window at its bit offset; bit positions never overlap, so adds
    # never carry
    per_chunk_start = np.concatenate([[0], np.cumsum(chunk_bits)[:-1]])
    boff = np.cumsum(lens) - lens - per_chunk_start[entry_chunk]
    bytepos = chunk_byte_start[entry_chunk] + (boff >> 3)
    w = (vals & ((1 << lens) - 1)) << (32 - lens - (boff & 7))
    buf = np.zeros(total_bytes + 4, dtype=np.int64)
    np.add.at(buf, bytepos, (w >> 24) & 0xFF)
    np.add.at(buf, bytepos + 1, (w >> 16) & 0xFF)
    np.add.at(buf, bytepos + 2, (w >> 8) & 0xFF)
    np.add.at(buf, bytepos + 3, w & 0xFF)
    buf = buf[:total_bytes].astype(np.uint8)

    # byte stuffing (FF → FF 00) per chunk; RSTn between chunks
    out = bytearray()
    for c in range(n_chunks):
        if c:
            out += bytes([0xFF, 0xD0 + ((c - 1) % 8)])
        s = buf[chunk_byte_start[c] : chunk_byte_start[c] + chunk_bytes[c]]
        ff = s == 0xFF
        if ff.any():
            counts = 1 + ff.astype(np.int64)
            pos = np.cumsum(counts) - counts
            stuffed = np.zeros(int(counts.sum()), dtype=np.uint8)
            stuffed[pos] = s
            out += stuffed.tobytes()
        else:
            out += s.tobytes()
    return bytes(out)


# ---------------------------------------------------------------------
# decoder


def _split_scan(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``pos`` → de-stuffed segments split at
    RSTn markers, plus the offset of the terminating marker."""
    segs: list[bytearray] = [bytearray()]
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart
            segs.append(bytearray())
            i += 2
        else:  # real marker: end of scan
            break
    return [bytes(s) for s in segs], i


def decode_jpeg_quantized(payload: bytes) -> dict[int, np.ndarray]:
    """Test hook: → {component_id: (rows, cols, 8, 8) int32 QUANTIZED
    coefficient blocks in natural (de-zigzagged) order}, exactly as
    parsed from the entropy-coded scan — proves the Huffman + byte
    stuffing + restart layers are bit-exact against the encoder's
    quantizer output (``quantized_planes``)."""
    return decode_jpeg(payload, _return_quantized=True)


def decode_jpeg(
    payload: bytes,
    _return_quantized: bool = False,
    default_huffman: bool = False,
) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) uint8 RGB (grey replicated).

    ``default_huffman=True`` supplies the T.81 Annex K typical tables
    for any Huffman destination a scan references without a preceding
    DHT — the legacy MJPEG convention (RFC 2435 Appendix A) where AVI
    frames ship entropy data only.  Standalone JFIF decoding stays
    strict (missing DHT is a ``ValueError``) so malformed files are
    not silently guessed at."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, comps = [(cid, fh, fv, tq)])
    restart_interval = 0
    result_planes: dict[int, np.ndarray] = {}
    comp_scan: list[tuple] = []
    progressive = False
    prog_coefs: dict[int, np.ndarray] | None = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"decode_jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError(
                        "decode_jpeg: 16-bit quantization tables are"
                        " not supported (baseline is 8-bit)"
                    )
                t = np.zeros(64, dtype=np.float64)
                t[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                )
                qts[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huffs[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / prog
            progressive = marker == 0xC2
            prec, fh_, fw_, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"decode_jpeg: {prec}-bit precision not supported"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                fh, fv = hv >> 4, hv & 0xF
                if not (1 <= fh <= 2 and 1 <= fv <= 2):
                    raise NotImplementedError(
                        f"decode_jpeg: sampling factor {fh}x{fv} not"
                        " supported (1-2 each axis)"
                    )
                comps.append((cid, fh, fv, tq))
            frame = (fh_, fw_, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "decode_jpeg: only baseline sequential (SOF0/SOF1) and"
                " progressive (SOF2) Huffman DCT are supported (got"
                f" SOF marker 0x{marker:02X} — arithmetic coding,"
                " lossless, and hierarchical modes need libjpeg,"
                " unavailable in this environment)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("decode_jpeg: SOS before SOF")
            ns = body[0]
            comp_scan = []
            by_id = {c[0]: c for c in frame[2]}
            for s in range(ns):
                cid, tabs = body[1 + 2 * s], body[2 + 2 * s]
                cid_, fh, fv, tq = by_id[cid]
                comp_scan.append(
                    (cid, fh, fv, tq, tabs >> 4, tabs & 0xF)
                )
            segs, pos = _split_scan(data, pos)
            if progressive:
                ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
                approx = body[3 + 2 * ns]
                if prog_coefs is None:
                    prog_coefs = _init_prog_coefs(frame)
                _decode_scan_progressive(
                    frame, comp_scan, segs, huffs, restart_interval,
                    prog_coefs, ss_, se_, approx >> 4, approx & 0xF,
                    default_huffman=default_huffman,
                )
            else:
                result_planes = _decode_scan(
                    frame, comp_scan, segs, huffs, restart_interval,
                    default_huffman=default_huffman,
                )
        # all other markers (APPn, COM): skipped via their length

    if progressive and prog_coefs is not None:
        # all scans accumulated: de-zigzag once into the (rb, cb, 8, 8)
        # natural-order block grids the shared assembly below expects
        for cid, zz_grid in prog_coefs.items():
            nat = np.zeros(zz_grid.shape, dtype=np.int32)
            nat[..., ZIGZAG] = zz_grid
            bv, bh = zz_grid.shape[:2]
            result_planes[cid] = nat.reshape(bv, bh, 8, 8)
    if frame is None or not result_planes:
        raise ValueError("decode_jpeg: no frame decoded")
    H, W, comps = frame
    if _return_quantized:
        return result_planes
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    planes = []
    for cid, fh, fv, tq in comps:
        qt = qts.get(tq)
        if qt is None:
            raise ValueError("decode_jpeg: frame references missing DQT")
        q = result_planes[cid]  # (rb, cb, 8, 8) quantized ints
        # batched dequantize + IDCT: pix[y,x] = Σ_kl D[k,y] C[k,l] D[l,x]
        pix = np.einsum(
            "ky,rckl,lx->rcyx", _D, q.astype(np.float64) * qt, _D
        )
        rb, cb = q.shape[:2]
        p = pix.transpose(0, 2, 1, 3).reshape(rb * 8, cb * 8)
        p = np.repeat(np.repeat(p, max_v // fv, axis=0), max_h // fh, axis=1)
        planes.append(p[:H, :W])
    if len(planes) == 1:
        y = np.clip(planes[0] + 128.0, 0, 255).astype(np.uint8)
        return np.stack([y] * 3, axis=-1)
    y, cb, cr = (p + 128.0 for p in planes[:3])
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(
        np.uint8
    )


def _decode_scan(
    frame, comp_scan, segs, huffs, restart_interval,
    default_huffman=False,
):
    """→ {component_id: (rows, cols, 8, 8) int32 quantized blocks in
    natural order}.  Dequantization + batched IDCT happen in the
    caller so the quantized coefficients stay observable for the
    entropy bit-exactness test."""
    H, W, _ = frame
    max_h = max(c[1] for c in comp_scan)
    max_v = max(c[2] for c in comp_scan)
    mcu_cols = -(-W // (8 * max_h))
    mcu_rows = -(-H // (8 * max_v))
    n_mcus = mcu_cols * mcu_rows
    coefs = {
        cid: np.zeros(
            (mcu_rows * fv, mcu_cols * fh, 8, 8), dtype=np.int32
        )
        for cid, fh, fv, _tq, _td, _ta in comp_scan
    }
    # r15 (guide §4.2): tables resolved ONCE per scan (not per MCU),
    # blocks decoded by the reader's fused decode_block, and the
    # zigzag permutation + placement applied to ALL blocks in one
    # vectorized pass at the end instead of 3 numpy allocations per
    # block.  Identical coefficients (entropy bit-exactness suite).
    comps = []
    for cid, fh, fv, _tq, td, ta in comp_scan:
        dc_tab = huffs.get((0, td))
        ac_tab = huffs.get((1, ta))
        if default_huffman:
            if dc_tab is None:
                dc_tab = _ANNEX_K_DEC.get((0, td))
            if ac_tab is None:
                ac_tab = _ANNEX_K_DEC.get((1, ta))
        if dc_tab is None or ac_tab is None:
            raise ValueError("decode_jpeg: scan references missing DHT")
        dc_syms, dc_lens = _peek_tables(dc_tab)
        ac_syms, ac_lens = _peek_tables(ac_tab)
        comps.append((cid, fh, fv, dc_syms, dc_lens, ac_syms, ac_lens))

    preds = {cid: 0 for cid, *_ in comp_scan}
    blocks: dict[int, list[list[int]]] = {cid: [] for cid in preds}
    rows_ix: dict[int, list[int]] = {cid: [] for cid in preds}
    cols_ix: dict[int, list[int]] = {cid: [] for cid in preds}
    seg_idx = 0
    reader = _BitReader(segs[0])
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError(
                    "decode_jpeg: missing restart segment in scan"
                )
            reader = _BitReader(segs[seg_idx])
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(m, mcu_cols)
        for cid, fh, fv, dc_syms, dc_lens, ac_syms, ac_lens in comps:
            pred = preds[cid]
            for by in range(fv):
                for bx in range(fh):
                    diff, zz = reader.decode_block(
                        dc_syms, dc_lens, ac_syms, ac_lens
                    )
                    pred += diff
                    zz[0] = pred
                    blocks[cid].append(zz)
                    rows_ix[cid].append(my * fv + by)
                    cols_ix[cid].append(mx * fh + bx)
            preds[cid] = pred
    inv = np.argsort(ZIGZAG)  # natural[j] = zigzag[inv[j]]
    for cid, blks in blocks.items():
        if blks:
            nat = np.asarray(blks, dtype=np.int64)[:, inv]
            coefs[cid][rows_ix[cid], cols_ix[cid]] = nat.reshape(-1, 8, 8)
    return coefs


# ---------------------------------------------------------------------
# progressive mode (SOF2) — ITU-T T.81 Annex G.  Scans accumulate into
# per-component zigzag-order coefficient grids; dequantization + IDCT
# run once at EOI through the same assembly path as baseline.


def _comp_block_dims(frame, fh: int, fv: int) -> tuple[int, int]:
    """Used (non-interleaved) block grid of one component: blocks over
    ceil(W·fh/max_h) × ceil(H·fv/max_v) samples (T.81 A.1.1) — may be
    smaller than the MCU-padded storage grid."""
    H, W, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    sw = -(-W * fh // max_h)
    sh = -(-H * fv // max_v)
    return -(-sh // 8), -(-sw // 8)


def _init_prog_coefs(frame) -> dict[int, np.ndarray]:
    """{cid: (bv, bh, 64) int32 zigzag-order grids}, MCU-padded."""
    H, W, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcu_cols = -(-W // (8 * max_h))
    mcu_rows = -(-H // (8 * max_v))
    return {
        cid: np.zeros((mcu_rows * fv, mcu_cols * fh, 64), dtype=np.int32)
        for cid, fh, fv, _tq in comps
    }


def _refine_nonzero(blk, k: int, reader, p1: int, m1: int) -> None:
    """One correction bit for an already-nonzero coefficient."""
    if reader.read_bit() and (int(blk[k]) & p1) == 0:
        blk[k] += p1 if blk[k] >= 0 else m1


def _decode_scan_progressive(
    frame, comp_scan, segs, huffs, restart_interval,
    coefs, ss, se, ah, al, default_huffman=False,
):
    """One progressive scan, updating ``coefs`` in place.

    Covers the full Annex G Huffman progressive repertoire: DC first
    pass (interleaved or single-component) and DC successive-
    approximation refinement (raw bits, no Huffman table), AC first
    pass with EOB runs and ZRL, AC refinement with interleaved
    correction bits, restart intervals (predictors and the EOB run
    reset per T.81 G.1.2.3)."""
    if ss == 0 and se != 0:
        raise ValueError("decode_jpeg: progressive DC scan needs Se=0")
    if ss > 0 and len(comp_scan) != 1:
        raise ValueError(
            "decode_jpeg: progressive AC scans are single-component"
        )
    if se > 63 or ss > se:
        raise ValueError("decode_jpeg: bad spectral selection")

    def resolve(tc, th):
        tab = huffs.get((tc, th))
        if tab is None and default_huffman:
            tab = _ANNEX_K_DEC.get((tc, th))
        if tab is None:
            raise ValueError("decode_jpeg: scan references missing DHT")
        return tab

    state = {
        "seg": 0,
        "reader": _BitReader(segs[0]),
        "eobrun": 0,
        "preds": {cid: 0 for cid, *_ in comp_scan},
    }

    def restart():
        state["seg"] += 1
        if state["seg"] >= len(segs):
            raise ValueError("decode_jpeg: missing restart segment in scan")
        state["reader"] = _BitReader(segs[state["seg"]])
        state["eobrun"] = 0
        for cid in state["preds"]:
            state["preds"][cid] = 0

    p1, m1 = 1 << al, -(1 << al)

    def dc_first(blk, cid, dc_tab):
        r = state["reader"]
        size = r.huff(dc_tab)
        if size > 11:
            raise ValueError("decode_jpeg: bad DC category")
        state["preds"][cid] += _extend(r.receive(size), size)
        blk[0] = state["preds"][cid] << al

    def dc_refine(blk):
        if state["reader"].read_bit():
            blk[0] |= p1

    def ac_first(blk, ac_tab):
        r_ = state["reader"]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = r_.huff(ac_tab)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << run) - 1
                if run:
                    state["eobrun"] += r_.receive(run)
                break
            k += run
            if k > se:
                raise ValueError("decode_jpeg: AC run overflows band")
            blk[k] = _extend(r_.receive(size), size) << al
            k += 1

    def ac_refine(blk, ac_tab):
        r_ = state["reader"]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = r_.huff(ac_tab)
                run, size = rs >> 4, rs & 0xF
                val = 0
                if size == 0:
                    if run != 15:
                        state["eobrun"] = 1 << run
                        if run:
                            state["eobrun"] += r_.receive(run)
                        break
                    # ZRL: pass 16 zero-history coefficients
                else:
                    if size != 1:
                        raise ValueError(
                            "decode_jpeg: bad refinement magnitude"
                        )
                    val = p1 if r_.read_bit() else m1
                while k <= se:
                    if blk[k]:
                        _refine_nonzero(blk, k, r_, p1, m1)
                    else:
                        run -= 1
                        if run < 0:
                            break
                    k += 1
                if val:
                    if k > se:
                        raise ValueError(
                            "decode_jpeg: refinement run overflows band"
                        )
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k]:
                    _refine_nonzero(blk, k, r_, p1, m1)
                k += 1
            state["eobrun"] -= 1

    if ss == 0:
        dc_tabs = {
            cid: (resolve(0, td) if ah == 0 else None)
            for cid, _fh, _fv, _tq, td, _ta in comp_scan
        }
    else:
        cid0, _fh, _fv, _tq, _td, ta0 = comp_scan[0]
        ac_tab = resolve(1, ta0)

    if ss == 0 and len(comp_scan) > 1:
        # interleaved DC scan over the MCU grid
        H, W, fcomps = frame
        max_h = max(c[1] for c in fcomps)
        max_v = max(c[2] for c in fcomps)
        mcu_cols = -(-W // (8 * max_h))
        mcu_rows = -(-H // (8 * max_v))
        for m in range(mcu_cols * mcu_rows):
            if restart_interval and m and m % restart_interval == 0:
                restart()
            my, mx = divmod(m, mcu_cols)
            for cid, fh, fv, _tq, _td, _ta in comp_scan:
                for by in range(fv):
                    for bx in range(fh):
                        blk = coefs[cid][my * fv + by, mx * fh + bx]
                        if ah == 0:
                            dc_first(blk, cid, dc_tabs[cid])
                        else:
                            dc_refine(blk)
    else:
        # non-interleaved: one component, its used block grid
        cid, fh, fv, _tq, _td, _ta = comp_scan[0]
        bh_, bw_ = _comp_block_dims(frame, fh, fv)
        for u in range(bh_ * bw_):
            if restart_interval and u and u % restart_interval == 0:
                restart()
            by, bx = divmod(u, bw_)
            blk = coefs[cid][by, bx]
            if ss == 0:
                if ah == 0:
                    dc_first(blk, cid, dc_tabs[cid])
                else:
                    dc_refine(blk)
            elif ah == 0:
                ac_first(blk, ac_tab)
            else:
                ac_refine(blk, ac_tab)


# progressive encoder AC table: the baseline 162-symbol alphabet plus
# the EOBn run symbols (n = 1..14) progressive scans emit; 176 codes
# of 9 bits — canonical, prefix-free, all-ones codeword unused
_ENC_AC_PROG_VALS = (
    [n << 4 for n in range(15)]
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_ENC_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_PROG_VALS),
                     0, 0, 0, 0, 0, 0, 0]
_ENC_AC_PROG_CODES = _canonical_codes(_ENC_AC_PROG_BITS, _ENC_AC_PROG_VALS)


def _default_prog_scans(ncomp: int) -> list[tuple]:
    """A libjpeg-style scan script: DC approximation first, split AC
    bands, successive-approximation refinements down to full
    precision — so a full decode is bit-identical to baseline."""
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([1], 1, 63, 0, 1),
        ([2], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([2], 1, 63, 1, 0),
    ]


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "420",
    restart_interval: int = 0,
    scans: list[tuple] | None = None,
) -> bytes:
    """uint8 (H, W) grey or (H, W, 3) RGB → progressive (SOF2) JPEG.

    ``scans`` is a list of ``(comp_indices, ss, se, ah, al)`` tuples
    (T.81 Annex G scan script; component indices are 0-based into the
    Y/Cb/Cr planes).  The default script takes every coefficient down
    to approximation 0, so decoding the result is bit-identical to
    decoding the baseline ``encode_jpeg`` output at the same settings
    — the roundtrip test exploits exactly that.  Emission mirrors the
    spec's flowcharts (G.4-G.7): EOB-run accumulation with buffered
    correction bits, ZRL folding, per-scan restart intervals."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    comps, factors, qts = quantized_planes(img, quality, subsample)
    if scans is None:
        scans = _default_prog_scans(3)
    max_h = max(f[0] for f in factors)
    max_v = max(f[1] for f in factors)
    mcu_cols = -(-w // (8 * max_h))
    mcu_rows = -(-h // (8 * max_v))
    # zigzag-order coefficient grids, MCU-padded (plane-raster blocks
    # of the padded plane == the padded MCU grid for 444/420)
    zz_grids = []
    for coef, (fh, fv) in zip(comps, factors):
        bv, bh = mcu_rows * fv, mcu_cols * fh
        zz_grids.append(
            coef.reshape(bv * bh, 64)[:, ZIGZAG].reshape(bv, bh, 64)
        )

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qts):
        z = qt.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([tid]) + z)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (fh, fv) in zip((1, 2, 3), factors):
        sof += bytes([cid, (fh << 4) | fv, 0 if cid == 1 else 1])
    out += seg(0xC2, sof)
    out += seg(0xC4, b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += seg(
        0xC4,
        b"\x10" + bytes(_ENC_AC_PROG_BITS) + bytes(_ENC_AC_PROG_VALS),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    fhv = {ci: factors[ci] for ci in range(3)}
    used_dims = []
    for ci in range(3):
        fh, fv = fhv[ci]
        sw = -(-w * fh // max_h)
        sh = -(-h * fv // max_v)
        used_dims.append((-(-sh // 8), -(-sw // 8)))

    for comp_idx, ss, se, ah, al in scans:
        ns = len(comp_idx)
        if ss == 0 and se != 0:
            raise ValueError("encode_jpeg_progressive: DC scan needs Se=0")
        if ss > 0 and ns != 1:
            raise ValueError(
                "encode_jpeg_progressive: AC scans are single-component"
            )
        sos = bytes([ns])
        for ci in comp_idx:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)

        wtr = _BitWriter()
        ebr = {"n": 0, "bits": []}
        preds = {ci: 0 for ci in comp_idx}
        rst = {"i": 0}

        def emit_sym(sym):
            code, length = _ENC_AC_PROG_CODES[sym]
            wtr.put(code, length)

        def flush_eobrun():
            if ebr["n"] > 0:
                nb = ebr["n"].bit_length() - 1
                emit_sym(nb << 4)
                if nb:
                    wtr.put(ebr["n"] - (1 << nb), nb)
                for b in ebr["bits"]:
                    wtr.put(b, 1)
                ebr["n"] = 0
                ebr["bits"] = []

        def restart_boundary():
            nonlocal wtr
            flush_eobrun()
            wtr.flush()
            out.extend(wtr.out)
            out.extend(bytes([0xFF, 0xD0 + rst["i"]]))
            rst["i"] = (rst["i"] + 1) % 8
            wtr = _BitWriter()
            for ci in preds:
                preds[ci] = 0

        def enc_dc_first(blkzz, ci):
            v = int(blkzz[0]) >> al
            diff = v - preds[ci]
            preds[ci] = v
            size = _category(diff)
            code, length = _ENC_DC_CODES[size]
            wtr.put(code, length)
            if size:
                wtr.put(
                    diff if diff >= 0 else diff + (1 << size) - 1, size
                )

        def enc_dc_refine(blkzz):
            wtr.put((int(blkzz[0]) >> al) & 1, 1)

        def enc_ac_first(blkzz):
            r = 0
            for k in range(ss, se + 1):
                t = int(blkzz[k])
                t = (t >> al) if t >= 0 else -((-t) >> al)
                if t == 0:
                    r += 1
                    continue
                flush_eobrun()
                while r > 15:
                    emit_sym(0xF0)
                    r -= 16
                size = _category(t)
                emit_sym((r << 4) | size)
                wtr.put(t if t >= 0 else t + (1 << size) - 1, size)
                r = 0
            if r > 0:
                ebr["n"] += 1
                if ebr["n"] == 0x7FFF:
                    flush_eobrun()

        def enc_ac_refine(blkzz):
            absv = [abs(int(blkzz[k])) >> al for k in range(ss, se + 1)]
            eob_pos = ss - 1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob_pos = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                temp = absv[k - ss]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_pos:
                    flush_eobrun()
                    emit_sym(0xF0)
                    r -= 16
                    for b in br:
                        wtr.put(b, 1)
                    br = []
                if temp > 1:
                    br.append(temp & 1)
                    continue
                flush_eobrun()
                emit_sym((r << 4) | 1)
                r = 0
                wtr.put(1 if int(blkzz[k]) >= 0 else 0, 1)
                for b in br:
                    wtr.put(b, 1)
                br = []
            if r > 0 or br:
                ebr["n"] += 1
                ebr["bits"].extend(br)
                if ebr["n"] == 0x7FFF:
                    flush_eobrun()

        def enc_block(blkzz, ci):
            if ss == 0:
                if ah == 0:
                    enc_dc_first(blkzz, ci)
                else:
                    enc_dc_refine(blkzz)
            elif ah == 0:
                enc_ac_first(blkzz)
            else:
                enc_ac_refine(blkzz)

        if ss == 0 and ns > 1:
            for m in range(mcu_rows * mcu_cols):
                if restart_interval and m and m % restart_interval == 0:
                    restart_boundary()
                my, mx = divmod(m, mcu_cols)
                for ci in comp_idx:
                    fh, fv = fhv[ci]
                    for by in range(fv):
                        for bx in range(fh):
                            enc_block(
                                zz_grids[ci][my * fv + by, mx * fh + bx],
                                ci,
                            )
        else:
            ci = comp_idx[0]
            bh_, bw_ = used_dims[ci]
            for u in range(bh_ * bw_):
                if restart_interval and u and u % restart_interval == 0:
                    restart_boundary()
                by, bx = divmod(u, bw_)
                enc_block(zz_grids[ci][by, bx], ci)

        flush_eobrun()
        wtr.flush()
        out.extend(wtr.out)
    out += b"\xff\xd9"
    return bytes(out)
