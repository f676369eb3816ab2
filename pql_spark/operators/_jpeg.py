"""Pure-stdlib baseline JPEG codec (struct + numpy).

The image twin of ``_png.py``/``_avi.py``: a REAL compressed bitstream
format written and read without Pillow/libjpeg, so the multimodal image
tier covers the dominant real-world format end-to-end.  Scope:

* **decode** — baseline sequential DCT (SOF0): any number of DQT/DHT
  tables (8-bit quantizers, arbitrary canonical Huffman tables — the
  Annex K standard tables real encoders emit decode through the same
  generic DHT path), component sampling factors 1-2 in each axis
  (4:4:4 / 4:2:2 / 4:2:0), greyscale or YCbCr, restart markers (DRI /
  RSTn), APPn/COM segments skipped.  Progressive (SOF2), arithmetic
  coding, 12-bit precision, and 16-bit quantizers raise
  ``NotImplementedError`` at the exact bitstream boundary — the honest
  codec rule used for non-PNG images and compressed AVI streams.
* **encode** — baseline SOF0 with IJG-style quality scaling of the
  Annex K quantization matrices, 4:4:4 or 4:2:0 chroma subsampling,
  optional restart intervals.  The entropy tables are simple LEGAL
  canonical Huffman tables built here (all DC codes 4 bits, all AC
  codes 9 bits — prefix-free, all-ones codeword unused) rather than a
  transcription of the Annex K defaults: any canonical table carried
  in DHT is valid JPEG, the decoder side is fully general either way,
  and a generated table cannot be mistyped.

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


class _BitReader:
    """Reads one entropy-coded segment (already de-stuffed)."""

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
) -> bytes:
    """uint8 (H, W) grey or (H, W, 3) RGB → baseline JFIF JPEG bytes."""
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
    for tc_th, bits, vals in (
        (0x00, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x10, _ENC_AC_BITS, _ENC_AC_VALS),
        (0x01, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x11, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    # plane-raster block index → per-MCU interleaved emission: the
    # planes are padded to the MCU multiple, so each plane's block
    # grid is exactly (mcu_rows·fv) × (mcu_cols·fh)
    widths = [mcu_cols * fh for fh, _fv in factors]

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
                            writer, zz, preds[ci],
                            _ENC_DC_CODES, _ENC_AC_CODES,
                        )
            mcus_done += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
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
    payload: bytes, _return_quantized: bool = False
) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) uint8 RGB (grey replicated)."""
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
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext seq
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "decode_jpeg: only baseline sequential DCT (SOF0/SOF1)"
                f" is supported (got SOF marker 0x{marker:02X} —"
                " progressive/arithmetic/lossless need libjpeg,"
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
            result_planes = _decode_scan(
                frame, comp_scan, segs, huffs, restart_interval
            )
        # all other markers (APPn, COM): skipped via their length

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


def _decode_scan(frame, comp_scan, segs, huffs, restart_interval):
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
    preds = {cid: 0 for cid, *_ in comp_scan}
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
        for cid, fh, fv, _tq, td, ta in comp_scan:
            dc_tab = huffs.get((0, td))
            ac_tab = huffs.get((1, ta))
            if dc_tab is None or ac_tab is None:
                raise ValueError("decode_jpeg: scan references missing DHT")
            for by in range(fv):
                for bx in range(fh):
                    zz = np.zeros(64, dtype=np.int64)
                    size = reader.huff(dc_tab)
                    if size > 11:
                        raise ValueError("decode_jpeg: bad DC category")
                    diff = _extend(reader.receive(size), size)
                    preds[cid] += diff
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = reader.huff(ac_tab)
                        run, sz = rs >> 4, rs & 0xF
                        if sz == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError(
                                "decode_jpeg: AC run overflows block"
                            )
                        zz[k] = _extend(reader.receive(sz), sz)
                        k += 1
                    block = np.zeros(64, dtype=np.int64)
                    block[ZIGZAG] = zz
                    coefs[cid][my * fv + by, mx * fh + bx] = block.reshape(
                        8, 8
                    )
    return coefs
