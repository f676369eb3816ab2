"""Pure-stdlib AVI codec (RIFF + 24-bit BI_RGB 'DIB ', + MJPG).

The video twin of ``_png.py``/``encode_wav``: a REAL container format
written and read with ``struct`` + numpy only, so the multimodal video
tier can decode genuine files without ffmpeg/PyAV.  Scope is the
classic uncompressed baseline every tool can produce (``ffmpeg -c:v
rawvideo -pix_fmt bgr24``, VirtualDub "full frames"): RIFF 'AVI ' with
one 'vids' stream, BITMAPINFOHEADER ``biCompression=0`` (BI_RGB),
24-bit bottom-up BGR frames in '00db'/'00dc' movi chunks — plus, since
r14, Motion-JPEG ('MJPG') streams whose frames are baseline JPEGs
decoded by ``_jpeg.py`` — both self-contained JFIF frames and, since
r15, the legacy DHT-less shape that assumes the T.81 Annex K default
Huffman tables (RFC 2435 Appendix A).  Other codecs — H.264, ... —
raise NotImplementedError at the exact bitstream boundary, the
honest-capability rule used for non-PNG images and non-PCM audio.

Layout written by :func:`encode_avi` (and accepted, plus tolerant
chunk-walking of unknown chunks, by :func:`decode_avi`)::

    RIFF('AVI '
      LIST('hdrl' avih LIST('strl' strh strf))
      LIST('movi' '00db'×n)
      idx1)

Reference: the public AVI RIFF specification (MSDN "AVI RIFF File
Reference") — no reference-repo counterpart; the reference engine has
no media codecs at all.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010
_MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → bottom-up BGR rows, stride padded to 4."""
    a = np.asarray(frame, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_avi: frames must be HxWx3 uint8 RGB")
    h, w = a.shape[:2]
    stride = _row_stride(w)
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    return out.tobytes()


def _dib_to_frame(
    data: bytes, width: int, height: int, topdown: bool = False
) -> np.ndarray:
    stride = _row_stride(width)
    if len(data) < stride * height:
        raise ValueError(
            f"decode_avi: frame chunk {len(data)}B < {stride * height}B"
        )
    a = np.frombuffer(data[: stride * height], dtype=np.uint8)
    a = a.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if topdown:  # negative biHeight: rows already top-down, only BGR→RGB
        return a[:, :, ::-1].copy()
    return a[::-1, :, ::-1].copy()  # un-flip + RGB


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi(
    frames, fps: int = 10, codec: str = "DIB", quality: int = 90,
    mjpeg_dht: bool = True,
) -> bytes:
    """List of HxWx3 uint8 RGB frames → a valid AVI file.

    ``codec="DIB"`` (default): uncompressed BI_RGB 24-bit bottom-up
    frames.  ``codec="MJPG"``: Motion-JPEG — each frame is a complete
    baseline JFIF JPEG (``_jpeg.py``, tables carried in-stream per
    frame by default).  ``mjpeg_dht=False`` writes the legacy DHT-less
    frame shape instead (Annex K tables assumed by the reader, the
    RFC 2435 convention) — ``decode_avi`` handles both."""
    frames = list(frames)
    if not frames:
        raise ValueError("encode_avi: need at least one frame")
    if codec not in ("DIB", "MJPG"):
        raise ValueError("encode_avi: codec must be 'DIB' or 'MJPG'")
    h, w = np.asarray(frames[0]).shape[:2]
    if any(np.asarray(f).shape[:2] != (h, w) for f in frames):
        raise ValueError("encode_avi: all frames must share one size")
    if codec == "MJPG":
        from ._jpeg import encode_jpeg

        jpeg_opts = (
            {} if mjpeg_dht else {"tables": "annex_k", "omit_dht": True}
        )
        dibs = [
            encode_jpeg(f, quality=quality, **jpeg_opts) for f in frames
        ]
        frame_bytes = max(len(d) for d in dibs)
    else:
        dibs = [_frame_to_dib(f) for f in frames]
        frame_bytes = _row_stride(w) * h

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,          # dwMicroSecPerFrame
            frame_bytes * fps,         # dwMaxBytesPerSec
            0,                         # dwPaddingGranularity
            _AVIF_HASINDEX,            # dwFlags
            len(frames),               # dwTotalFrames
            0,                         # dwInitialFrames
            1,                         # dwStreams
            frame_bytes,               # dwSuggestedBufferSize
            w, h, 0, 0, 0, 0,          # width, height, reserved[4]
        ),
    )
    handler = b"MJPG" if codec == "MJPG" else b"DIB "
    strh = _chunk(
        b"strh",
        b"vids" + handler
        + struct.pack(
            "<10I4h",
            0, 0, 0,                   # flags, prio/lang, initialFrames
            1, fps,                    # scale, rate (fps = rate/scale)
            0, len(frames),            # start, length
            frame_bytes, 0xFFFFFFFF,   # bufferSize, quality(-1)
            0,                         # sampleSize
            0, 0, w, h,                # rcFrame
        ),
    )
    compression = _MJPG_FOURCC if codec == "MJPG" else 0
    strf = _chunk(
        b"strf",
        struct.pack(
            "<I2i2H2I2i2I",
            40, w, h, 1, 24,           # biSize..biBitCount
            compression,               # biCompression (BI_RGB / MJPG)
            frame_bytes, 0, 0, 0, 0,   # biSizeImage..biClrImportant
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    # '00db' = uncompressed DIB frame, '00dc' = compressed frame
    data_fcc = b"00dc" if codec == "MJPG" else b"00db"
    movi_payload = b"".join(_chunk(data_fcc, d) for d in dibs)
    movi = _list(b"movi", movi_payload)

    # idx1 offsets are relative to the start of the 'movi' fourcc
    idx, off = [], 4
    for d in dibs:
        idx.append(
            data_fcc + struct.pack("<3I", _AVIIF_KEYFRAME, off, len(d))
        )
        off += 8 + len(d) + (len(d) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for chunks in
    data[start:end]; tolerant of trailing garbage shorter than a
    header."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"decode_avi: chunk {fourcc!r} overruns its parent"
            )
        yield fourcc, body, size
        pos = body + size + (size % 2)


def decode_avi(payload: bytes):
    """AVI bytes → (frames HxWx3 uint8 RGB as one ndarray stack, fps).

    Accepts any chunk ordering/extra chunks; requires one 'vids'
    stream with BI_RGB 24-bit frames.  Multi-stream files are handled
    per spec (ADVICE r13): stream INDEX is the strl's position in
    hdrl, each strl's strh fccType decides whether its strf is parsed
    as BITMAPINFOHEADER, and only ``NNdb``/``NNdc`` data chunks for
    the vids stream's index are decoded — an audio strl listed before
    the video one no longer has its WAVEFORMATEX read as garbage
    width/bitcount.  Negative biHeight (a top-down DIB, valid BI_RGB
    output from some encoders) decodes without the vertical flip.
    Compressed streams raise NotImplementedError (the honest codec
    boundary)."""
    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("decode_avi: not a RIFF AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    width = height = None
    topdown = False
    bitcount = compression = None
    rate = scale = None
    stream_idx = -1          # strl ordinal = stream index, per spec
    cur_type: bytes | None = None
    vids_stream: int | None = None
    frames_raw: list[tuple[int, int, int]] = []  # (stream, body, size)

    def scan(start: int, stop: int) -> None:
        nonlocal width, height, topdown, bitcount, compression
        nonlocal rate, scale, stream_idx, cur_type, vids_stream
        for fourcc, body, size in _walk(data, start, stop):
            if fourcc == b"LIST":
                if data[body:body + 4] == b"strl":
                    stream_idx += 1
                    cur_type = None
                scan(body + 4, body + size)  # skip the list type fourcc
            elif fourcc == b"avih":
                w, h = struct.unpack_from("<2I", data, body + 32)
                width, height = int(w), int(h)
            elif fourcc == b"strh":
                cur_type = data[body:body + 4]
                if cur_type == b"vids" and vids_stream is None:
                    vids_stream = max(stream_idx, 0)
                    scale, rate = struct.unpack_from(
                        "<2I", data, body + 20
                    )
            elif fourcc == b"strf":
                # only the vids stream's strf is a BITMAPINFOHEADER —
                # an auds strf is WAVEFORMATEX and must be skipped
                if cur_type == b"vids" and bitcount is None:
                    _, bw, bh, _, bc, comp = struct.unpack_from(
                        "<I2i2HI", data, body
                    )
                    bitcount, compression = int(bc), int(comp)
                    if bh < 0:  # top-down DIB
                        topdown = True
                        bh = -bh
                    if width is None:
                        width, height = int(bw), int(bh)
                    elif height is not None and int(bh) != height:
                        height = int(bh)
            elif (
                fourcc[2:4] in (b"db", b"dc")
                and fourcc[:2].isdigit()
            ):
                frames_raw.append((int(fourcc[:2]), body, size))

    scan(12, end)

    if width is None or height is None:
        raise ValueError("decode_avi: missing avih/strf headers")
    if compression not in (0, None, _MJPG_FOURCC) or (
        compression in (0, None)
        and bitcount is not None
        and bitcount != 24
    ):
        raise NotImplementedError(
            "decode_avi: only uncompressed 24-bit BI_RGB and MJPG"
            f" streams are supported (got biCompression={compression},"
            f" biBitCount={bitcount}); other codecs (H.264, ...) need"
            " ffmpeg/PyAV, unavailable in this environment"
        )
    # keep only the vids stream's data chunks; a headerless file
    # (no strh at all) falls back to the lowest stream index seen
    if vids_stream is None and frames_raw:
        vids_stream = min(s for s, _, _ in frames_raw)
    chunks = [(b, s) for st, b, s in frames_raw if st == vids_stream]
    if not chunks:
        raise ValueError("decode_avi: no frame chunks in movi")
    if compression == _MJPG_FOURCC:
        from ._jpeg import decode_jpeg

        # default_huffman: legacy MJPEG frames may omit DHT entirely
        # (the out-of-band Annex-K convention, RFC 2435 Appendix A) —
        # in-stream tables still take precedence when present
        frames = np.stack(
            [
                decode_jpeg(data[b:b + s], default_huffman=True)
                for b, s in chunks
            ]
        )
    else:
        frames = np.stack(
            [
                _dib_to_frame(data[b:b + s], width, height, topdown)
                for b, s in chunks
            ]
        )
    fps = (rate / scale) if rate and scale else 0.0
    return frames, fps
