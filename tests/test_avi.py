"""Uncompressed-AVI codec + video pHash near-dup: RIFF roundtrip,
container structure, honest codec boundary, and the banded-Hamming
join vs brute force (the _png.py/test_phash.py precedent for video)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pql_spark.operators._avi import decode_avi, encode_avi
from pql_spark.operators.multimodal import (
    phash_reference,
    synth_video,
    video_dup_pairs,
    video_phash,
)


def _ham(a, b) -> int:
    return int(sum(x != y for x, y in zip(a, b)))


def test_roundtrip_bit_exact():
    frames = synth_video(3, n_frames=5)
    out, fps = decode_avi(encode_avi(frames, fps=10))
    assert fps == 10.0 and len(out) == 5
    assert all((out[i] == frames[i]).all() for i in range(5))


def test_roundtrip_odd_sizes():
    # stride padding: widths not divisible by 4, tiny frames
    for w, h in ((45, 17), (1, 1), (3, 2)):
        frames = [
            (np.arange(h * w * 3, dtype=np.int64) * (k + 7) % 256)
            .astype(np.uint8).reshape(h, w, 3)
            for k in range(3)
        ]
        out, _ = decode_avi(encode_avi(frames))
        assert all((out[i] == frames[i]).all() for i in range(3))


def test_container_structure():
    avi = encode_avi(synth_video(0, n_frames=4), fps=25)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (size,) = struct.unpack_from("<I", avi, 4)
    assert size == len(avi) - 8  # RIFF size covers everything after it
    assert b"hdrl" in avi and b"movi" in avi and b"idx1" in avi
    assert avi.count(b"00db") == 4 + 4  # movi chunks + idx1 entries


def test_compressed_stream_refused():
    buf = bytearray(encode_avi(synth_video(1, n_frames=1)))
    i = buf.find(b"strf")
    # biCompression field (offset 16 into BITMAPINFOHEADER) -> 'H264'
    # (MJPG decodes for real since r14 — see test_jpeg.py)
    struct.pack_into("<I", buf, i + 8 + 16, 0x34363248)
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(buf))


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_avi(b"not an avi at all")
    with pytest.raises(ValueError):
        encode_avi([])


# --- multi-stream + top-down DIB handling (ADVICE r13) --------------

from pql_spark.operators._avi import (  # noqa: E402
    _chunk,
    _frame_to_dib,
    _list,
    _row_stride,
)


def _avih(w, h, nframes, nstreams=1):
    return _chunk(
        b"avih",
        struct.pack(
            "<14I", 100_000, 0, 0, 0, nframes, 0, nstreams, 0,
            w, h, 0, 0, 0, 0,
        ),
    )


def _strh(fcc, scale=1, rate=10, length=1, w=0, h=0):
    handler = b"DIB " if fcc == b"vids" else b"\x00" * 4
    return _chunk(
        b"strh",
        fcc + handler
        + struct.pack(
            "<10I4h", 0, 0, 0, scale, rate, 0, length, 0,
            0xFFFFFFFF, 0, 0, 0, w, h,
        ),
    )


def _strf_vids(w, h):
    return _chunk(
        b"strf",
        struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0),
    )


def _strf_auds():
    # WAVEFORMATEX: PCM mono 8 kHz 16-bit — as BITMAPINFOHEADER these
    # bytes are garbage width/bitcount, the exact ADVICE r13 scenario
    return _chunk(b"strf", struct.pack("<2H2I2H", 1, 1, 8000, 16000, 2, 16))


def test_audio_strl_before_video_strl():
    # stream 0 = audio, stream 1 = video: the decoder must skip the
    # auds strf (WAVEFORMATEX), take dimensions from the vids strf,
    # and decode only the '01db' chunks (ignoring '00wb' audio data)
    frames = synth_video(3, n_frames=2)
    h, w = frames[0].shape[:2]
    hdrl = _list(
        b"hdrl",
        _avih(w, h, 2, nstreams=2)
        + _list(b"strl", _strh(b"auds", rate=8000) + _strf_auds())
        + _list(
            b"strl",
            _strh(b"vids", rate=10, length=2, w=w, h=h) + _strf_vids(w, h),
        ),
    )
    movi = _list(
        b"movi",
        _chunk(b"00wb", b"\x00" * 64)
        + b"".join(_chunk(b"01db", _frame_to_dib(f)) for f in frames),
    )
    out, fps = decode_avi(_chunk(b"RIFF", b"AVI " + hdrl + movi))
    assert fps == 10.0 and len(out) == 2
    assert all((out[i] == frames[i]).all() for i in range(2))


def test_foreign_stream_data_chunks_ignored():
    # a second video-ish data chunk under a non-vids index must not be
    # decoded as a frame of the vids stream
    frames = synth_video(6, n_frames=1)
    h, w = frames[0].shape[:2]
    hdrl = _list(
        b"hdrl",
        _avih(w, h, 1)
        + _list(
            b"strl",
            _strh(b"vids", rate=10, length=1, w=w, h=h) + _strf_vids(w, h),
        ),
    )
    movi = _list(
        b"movi",
        _chunk(b"00db", _frame_to_dib(frames[0]))
        + _chunk(b"07dc", b"\x00" * 32),  # stray stream-7 chunk
    )
    out, _ = decode_avi(_chunk(b"RIFF", b"AVI " + hdrl + movi))
    assert len(out) == 1 and (out[0] == frames[0]).all()


def test_negative_biheight_topdown_dib():
    # negative biHeight = top-down row order (valid BI_RGB from some
    # encoders): decode without the vertical flip, not a numpy error
    frame = synth_video(4, n_frames=1)[0]
    h, w = frame.shape[:2]
    stride = _row_stride(w)
    dib = np.zeros((h, stride), dtype=np.uint8)
    dib[:, : w * 3] = frame[:, :, ::-1].reshape(h, w * 3)  # BGR, top-down
    hdrl = _list(
        b"hdrl",
        _avih(w, h, 1)
        + _list(
            b"strl",
            _strh(b"vids", rate=10, length=1, w=w, h=h)
            + _strf_vids(w, -h),
        ),
    )
    movi = _list(b"movi", _chunk(b"00db", dib.tobytes()))
    out, _ = decode_avi(_chunk(b"RIFF", b"AVI " + hdrl + movi))
    assert len(out) == 1 and (out[0] == frame).all()


def _vhash(frames, n=4):
    idx = np.linspace(0, len(frames) - 1, n).astype(int)
    out = []
    for i in idx:
        out.extend(phash_reference(frames[i]))
    return out


def test_vhash_properties():
    clip = synth_video(5)
    h = _vhash(clip)
    assert len(h) == 256 and set(h) <= {0, 1}
    # brightness-shifted clone stays near
    clone = [
        np.clip(f.astype(np.int64) + 6, 0, 255).astype(np.uint8)
        for f in clip
    ]
    assert _ham(h, _vhash(clone)) <= 12
    # a different clip is far
    assert _ham(h, _vhash(synth_video(29))) > 24


@pytest.fixture(scope="module")
def media(spark):
    """20 distinct clips + 4 brightness-shifted clones (ids 1000+k)."""
    from pql_spark.operators.multimodal import MEDIA_SCHEMA

    rows = []
    for k in range(20):
        rows.append((k, encode_avi(synth_video(k), fps=10)))
    for k in range(4):
        frames = [
            np.clip(f.astype(np.int64) + 6, 0, 255).astype(np.uint8)
            for f in synth_video(k)
        ]
        rows.append((1000 + k, encode_avi(frames, fps=10)))
    meta = {"width": 48, "height": 32, "duration_ms": 600,
            "codec": "rawvideo/bgr24"}
    return spark.createDataFrame(
        [(i, "video", p, meta) for i, p in rows], MEDIA_SCHEMA
    )


def test_video_phash_matches_reference(media):
    got = {
        r["media_id"]: list(r["vhash"])
        for r in video_phash(media).collect()
    }
    assert len(got) == 24
    for k in range(20):
        assert got[k] == _vhash(synth_video(k))


def test_video_frame_features(media):
    from pql_spark.operators.multimodal import (
        image_feature,
        video_frame_features,
    )

    # 6 frames at 10 fps = 600 ms; every_ms=200 samples ts 0/200/400 ->
    # frame indexes round(ts*fps/1000) = 0, 2, 4
    out = video_frame_features(media, every_ms=200).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {*range(20), *(1000 + k for k in range(4))}
    rows = sorted(by_id[7], key=lambda r: r["frame_ts_ms"])
    assert [r["frame_ts_ms"] for r in rows] == [0, 200, 400]
    clip = synth_video(7)
    for r, fi in zip(rows, (0, 2, 4)):
        want = image_feature(clip[fi], 16)
        assert np.allclose(list(r["feature"]), want, atol=1e-6)


def test_video_dup_pairs_vs_brute_force(media):
    rows = media.select("media_id", "payload").collect()
    hashes = {
        r["media_id"]: _vhash(decode_avi(bytes(r["payload"]))[0])
        for r in rows
    }
    ids = sorted(hashes)
    want = sorted(
        (a, b, _ham(hashes[a], hashes[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if _ham(hashes[a], hashes[b]) <= 12
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in video_dup_pairs(
            media, threshold_bits=12, bands=16
        ).collect()
    )
    assert got == want  # banding lossless at 12 < 16
    assert {(k, 1000 + k) for k in range(4)} <= {
        (a, b) for a, b, _ in got
    }  # every planted clone recovered
