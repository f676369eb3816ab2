"""FLAC codec (r15): bit-exact lossless roundtrips across subframe
types, blockings and all four stereo decorrelation modes; CRC/MD5
integrity rejection; parity with the WAV path through the sniffing
audio decoder (both containers are lossless for int16, so the same
samples must produce identical fingerprints)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pql_spark.operators._flac import decode_flac, encode_flac


def _mono(n=5000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    return (
        8000 * np.sin(t / 23.0) + rng.randint(-60, 60, n)
    ).astype(np.int16)


@pytest.mark.parametrize("bs", [192, 1000, 4096])
def test_mono_roundtrip_bit_exact(bs):
    a = _mono()
    out, sr = decode_flac(encode_flac(a, 8000, block_size=bs))
    assert sr == 8000
    assert out.dtype == np.int16 and np.array_equal(out, a)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_modes_bit_exact(mode):
    a = _mono()
    st = np.stack([a, (a // 3 - 77).astype(np.int16)], axis=1)
    out, sr = decode_flac(encode_flac(st, 44100, stereo_mode=mode))
    assert sr == 44100 and np.array_equal(out, st), mode


def test_extreme_and_constant_and_empty():
    ext = np.array([-32768, 32767, 0, -1, 1] * 200, dtype=np.int16)
    assert np.array_equal(
        decode_flac(encode_flac(ext, 8000, block_size=256))[0], ext
    )
    const = np.full(999, -12345, np.int16)
    assert np.array_equal(decode_flac(encode_flac(const, 8000))[0], const)
    empty = np.array([], np.int16)
    assert decode_flac(encode_flac(empty, 8000))[0].size == 0


def test_odd_sides_force_mid_side_parity_bit():
    # mid/side drops the sum's low bit into the side channel's parity;
    # odd L+R sums exercise the reconstruction exactly
    a = np.array([1, 2, -3, 5, -32768, 32767, 11, 0], np.int16)
    b = np.array([2, 2, 4, -5, 32767, -32768, -12, 1], np.int16)
    st = np.stack([a, b], axis=1)
    out, _ = decode_flac(encode_flac(st, 8000, stereo_mode="mid_side"))
    assert np.array_equal(out, st)


def test_crc_corruption_rejected():
    a = _mono(800)
    buf = bytearray(encode_flac(a, 8000, block_size=800))
    buf[-3] ^= 0x01  # flip a bit inside the frame payload
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(buf))


def test_md5_mismatch_rejected():
    a = _mono(300)
    buf = bytearray(encode_flac(a, 8000))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the first block
    buf[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(buf))


def test_truncated_and_not_flac_rejected():
    a = _mono(500)
    p = encode_flac(a, 8000)
    with pytest.raises(ValueError):
        decode_flac(p[: len(p) - 7])
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxxWAVE")


def test_unsupported_bps_refused():
    a = _mono(100)
    buf = bytearray(encode_flac(a, 8000))
    # STREAMINFO: bits-per-sample-1 spans bits 139..143 of the block
    # body; easier: rewrite byte 8+4+13 (rate/ch/bps packing) — flip
    # the bps field from 15 (16-bit) to 7 (8-bit)
    # layout: bytes 18.. of body start after 16+16+24+24+20+3 bits
    # = 103 bits; bps's 5 bits are bits 103..107 of the body
    body_off = 8  # 4-byte magic + 4-byte block header
    bitpos = 103  # 16+16+24+24+20+3 bits precede the 5-bit bps field
    val = 7  # bps-1 = 7 → 8-bit
    for i in range(5):
        bit = (val >> (4 - i)) & 1
        bi = body_off + (bitpos + i) // 8
        sh = 7 - ((bitpos + i) % 8)
        buf[bi] = (buf[bi] & ~(1 << sh)) | (bit << sh)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_flac(bytes(buf))


def test_audio_sniffer_flac_equals_wav(spark):
    # the same int16 samples through WAV and FLAC containers must
    # produce IDENTICAL fingerprints — both containers are lossless
    from pql_spark.operators.multimodal import (
        audio_fingerprint,
        decode_audio,
        encode_wav,
    )

    a = _mono(4000, seed=3)
    wav = encode_wav(a.astype(np.float64) / 32767.0, 8000)
    flac = encode_flac(a, 8000)
    sw, rw = decode_audio(wav)
    sf, rf = decode_audio(flac)
    assert rw == rf == 8000
    assert np.allclose(sw, sf, atol=0)  # bit-identical normalization
    rows = [(1, bytearray(wav)), (2, bytearray(flac))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: tuple(r.afp)
        for r in audio_fingerprint(df).collect()
    }
    assert got[1] == got[2]


def _aiff(samples16: np.ndarray, rate: int, nch: int = 1) -> bytes:
    # hand-packed AIFF: COMM with 80-bit extended rate + SSND
    import struct

    def ext80(v: float) -> bytes:
        import math

        if v == 0:
            return b"\x00" * 10
        m, e = math.frexp(v)  # v = m * 2^e, m in [0.5, 1)
        mant = int(m * (1 << 64))
        return struct.pack(">HQ", 16383 + e - 1, mant)

    pcm = samples16.astype(">i2").tobytes()
    comm = struct.pack(">hIh", nch, len(samples16) // nch, 16) + ext80(rate)
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_aiff_matches_wav_path():
    from pql_spark.operators.multimodal import decode_audio, encode_wav

    a = _mono(3000, seed=5)
    wav = encode_wav(a.astype(np.float64) / 32767.0, 8000)
    sw, rw = decode_audio(wav)
    sa, ra = decode_audio(_aiff(a, 8000))
    assert ra == rw == 8000
    assert np.array_equal(sw, sa)
    # stereo averaged, like the WAV contract
    st = np.stack([a, (a // 2).astype(np.int16)], axis=1).reshape(-1)
    ss, _ = decode_audio(_aiff(st, 44100, nch=2))
    want = (
        st.reshape(-1, 2).astype(np.float64).mean(axis=1) / 32767.0
    )
    assert np.allclose(ss, want)
    # 24-bit refused honestly
    bad = bytearray(_aiff(a, 8000))
    i = bad.find(b"COMM")
    bad[i + 8 + 6 + 1] = 24  # sampleSize low byte
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_audio(bytes(bad))


def test_au_ulaw_and_pcm16():
    from pql_spark.operators.multimodal import (
        _ulaw_encode,
        decode_audio,
        encode_wav,
    )

    a = _mono(2000, seed=6)
    # PCM16 BE .au vs the same samples through AIFF
    au = struct.pack(
        ">IIIIII", 0x2E736E64, 24, a.size * 2, 3, 8000, 1
    ) + a.astype(">i2").tobytes()
    s1, r1 = decode_audio(au)
    s2, _ = decode_audio(_aiff(a, 8000))
    assert r1 == 8000 and np.array_equal(s1, s2)
    # mu-law .au equals the mu-law WAV path bit-for-bit
    enc = _ulaw_encode(a.astype(np.float64) / 32767.0 * 32767)
    au_u = struct.pack(
        ">IIIIII", 0x2E736E64, 24, enc.size, 1, 8000, 1
    ) + enc.tobytes()
    wav_u = encode_wav(a.astype(np.float64) / 32767.0, 8000, codec="ulaw")
    su, _ = decode_audio(au_u)
    sw, _ = decode_audio(wav_u)
    assert np.array_equal(su, sw)
    # unknown encoding refused
    bad = struct.pack(">IIIIII", 0x2E736E64, 24, 4, 27, 8000, 1) + b"\0" * 4
    with pytest.raises(NotImplementedError, match="encoding 27"):
        decode_audio(bad)
