"""FLAC codec subset tests: container, CRCs, fixed predictors, Rice
residuals — lossless roundtrip contracts."""

import numpy as np
import pytest

from hiss_cube_spark.operators.flac import (
    _crc8,
    _crc16,
    _read_utf8_number,
    _utf8_number,
    _BR,
    decode_flac_np,
    encode_flac_np,
)

RNG = np.random.default_rng(20260814)


def test_utf8_number_roundtrip():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, 2**31, 2**35]:
        enc = _utf8_number(n)
        assert _read_utf8_number(_BR(enc)) == n, n


def test_crc_known_properties():
    assert _crc8(b"") == 0 and _crc16(b"") == 0
    # CRC self-check: appending the big-endian CRC16 zeroes the register
    msg = b"hello flac"
    c = _crc16(msg)
    assert _crc16(msg + bytes([c >> 8, c & 0xFF])) == 0


@pytest.mark.parametrize(
    "make",
    [
        lambda: np.zeros(1000, dtype=np.int16),
        lambda: np.full(5000, -1234, dtype=np.int16),
        lambda: (np.sin(np.arange(9000) / 30.0) * 12000).astype(np.int16),
        lambda: RNG.integers(-32768, 32767, size=4096).astype(np.int16),
        lambda: RNG.integers(-300, 300, size=10000).astype(np.int16).cumsum()
        .clip(-32768, 32767).astype(np.int16),
        lambda: np.array([7], dtype=np.int16),
        lambda: np.empty(0, dtype=np.int16),
    ],
    ids=["silence", "constant", "sine", "noise", "random_walk", "one", "empty"],
)
def test_mono_roundtrip(make):
    s = make()
    dec, rate = decode_flac_np(encode_flac_np(s, rate=22_050))
    assert rate == 22_050
    np.testing.assert_array_equal(dec, s)


def test_stereo_roundtrip():
    left = (np.sin(np.arange(6000) / 25.0) * 9000).astype(np.int16)
    right = RNG.integers(-2000, 2000, size=6000).astype(np.int16)
    s = np.stack([left, right], axis=-1)
    dec, rate = decode_flac_np(encode_flac_np(s, rate=44_100))
    assert dec.shape == (6000, 2) and rate == 44_100
    np.testing.assert_array_equal(dec, s)


def test_compresses_smooth_audio():
    """A sine (fixed predictors + rice thrive on it) must compress well
    below raw PCM; noise must still roundtrip exactly."""
    sine = (np.sin(np.arange(32768) / 40.0) * 15000).astype(np.int16)
    blob = encode_flac_np(sine)
    assert len(blob) < sine.size * 2 * 0.6, len(blob)
    noise = RNG.integers(-32768, 32767, size=8192).astype(np.int16)
    np.testing.assert_array_equal(decode_flac_np(encode_flac_np(noise))[0], noise)


def test_corruption_detected():
    s = (np.sin(np.arange(5000) / 20.0) * 10000).astype(np.int16)
    blob = bytearray(encode_flac_np(s))
    with pytest.raises(ValueError):
        decode_flac_np(b"RIFF" + bytes(blob))
    # flip a bit in the first frame's audio payload: CRC must catch it
    blob2 = bytearray(blob)
    blob2[80] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac_np(bytes(blob2))


def test_validation():
    with pytest.raises(ValueError):
        encode_flac_np(np.zeros(10, dtype=np.float32))


def test_multiframe_boundaries():
    """> 2 frames with a partial tail block (custom 16-bit blocksize code
    path) reassemble exactly in order."""
    s = RNG.integers(-500, 500, size=4096 * 2 + 777).astype(np.int16)
    dec, _ = decode_flac_np(encode_flac_np(s))
    np.testing.assert_array_equal(dec, s)


def test_decode_audio_spark_path_mixes_wav_and_flac(spark):
    """decode_audio dispatches per payload: WAV and FLAC clips in one
    DataFrame decode to identical sample arrays for identical signals."""
    from hiss_cube_spark.operators.multimodal import decode_audio, encode_wav_np

    sig = (np.sin(np.arange(2000) / 15.0) * 8000).astype(np.int16)
    rows = [
        (1, bytearray(encode_wav_np(sig.astype(np.float32) / 32767.0))),
        (2, bytearray(encode_flac_np(sig))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert out[1]["rate"] == out[2]["rate"] == 16000
    a = np.array(out[1]["samples"], dtype=np.float32)
    b = np.array(out[2]["samples"], dtype=np.float32)
    assert a.shape == b.shape == (2000,)
    np.testing.assert_allclose(a, b, atol=1e-4)


# ---------------------------------------------------------------------------
# Round-6 decoder surface: LPC, stereo decorrelation, wasted bits, byte-width
# MD5 for 8/24-bit streams (reference parity: the SDSS audio-adjacent payloads
# are opaque binaries; codec correctness is pinned here, not via the oracle).
# ---------------------------------------------------------------------------

import hashlib
import struct

import hiss_cube_spark.operators.flac as flac_mod


def test_lpc_roundtrip_and_wins_on_tonal():
    """lpc=True roundtrips exactly and beats fixed predictors on
    HIGH-frequency tones — fixed differencing amplifies those (gain
    (2·sin(ω/2))^k per order), while an order-4 LPC models two
    sinusoids down to coefficient-quantization noise."""
    t = np.arange(3 * 4096)
    s = (np.sin(t * 1.3) * 12000 + np.sin(t * 0.9 + 1.0) * 5000).astype(
        np.int16
    )
    fixed = encode_flac_np(s)
    lpc = encode_flac_np(s, lpc=True)
    dec, rate = decode_flac_np(lpc)
    assert rate == 16_000
    np.testing.assert_array_equal(dec, s)
    assert len(lpc) < len(fixed)


def test_lpc_roundtrip_noisy_stereo():
    s = RNG.integers(-15000, 15000, size=(4096 + 321, 2)).astype(np.int16)
    dec, _ = decode_flac_np(encode_flac_np(s, lpc=True))
    np.testing.assert_array_equal(dec, s)


@pytest.mark.parametrize(
    "mode", ["left-side", "right-side", "mid-side", "auto"]
)
def test_stereo_decorrelation_roundtrip(mode):
    """All stereo modes reconstruct exactly — including odd L+R sums
    (the mid-side >>1 floor + side-LSB reinjection path)."""
    t = np.arange(4096 + 999)
    left = (np.sin(t * 0.02) * 9000).astype(np.int64)
    right = left + RNG.integers(-300, 300, size=t.size)  # correlated
    right[0] = left[0] + 1  # force an odd sum at the frame head
    s = np.stack([left, right], axis=1).astype(np.int16)
    blob = encode_flac_np(s, stereo=mode, lpc=(mode == "auto"))
    dec, _ = decode_flac_np(blob)
    np.testing.assert_array_equal(dec, s)


def test_stereo_decorrelation_compresses_correlated():
    """On strongly-correlated stereo the side channel is tiny: mid-side
    must beat independent coding."""
    t = np.arange(2 * 4096)
    left = (np.sin(t * 0.015) * 11000).astype(np.int64)
    s = np.stack([left, left + (t % 3) - 1], axis=1).astype(np.int16)
    ind = encode_flac_np(s, stereo="independent")
    ms = encode_flac_np(s, stereo="mid-side")
    auto = encode_flac_np(s, stereo="auto")
    dec, _ = decode_flac_np(ms)
    np.testing.assert_array_equal(dec, s)
    assert len(ms) < len(ind)
    assert len(auto) <= len(ms)


def test_stereo_mode_requires_two_channels():
    with pytest.raises(ValueError):
        encode_flac_np(np.zeros(64, dtype=np.int16), stereo="mid-side")


def _craft_mono(samples, bps, *, wasted=0, md5=None, rate=8_000):
    """Hand-build a single-frame mono FLAC stream (VERBATIM subframe) at
    an arbitrary bit depth / wasted-bits count — the encoder only emits
    16-bit, so the 8/24-bit and wasted-bits decode paths are pinned with
    crafted spec-shaped streams."""
    s = np.asarray(samples, dtype=np.int64)
    n = s.size
    if md5 is None:
        if bps == 8:
            raw = s.astype("<i1").tobytes()
        elif bps == 16:
            raw = s.astype("<i2").tobytes()
        else:
            b4 = np.ascontiguousarray(s.astype("<i4")).view(np.uint8)
            raw = np.ascontiguousarray(b4.reshape(-1, 4)[:, :3]).tobytes()
        md5 = hashlib.md5(raw).digest()
    sib = flac_mod._BW()
    sib.put(16, 16)
    sib.put(65535, 16)
    sib.put(0, 24)
    sib.put(0, 24)
    sib.put(rate, 20)
    sib.put(0, 3)  # 1 channel
    sib.put(bps - 1, 5)
    sib.put(n, 36)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(sib.buf) + md5

    hb = flac_mod._BW()
    hb.put(0b11111111111110, 14)
    hb.put(0, 1)
    hb.put(0, 1)
    hb.put(0b0111, 4)  # 16-bit blocksize-1 follows
    hb.put(0, 4)  # rate from STREAMINFO
    hb.put(0, 4)  # mono
    hb.put({8: 1, 16: 4, 24: 6}[bps], 3)
    hb.put(0, 1)
    hdr = bytes(hb.buf) + flac_mod._utf8_number(0) + struct.pack(">H", n - 1)
    hdr += bytes([flac_mod._crc8(hdr)])

    fb = flac_mod._BW()
    fb.put(0, 1)  # padding
    fb.put(1, 6)  # VERBATIM
    if wasted:
        fb.put(1, 1)
        fb.put(1, wasted)  # unary (wasted-1): w-1 zeros then a 1
    else:
        fb.put(0, 1)
    ssb = bps - wasted
    for v in (s >> wasted).tolist():
        fb.put(v & ((1 << ssb) - 1), ssb)
    fb.align()
    frame = hdr + bytes(fb.buf)
    out += frame + struct.pack(">H", flac_mod._crc16(frame))
    return bytes(out)


def test_crafted_16bit_matches_encoder_decode():
    """Sanity-pin the crafting helper itself against the encoder path."""
    s = RNG.integers(-3000, 3000, size=100).astype(np.int64)
    dec, rate = decode_flac_np(_craft_mono(s, 16))
    assert rate == 8_000
    assert dec.dtype == np.int16
    np.testing.assert_array_equal(dec, s.astype(np.int16))


def test_wasted_bits_decode():
    """Samples that are all multiples of 8 coded at ssb=bps-3 with the
    wasted-bits header restore the <<3 on decode."""
    s = (RNG.integers(-1000, 1000, size=64) * 8).astype(np.int64)
    dec, _ = decode_flac_np(_craft_mono(s, 16, wasted=3))
    np.testing.assert_array_equal(dec, s.astype(np.int16))


def test_8bit_stream_md5_at_byte_width():
    """A valid 8-bit stream with populated MD5 decodes (the round-5 gate
    hashed '<i2' and spuriously rejected it)."""
    s = RNG.integers(-128, 128, size=200).astype(np.int64)
    dec, _ = decode_flac_np(_craft_mono(s, 8))
    assert dec.dtype == np.int16
    np.testing.assert_array_equal(dec, s.astype(np.int16))


def test_24bit_stream_int32_out_and_md5():
    """24-bit samples beyond int16 range survive (int32 out, MD5 over
    3-byte little-endian PCM)."""
    s = RNG.integers(-(2**23), 2**23, size=150).astype(np.int64)
    s[0], s[1] = 2**23 - 1, -(2**23)  # extremes: would wrap as int16
    dec, _ = decode_flac_np(_craft_mono(s, 24))
    assert dec.dtype == np.int32
    np.testing.assert_array_equal(dec, s.astype(np.int32))


def test_md5_mismatch_rejected():
    s = RNG.integers(-100, 100, size=50).astype(np.int64)
    bad = _craft_mono(s, 24, md5=b"\x01" * 16)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_np(bad)
    # zeroed MD5 = "unset" per spec: decode succeeds
    ok = _craft_mono(s, 24, md5=b"\x00" * 16)
    dec, _ = decode_flac_np(ok)
    np.testing.assert_array_equal(dec, s.astype(np.int32))


def test_streaminfo_helper():
    s = RNG.integers(-100, 100, size=64).astype(np.int64)
    info = flac_mod.flac_streaminfo(_craft_mono(s, 24, rate=12_000))
    assert info == {
        "rate": 12_000,
        "channels": 1,
        "bits_per_sample": 24,
        "total_samples": 64,
    }
    with pytest.raises(ValueError, match="fLaC"):
        flac_mod.flac_streaminfo(b"RIFFxxxx")


def test_decode_audio_np_normalizes_at_stream_depth():
    """decode_audio_np's [-1, 1] contract must hold at EVERY FLAC bit
    depth (round-6 divided by 32767 unconditionally: 8-bit came out
    ~256x too quiet, 24-bit up to +-256)."""
    from hiss_cube_spark.operators.multimodal import decode_audio_np

    for bps, full in ((8, 127), (16, 32767), (24, 8_388_607)):
        s = np.zeros(32, dtype=np.int64)
        s[0], s[1] = full, -full
        mono, rate = decode_audio_np(_craft_mono(s, bps))
        assert rate == 8_000
        assert mono.dtype == np.float32
        assert abs(float(mono[0]) - 1.0) < 1e-6, bps
        assert abs(float(mono[1]) + 1.0) < 1e-6, bps
        assert float(np.abs(mono).max()) <= 1.0 + 1e-6


def test_invalid_partition_order_rejected():
    """A porder that does not divide the blocksize must raise at the
    residual header, not surface later as a CRC/shape mismatch."""
    bits = np.zeros(64, dtype=np.uint8)
    # method=0 (00), porder=3 on bs=100 (100 % 8 != 0) -> invalid
    bits[2:6] = [0, 0, 1, 1]
    ones = np.flatnonzero(bits)
    rank = np.cumsum(bits, dtype=np.int64)
    with pytest.raises(ValueError, match="partition order"):
        flac_mod._read_residual(bits, ones, rank, 0, 100, 2)
