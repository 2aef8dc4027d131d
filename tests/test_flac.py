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
