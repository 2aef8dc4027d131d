"""12-bit JPEG (extended sequential SOF1) + optimized-Huffman tests."""

import numpy as np
import pytest

from hiss_cube_spark.operators.jpeg import (
    _canonical_codes,
    _optimal_table,
    decode_jpeg_np,
    encode_jpeg_np,
)

RNG = np.random.default_rng(20260814)


def _smooth12(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.clip(
        2048 + 1200 * np.sin(2 * np.pi * (x / w + y / h)), 0, 4095
    ).astype(np.uint16)


def test_optimal_table_is_valid_prefix_code():
    """The K.2/K.3 builder yields a decodable canonical table: lengths
    <=16, kraft sum < 1 (the reserved symbol's slot is dropped), codes
    unique, and frequent symbols get shorter codes."""
    freq = np.zeros(257, np.int64)
    freq[0] = 1000
    freq[1] = 500
    freq[2] = 100
    freq[0xF0] = 10
    freq[0xFA] = 1
    bits, vals = _optimal_table(freq)
    assert sum(bits) == 5 and sorted(vals) == [0, 1, 2, 0xF0, 0xFA]
    codes = _canonical_codes(bits, vals)
    assert len({(c, l) for c, l in codes.values()}) == 5
    assert sum(2.0 ** -l for _, l in codes.values()) < 1.0
    assert codes[0][1] <= codes[2][1] <= codes[0xFA][1]
    assert max(l for _, l in codes.values()) <= 16


def test_optimal_table_many_symbols_respects_16bit_limit():
    """A pathological geometric frequency profile would want >16-bit
    codes; the K.3 adjustment must cap at 16 while staying decodable."""
    freq = np.zeros(257, np.int64)
    for i in range(180):
        freq[i] = max(1, 2 ** max(0, 40 - i))
    bits, vals = _optimal_table(freq)
    assert sum(bits) == 180 and len(bits) == 16
    codes = _canonical_codes(bits, vals)
    assert sum(2.0 ** -l for _, l in codes.values()) <= 1.0


def test_gray12_roundtrip_error_bound():
    """12-bit grayscale: quality-95 smooth content reconstructs within a
    small fraction of the 4095 range (q tables scale 16x, so the error
    budget matches the 8-bit codec's relative bound)."""
    img = _smooth12(32, 40)
    blob = encode_jpeg_np(img, quality=95, precision=12)
    dec = decode_jpeg_np(blob)
    assert dec.dtype == np.uint16 and dec.shape == (32, 40, 3)
    err = np.abs(dec[:, :, 0].astype(float) - img.astype(float)).mean()
    assert err < 8 * 16, err  # 8-bit bound x the 16x range scale


def test_rgb12_roundtrip_and_dc_fidelity():
    img = np.stack(
        [_smooth12(24, 24), _smooth12(24, 24) // 2, _smooth12(24, 24) // 3],
        axis=-1,
    ).astype(np.uint16)
    dec = decode_jpeg_np(encode_jpeg_np(img, quality=95, precision=12))
    assert dec.dtype == np.uint16
    err = np.abs(dec.astype(float) - img.astype(float)).mean()
    assert err < 8 * 16, err

    # constant image: DC-only, near-exact at any precision
    flat = np.full((16, 16), 3000, dtype=np.uint16)
    dflat = decode_jpeg_np(encode_jpeg_np(flat, quality=90, precision=12))
    assert np.abs(dflat[:, :, 0].astype(int) - 3000).max() <= 16


def test_12bit_stream_markers():
    """SOF1 marker, 16-bit DQT, and values beyond the 8-bit symbol
    alphabet actually appear in the stream."""
    blob = encode_jpeg_np(_smooth12(16, 16), quality=95, precision=12)
    assert b"\xff\xc1" in blob and b"\xff\xc0" not in blob
    i = blob.index(b"\xff\xdb")
    assert blob[i + 4] == 0x10  # DQT precision nibble = 16-bit


def test_8bit_optimize_is_entropy_lossless():
    """optimize=True re-codes with per-image tables: smaller-or-equal
    stream, bit-identical decoded pixels."""
    img = RNG.integers(0, 256, size=(24, 32, 3)).astype(np.uint8)
    std = encode_jpeg_np(img, quality=85)
    opt = encode_jpeg_np(img, quality=85, optimize=True)
    np.testing.assert_array_equal(decode_jpeg_np(std), decode_jpeg_np(opt))
    assert len(opt) <= len(std)


def test_8bit_default_stream_unchanged():
    """precision/optimize default to the round-4 behavior: byte-identical
    streams for the standard-table path (pins the refactored scan loop)."""
    img = RNG.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    a = encode_jpeg_np(img, quality=85, subsampling="420", restart_interval=2)
    b = encode_jpeg_np(
        img, quality=85, subsampling="420", restart_interval=2,
        precision=8, optimize=False,
    )
    assert a == b
    dec = decode_jpeg_np(a)
    assert dec.dtype == np.uint8 and dec.shape == (17, 23, 3)


def test_validation():
    with pytest.raises(ValueError):
        encode_jpeg_np(np.zeros((8, 8)), precision=10)
    with pytest.raises(ValueError):
        encode_jpeg_np(np.zeros((8, 8)), precision=12, optimize=False)


def test_dispatch_normalizes_12bit():
    from hiss_cube_spark.operators.multimodal import decode_image_np

    img = _smooth12(16, 16)
    out = decode_image_np(encode_jpeg_np(img, quality=95, precision=12))
    assert out.dtype == np.uint8 and out.shape == (16, 16, 3)
    err = np.abs(out[:, :, 0].astype(int) - (img >> 4).astype(int)).mean()
    assert err < 8, err


def test_422_subsampling_roundtrip():
    """4:2:2 (horizontal-only chroma decimation): smooth content meets the
    same tolerance as 4:2:0, and the stream carries the 2x1 sampling
    factors the generic decoder upsamples from."""
    y, x = np.mgrid[0:16, 0:24]
    px = np.clip(
        np.stack(
            [128 + 80 * np.sin(2 * np.pi * (x / 24 + y / 16 + c * 0.2))
             for c in range(3)],
            axis=-1,
        ).round(),
        0, 255,
    ).astype(np.uint8)
    blob = encode_jpeg_np(px, quality=95, subsampling="422")
    dec = decode_jpeg_np(blob)
    err = np.abs(dec.astype(float) - px.astype(float)).mean()
    assert err < 8, err
    # 4:2:2 must carry MORE chroma fidelity than 4:2:0 on the same input
    dec420 = decode_jpeg_np(encode_jpeg_np(px, quality=95, subsampling="420"))
    err420 = np.abs(dec420.astype(float) - px.astype(float)).mean()
    assert err <= err420 + 0.5, (err, err420)
    with pytest.raises(ValueError):
        encode_jpeg_np(px, subsampling="411")
