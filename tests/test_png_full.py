"""Full-spec PNG codec tests: palette (PLTE/tRNS), gray+alpha, 16-bit,
sub-byte gray depths, and Adam7 interlace — extending the baseline 8-bit
suite in test_multimodal_images.py."""

import struct
import zlib

import numpy as np
import pytest

from hiss_cube_spark.operators.multimodal import (
    _png_chunk,
    decode_image_np,
    decode_png_np,
    encode_png_np,
)

RNG = np.random.default_rng(20260814)
SIG = b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 16), (13, 31)])
def test_roundtrip_8bit_all_color_types(channels, shape):
    img = RNG.integers(0, 256, size=(*shape, channels)).astype(np.uint8)
    out = decode_png_np(encode_png_np(img))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_16bit(channels):
    img = RNG.integers(0, 65536, size=(9, 13, channels)).astype(np.uint16)
    out = decode_png_np(encode_png_np(img))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (8, 8), (9, 9), (15, 17), (33, 7)])
def test_roundtrip_adam7(channels, shape):
    """Adam7 interlace: every pass sub-image defilters independently; all
    shapes including ones where some passes are empty."""
    img = RNG.integers(0, 256, size=(*shape, channels)).astype(np.uint8)
    buf = encode_png_np(img, interlace=True)
    assert buf[8 + 4 + 4 + 12] == 1  # IHDR interlace byte (13th data byte)
    np.testing.assert_array_equal(decode_png_np(buf), img)


def test_roundtrip_adam7_16bit():
    img = RNG.integers(0, 65536, size=(11, 6, 3)).astype(np.uint16)
    np.testing.assert_array_equal(
        decode_png_np(encode_png_np(img, interlace=True)), img
    )


def test_palette_roundtrip_and_trns():
    pal = RNG.integers(0, 256, size=(17, 3)).astype(np.uint8)
    idx = RNG.integers(0, 17, size=(12, 9)).astype(np.uint8)
    out = decode_png_np(encode_png_np(idx, palette=pal))
    np.testing.assert_array_equal(out, pal[idx])

    trns = np.array([0, 128, 255], dtype=np.uint8)  # first 3 entries
    out_a = decode_png_np(encode_png_np(idx, palette=pal, trns=trns))
    assert out_a.shape == (12, 9, 4)
    np.testing.assert_array_equal(out_a[:, :, :3], pal[idx])
    alpha = np.full(17, 255, dtype=np.uint8)
    alpha[:3] = trns
    np.testing.assert_array_equal(out_a[:, :, 3], alpha[idx])


def _manual_png(w, h, depth, color, scan_bytes, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        SIG
        + _png_chunk(b"IHDR", ihdr)
        + extra
        + _png_chunk(b"IDAT", zlib.compress(scan_bytes))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_grayscale(depth):
    """Hand-built depth-1/2/4 grayscale files decode with spec bit order
    (MSB-first within each byte) and rescale to 0-255."""
    w, h = 10, 3
    maxv = (1 << depth) - 1
    samples = RNG.integers(0, maxv + 1, size=(h, w))
    rows = b""
    for y in range(h):
        bits = np.zeros(w * depth, dtype=np.uint8)
        for x in range(w):
            for b in range(depth):
                bits[x * depth + b] = (samples[y, x] >> (depth - 1 - b)) & 1
        rows += b"\x00" + np.packbits(bits).tobytes()
    out = decode_png_np(_manual_png(w, h, depth, 0, rows))
    np.testing.assert_array_equal(
        out[:, :, 0], (samples * 255 // maxv).astype(np.uint8)
    )


@pytest.mark.parametrize("depth", [1, 4])
def test_subbyte_palette(depth):
    """Sub-byte palette indices are looked up, never rescaled."""
    w, h = 7, 4
    n = 1 << depth
    pal = RNG.integers(0, 256, size=(n, 3)).astype(np.uint8)
    idx = RNG.integers(0, n, size=(h, w))
    rows = b""
    for y in range(h):
        bits = np.zeros(w * depth, dtype=np.uint8)
        for x in range(w):
            for b in range(depth):
                bits[x * depth + b] = (idx[y, x] >> (depth - 1 - b)) & 1
        rows += b"\x00" + np.packbits(bits).tobytes()
    buf = _manual_png(w, h, depth, 3, rows, extra=_png_chunk(b"PLTE", pal.tobytes()))
    np.testing.assert_array_equal(decode_png_np(buf), pal[idx])


def test_filtered_16bit_bpp():
    """16-bit Sub/Paeth filters operate at bpp = channels*2 bytes — build a
    Sub-filtered 16-bit gray file by hand and check exact recovery."""
    w, h = 6, 2
    img = RNG.integers(0, 65536, size=(h, w)).astype(np.uint16)
    be = img.astype(">u2")
    rows = b""
    for y in range(h):
        raw = np.frombuffer(be[y].tobytes(), dtype=np.uint8).astype(np.int64)
        filt = raw.copy()
        filt[2:] = (raw[2:] - raw[:-2]) & 0xFF  # Sub with bpp=2
        rows += b"\x01" + filt.astype(np.uint8).tobytes()
    out = decode_png_np(_manual_png(w, h, 16, 0, rows))
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_validation_errors():
    img = RNG.integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    good = encode_png_np(img)
    with pytest.raises(ValueError):
        decode_png_np(b"notapng" + good)
    # invalid depth/color combo: depth 2 RGB
    bad = _manual_png(4, 4, 2, 2, b"\x00" * 9)
    with pytest.raises(ValueError):
        decode_png_np(bad)
    # palette file without PLTE
    bad2 = _manual_png(2, 1, 8, 3, b"\x00\x00\x00")
    with pytest.raises(ValueError):
        decode_png_np(bad2)
    with pytest.raises(ValueError):
        encode_png_np(img.astype(np.float32))


def test_decode_image_np_dispatch_still_rgb():
    """The pipeline dispatch keeps its (h, w, 3) uint8 contract for the
    new variants: gray+alpha and 16-bit collapse to 3-channel uint8."""
    ga = RNG.integers(0, 256, size=(5, 4, 2)).astype(np.uint8)
    out = decode_image_np(encode_png_np(ga))
    assert out.shape == (5, 4, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[:, :, 0], ga[:, :, 0])

    img16 = RNG.integers(0, 65536, size=(5, 4, 3)).astype(np.uint16)
    out16 = decode_image_np(encode_png_np(img16))
    assert out16.shape == (5, 4, 3) and out16.dtype == np.uint8
    np.testing.assert_array_equal(out16, (img16 >> 8).astype(np.uint8))


def test_adam7_subbyte_grayscale():
    """Adam7 interlace combined with depth-2 grayscale: each pass packs
    its own bit-rows; hand-built fixture decodes to the rescaled image."""
    w, h, depth = 9, 10, 2
    maxv = 3
    samples = RNG.integers(0, maxv + 1, size=(h, w))
    ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = b""
    for x0, y0, xs, ys in ADAM7:
        sub = samples[y0::ys, x0::xs]
        ph, pw = sub.shape
        if ph == 0 or pw == 0:
            continue
        for yy in range(ph):
            bits = np.zeros(pw * depth, dtype=np.uint8)
            for xx in range(pw):
                for b in range(depth):
                    bits[xx * depth + b] = (sub[yy, xx] >> (depth - 1 - b)) & 1
            raw += b"\x00" + np.packbits(bits).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)  # interlace=1
    buf = (
        SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png_np(buf)
    np.testing.assert_array_equal(
        out[:, :, 0], (samples * 255 // maxv).astype(np.uint8)
    )
