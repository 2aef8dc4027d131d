"""Foreign (hcomp/cfitsio-layout) HCOMPRESS_1 codec: exact roundtrips,
bounded lossy error, both per-plane coding paths, and the `.fits.fz`
container dispatch on the byte after the shared 0xDD99 magic."""

from __future__ import annotations

import numpy as np
import pytest

from hiss_cube_spark.sources.hcomp_foreign import (
    hcomp_decode,
    hcomp_encode,
    hinv_f,
    htrans_f,
)

RNG = np.random.default_rng(20260815)


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (2, 2), (2, 3), (3, 2), (4, 4), (5, 7), (7, 7), (8, 8),
     (16, 5), (17, 13), (33, 17), (64, 48)],
)
def test_htrans_exact_inverse(shape):
    """The integer H-transform is exactly invertible at every shape,
    including odd dims (edge butterflies) and negative pixels."""
    for lo, hi in [(-5000, 5000), (0, 65536), (-3, 4)]:
        a = RNG.integers(lo, hi, size=shape).astype(np.int64)
        np.testing.assert_array_equal(hinv_f(htrans_f(a), *shape), a)


@pytest.mark.parametrize("shape", [(2, 2), (5, 7), (16, 16), (17, 13), (32, 32)])
def test_codec_lossless_roundtrip(shape):
    a = RNG.integers(-300, 300, size=shape).astype(np.int64)
    np.testing.assert_array_equal(hcomp_decode(hcomp_encode(a, scale=0)), a)
    np.testing.assert_array_equal(hcomp_decode(hcomp_encode(a, scale=1)), a)


def test_smooth_image_compresses():
    """A gradient image (the astronomical typical case) compresses well
    through the quadtree path and stays lossless."""
    y, x = np.mgrid[0:64, 0:64]
    sm = (1000 + 3 * y + 2 * x).astype(np.int64)
    blob = hcomp_encode(sm)
    assert len(blob) < 0.15 * sm.size * 4
    np.testing.assert_array_equal(hcomp_decode(blob), sm)


def test_noise_image_uses_direct_bitmaps_and_roundtrips():
    """High-entropy planes overflow the Huffman budget → the 0x0
    direct-bitmap format code path; still bit-exact."""
    a = RNG.integers(-(2**14), 2**14, size=(16, 16)).astype(np.int64)
    blob = hcomp_encode(a)
    np.testing.assert_array_equal(hcomp_decode(blob), a)
    # noise does not compress: the stream is near raw-bitplane size
    assert len(blob) > 0.4 * a.size * 15 / 8


def test_lossy_scale_bounds_error():
    a = RNG.integers(0, 10_000, size=(32, 32)).astype(np.int64)
    for scale in (4, 16, 64):
        b = hcomp_decode(hcomp_encode(a, scale=scale))
        # digitization quantizes H-coefficients by `scale`; the spatial
        # error is bounded by a small multiple after the inverse
        assert int(np.abs(a - b).max()) <= scale, scale


def test_header_fields_and_guards():
    a = RNG.integers(-100, 100, size=(6, 9)).astype(np.int64)
    blob = hcomp_encode(a, scale=0)
    assert blob[:2] == b"\xdd\x99"
    assert int.from_bytes(blob[2:6], "big") == 6   # nx = slow axis
    assert int.from_bytes(blob[6:10], "big") == 9  # ny = fast axis
    assert int.from_bytes(blob[10:14], "big") == 0
    with pytest.raises(ValueError, match="magic"):
        hcomp_decode(b"\x00\x00" + blob[2:])
    bad = bytearray(blob)
    bad[22] = 63  # implausible bitplane count -> loud failure, no garbage
    with pytest.raises(ValueError):
        hcomp_decode(bytes(bad))


def test_fits_fz_container_dispatch():
    """A ZIMAGE bintable whose HCOMPRESS_1 tiles carry the FOREIGN layout
    decodes through the standard tiled-FITS read path (the dispatch byte
    after 0xDD99), bit-exact, alongside the native-layout twin."""
    from hiss_cube_spark.sources.fits import (
        decompress_tiled_image,
        find_tiled_image_hdu,
        write_rice_fits,
    )

    img = (RNG.integers(0, 2000, size=(23, 31))).astype(np.int16)
    for layout in ("native", "cfitsio"):
        blob = write_rice_fits(
            img, tile_rows=6, cmptype="HCOMPRESS_1", hcomp_layout=layout
        )
        hdr, dpos = find_tiled_image_hdu(blob)
        out = decompress_tiled_image(blob, hdr, dpos)
        np.testing.assert_array_equal(out.astype(np.int64), img.astype(np.int64))


def test_foreign_stream_via_hdecompress_dispatch():
    """sources/hcompress.hdecompress routes version-byte != 0x01 streams
    to the foreign decoder instead of raising (r6's labeled gap)."""
    from hiss_cube_spark.sources.hcompress import hcompress, hdecompress

    a = RNG.integers(-50, 50, size=(9, 14)).astype(np.int64)
    foreign = hcomp_encode(a)
    assert foreign[2] == 0  # high byte of nx — the dispatch discriminator
    np.testing.assert_array_equal(hdecompress(foreign), a)
    native = hcompress(a)
    assert native[2] == 1
    np.testing.assert_array_equal(hdecompress(native), a)
