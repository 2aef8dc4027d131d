"""PLIO_1 (IRAF pixel-list) codec + NOCOMPRESS FITS tile tests."""

import numpy as np
import pytest

from hiss_cube_spark.sources.fits import parse_fits_image, write_rice_fits
from hiss_cube_spark.sources.plio import plio_decode, plio_encode

RNG = np.random.default_rng(20260814)


@pytest.mark.parametrize(
    "arr",
    [
        np.zeros(100, dtype=np.int64),
        np.ones(77, dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([5], dtype=np.int64),
        np.repeat([0, 3, 0, 3, 7, 0], [10, 5, 20, 1, 1, 30]),
        np.repeat([1, 2, 1, 0, 2**20, 0], [3, 3, 3, 3, 3, 3]),
    ],
    ids=["zeros", "ones", "empty", "single", "mask_runs", "big_values"],
)
def test_plio_roundtrip_shapes(arr):
    np.testing.assert_array_equal(plio_decode(plio_encode(arr)), arr)


def test_plio_roundtrip_random_masks():
    """Sparse label masks — PLIO's design regime — plus dense noise."""
    for _ in range(5):
        sparse = RNG.choice([0, 0, 0, 0, 1, 2, 9], size=500)
        np.testing.assert_array_equal(plio_decode(plio_encode(sparse)), sparse)
    noise = RNG.integers(0, 2**27, size=300)
    np.testing.assert_array_equal(plio_decode(plio_encode(noise)), noise)


def test_plio_long_runs_exceed_data_field():
    """Runs longer than the 13-bit data field split across words."""
    arr = np.repeat([0, 42, 0], [20000, 20000, 20000])
    np.testing.assert_array_equal(plio_decode(plio_encode(arr)), arr)


def test_plio_compresses_masks():
    """A sparse mask must compress far below raw int16."""
    mask = np.zeros(4096, dtype=np.int64)
    mask[100:200] = 1
    mask[3000:3010] = 7
    assert len(plio_encode(mask)) < 4096 * 2 * 0.02


def test_plio_validation():
    with pytest.raises(ValueError):
        plio_encode(np.array([-1, 0, 1]))
    with pytest.raises(ValueError):
        plio_encode(np.array([2**27]))
    with pytest.raises(ValueError):
        plio_decode(b"\x00\x01\x00\x02\x00\x03")  # bad magic
    good = plio_encode(np.repeat([0, 9], [50, 50]))
    with pytest.raises(ValueError):
        plio_decode(good[:-4])  # truncated: pixel count unreached


@pytest.mark.parametrize("cmptype", ["PLIO_1", "NOCOMPRESS"])
def test_fits_tiled_roundtrip(cmptype):
    """The ZIMAGE bintable path recovers exact pixels for PLIO_1 masks and
    NOCOMPRESS passthrough tiles (completes the convention's codec set:
    RICE_1/GZIP_1/GZIP_2/HCOMPRESS_1/PLIO_1/NOCOMPRESS)."""
    img = RNG.choice([0, 0, 0, 1, 2, 255], size=(23, 32)).astype(np.int16)
    fz = write_rice_fits(img, tile_rows=7, cmptype=cmptype)
    _, arr = parse_fits_image(fz)
    np.testing.assert_array_equal(arr, img.astype(np.int64))
