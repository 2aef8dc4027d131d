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


# ---------------------------------------------------------------------------
# Foreign (IRAF/cfitsio pliocomp) layout — sources/plio_foreign.py
# ---------------------------------------------------------------------------

from hiss_cube_spark.sources.plio_foreign import (  # noqa: E402
    iraf_plio_decode,
    iraf_plio_encode,
    looks_like_iraf_plio,
)


def _stream(instr: list[int]) -> bytes:
    """Hand-build a NEW-format line list from raw instruction words —
    independent of the encoder, so decode semantics are pinned against
    the published opcode table, not against our own writer (the r7
    hcomp lesson: roundtrips can't catch layout mistakes)."""
    total = 7 + len(instr)
    words = [0, 7, -100, total % 32768, total // 32768, 0, 0] + instr
    return np.asarray(words, dtype=">i2").tobytes()


SHIFT = 4096  # I_SHIFT: 3-bit opcode / 12-bit data


def test_iraf_golden_zn_hn():
    # ZN 5, HN 3  (hi register initializes to 1): 5 zeros then 1,1,1
    buf = _stream([0 * SHIFT + 5, 4 * SHIFT + 3])
    np.testing.assert_array_equal(
        iraf_plio_decode(buf, 10),
        [0, 0, 0, 0, 0, 1, 1, 1, 0, 0],  # implicit trailing zeros
    )


def test_iraf_golden_sh_absolute_27bit():
    # SH sets hi = (next << 12) + data: value 0x5ABC123 = high 0x5ABC, low 0x123
    v = (0x5ABC << 12) + 0x123
    assert v <= 2**27 - 1
    buf = _stream([1 * SHIFT + 0x123, 0x5ABC, 4 * SHIFT + 2])
    np.testing.assert_array_equal(iraf_plio_decode(buf, 3), [v, v, 0])


def test_iraf_golden_ih_dh_pn():
    # IH 9 (hi 1->10), PN 4 = three zeros then one hi; DH 3 (10->7), HN 1
    buf = _stream([2 * SHIFT + 9, 5 * SHIFT + 4, 3 * SHIFT + 3, 4 * SHIFT + 1])
    np.testing.assert_array_equal(
        iraf_plio_decode(buf, 6), [0, 0, 0, 10, 7, 0]
    )


def test_iraf_golden_is_ds():
    # IS 4: hi 1->5 emit one; DS 2: hi 5->3 emit one
    buf = _stream([6 * SHIFT + 4, 7 * SHIFT + 2])
    np.testing.assert_array_equal(iraf_plio_decode(buf, 3), [5, 3, 0])


def test_iraf_old_format_header():
    # old 3-word header: word 3 (1-based) = positive total length,
    # instructions from word 4
    instr = [0 * SHIFT + 2, 4 * SHIFT + 2]
    words = [0, 0, 3 + len(instr)] + instr
    buf = np.asarray(words, dtype=">i2").tobytes()
    np.testing.assert_array_equal(iraf_plio_decode(buf, 5), [0, 0, 1, 1, 0])


def test_iraf_roundtrip_masks():
    for _ in range(25):
        n = int(RNG.integers(1, 3000))
        a = RNG.choice(
            [0, 0, 0, 1, 2, 7, 4095, 4096, 2**20, 2**27 - 1], size=n
        ).astype(np.int64)
        buf = iraf_plio_encode(a)
        assert looks_like_iraf_plio(buf)
        np.testing.assert_array_equal(iraf_plio_decode(buf, n), a)


def test_iraf_roundtrip_edges():
    for a in [
        np.zeros(100, dtype=np.int64),
        np.ones(77, dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([5], dtype=np.int64),
        np.repeat([0, 3, 0, 3, 7, 0], [10, 5, 20, 1, 1, 30]),
        np.repeat([1, 2, 1, 0, 2**26, 0], [3, 3, 3, 3, 3, 3]),
        np.repeat([0, 6], [5000, 5000]),  # runs > 4095 need word splits
    ]:
        buf = iraf_plio_encode(np.asarray(a))
        np.testing.assert_array_equal(
            iraf_plio_decode(buf, len(a)), np.asarray(a, dtype=np.int64)
        )


def test_iraf_header_words():
    buf = iraf_plio_encode(np.repeat([0, 9], [10, 10]))
    w = np.frombuffer(buf, dtype=">i2")
    assert list(w[:3]) == [0, 7, -100]
    assert int(w[3]) + (int(w[4]) << 15) == w.size  # length incl. header
    assert int(w[5]) == 0 and int(w[6]) == 0


def test_iraf_rejects_garbage_and_negatives():
    # header word 3 (1-based) neither positive (old) nor -100 (new)
    bad = np.asarray([0, 7, 0, 5, 0, 0, 0], dtype=">i2").tobytes()
    with pytest.raises(ValueError):
        iraf_plio_decode(bad, 4)
    with pytest.raises(ValueError):
        iraf_plio_encode(np.array([-1, 2]))
    # overrun: HN longer than npix plus prior position
    with pytest.raises(ValueError):
        iraf_plio_decode(_stream([0 * SHIFT + 5, 4 * SHIFT + 5]), 6)


def test_fits_tiled_foreign_plio():
    """A ZIMAGE whose PLIO_1 tiles are IRAF line lists (what real fpack
    writes) decodes transparently through the magic dispatch; the
    self-layout file still round-trips byte-for-byte identically."""
    img = RNG.choice([0, 0, 0, 1, 2, 255], size=(23, 32)).astype(np.int16)
    fz_foreign = write_rice_fits(
        img, tile_rows=7, cmptype="PLIO_1", plio_layout="cfitsio"
    )
    fz_native = write_rice_fits(img, tile_rows=7, cmptype="PLIO_1")
    assert fz_foreign != fz_native
    for fz in (fz_foreign, fz_native):
        _, arr = parse_fits_image(fz)
        np.testing.assert_array_equal(arr, img.astype(np.int64))
