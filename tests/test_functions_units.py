"""Operator-level unit tests with the reference's pinned constants
(SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hiss_cube_spark.functions.compress import float_compress_np
from hiss_cube_spark.functions.pyramid import (
    downsample_image,
    downsample_spectrum,
    image_zoom_shapes,
    spectrum_zoom_lengths,
)
from hiss_cube_spark.functions.spatial import _ang2pix_nest_np
from hiss_cube_spark.operators.ivw import ivw_np


def test_spectrum_zoom_ladder_pinned():
    # ref tests/test_cube_utils.py:14
    assert spectrum_zoom_lengths(4620, 5) == [4620, 2310, 1155, 577, 288]


def test_image_zoom_ladder_pinned():
    # ref tests/test_cube_utils.py:32
    assert image_zoom_shapes(2048, 1489, 5) == [
        (2048, 1489),
        (1024, 744),
        (512, 372),
        (256, 186),
        (128, 93),
    ]


def test_downsample_spectrum_lengths_and_sigma():
    wl = np.linspace(3839.7244, 8914.597, 4620)
    flux = np.sin(wl / 500).astype(np.float32)
    sig = np.full(4620, 0.2, dtype=np.float32)
    w2, f2, s2 = downsample_spectrum(wl, flux, sig)
    assert len(w2) == len(f2) == len(s2) == 2310
    assert np.allclose(s2, 0.1, atol=1e-6)  # sigma/2 per level


def test_downsample_image_shape_and_sigma():
    d = np.ones((93, 128), dtype=np.float32)
    e = np.full((93, 128), 0.4, dtype=np.float32)
    d2, e2 = downsample_image(d, e)
    assert d2.shape == (46, 64)
    assert np.allclose(d2, 1.0)
    assert np.allclose(e2, 0.1)  # sigma/4 per level


def test_float_compress_pinned():
    # ref tests/test_serial_builders.py:231-256: low 13 mantissa bits zero,
    # relative error < 1%
    rng = np.random.default_rng(42)
    x = rng.uniform(-1e3, 1e3, 10_000).astype(np.float32)
    y = float_compress_np(x)
    bits = y.view(np.uint32)
    assert np.all(bits & np.uint32((1 << 13) - 1) == 0)
    nz = x != 0
    rel = np.abs((y[nz] - x[nz]) / x[nz])
    assert rel.max() < 0.01


def test_ivw_reference_formula():
    # mean = Σ(f/σ²)/Σ(1/σ²), σ_out = sqrt(1/Σ(1/σ²)); NaN skipped
    f = np.array([[2.0, np.nan], [4.0, 6.0]])
    s = np.array([[1.0, 1.0], [1.0, 2.0]])
    mean, sig = ivw_np(f, s)
    assert mean[0] == pytest.approx(3.0)
    assert sig[0] == pytest.approx(np.sqrt(0.5))
    assert mean[1] == pytest.approx(6.0)  # NaN row skipped
    assert sig[1] == pytest.approx(2.0)


def test_ivw_zero_sigma_guard():
    mean, sig = ivw_np(np.array([[1.0], [2.0]]), np.array([[0.0], [1.0]]))
    assert mean[0] == pytest.approx(2.0)


def test_healpix_boundary_coords():
    # ref tests/test_photometry_utils.py:5-14: ra∈[0,360], dec∈[-90,90]
    ra = np.array([0.0, 359.999, 180.0, 0.0, 0.0])
    dec = np.array([0.0, 0.0, 0.0, 89.999, -89.999])
    for order in (0, 5, 10, 15):
        p = _ang2pix_nest_np(ra, dec, 1 << order)
        assert p.min() >= 0 and p.max() < 12 * (1 << order) ** 2


def test_is_cutout_whole_truth_table(spark):
    # ref tests/test_serial_builders.py:189-211 (4-case truth table)
    from hiss_cube_spark.operators.cutouts import is_cutout_whole

    cases = [
        (0, 64, 0, 48, 64, 48, True),     # exactly fills
        (-1, 63, 0, 48, 64, 48, False),   # off left edge
        (0, 64, 10, 58, 64, 48, False),   # off bottom edge
        (10, 26, 10, 26, 64, 48, True),   # interior
    ]
    df = spark.createDataFrame(
        [c[:6] for c in cases], "x0 int, x1 int, y0 int, y1 int, n1 int, n2 int"
    )
    got = [
        r[0]
        for r in df.select(
            is_cutout_whole(
                F.col("x0"), F.col("x1"), F.col("y0"), F.col("y1"), F.col("n1"), F.col("n2")
            ).alias("w")
        ).collect()
    ]
    assert got == [c[6] for c in cases]


def test_wcs_roundtrip(spark):
    from hiss_cube_spark.functions.wcs import pixel_to_world, world_to_pixel

    wcs = F.struct(
        F.lit(32.0).alias("crpix1"),
        F.lit(24.0).alias("crpix2"),
        F.lit(4e-4).alias("cd1_1"),
        F.lit(0.0).alias("cd1_2"),
        F.lit(0.0).alias("cd2_1"),
        F.lit(4e-4).alias("cd2_2"),
        F.lit(30.0).alias("crval1"),
        F.lit(10.0).alias("crval2"),
        F.lit("RA---TAN").alias("ctype1"),
        F.lit("DEC--TAN").alias("ctype2"),
    )
    df = spark.range(1).select(wcs.alias("wcs"))
    x, y = world_to_pixel(F.col("wcs"), F.lit(30.004), F.lit(10.002))
    ra, dec = pixel_to_world(F.col("wcs"), x, y)
    row = df.select(x.alias("x"), y.alias("y"), ra.alias("ra"), dec.alias("dec")).first()
    assert row.x == pytest.approx(42.0)
    assert row.y == pytest.approx(29.0)
    assert row.ra == pytest.approx(30.004)
    assert row.dec == pytest.approx(10.002)


def test_time_parse_fallback(spark):
    from hiss_cube_spark.functions.timeparse import parse_obs_time

    df = spark.createDataFrame([("2020-01-01T00:00:00",), ("01/02/03",)], "s string")
    vals = [r[0] for r in df.select(parse_obs_time(F.col("s")).alias("m")).collect()]
    assert vals[0] == pytest.approx(58849.0)  # MJD of 2020-01-01
    assert vals[1] is not None  # dd/MM/yy fallback parsed


def test_mag_flux_constants(spark):
    from hiss_cube_spark.functions.photometry import FILTER_MIDPOINTS, mag_to_flux

    assert FILTER_MIDPOINTS == {"u": 3551, "g": 4686, "r": 6166, "i": 7480, "z": 8932}
    v = (
        spark.range(1)
        .select(mag_to_flux(F.lit(1.0), F.lit(3551)).alias("f"))
        .first()[0]
    )
    assert v == pytest.approx(3.631e-6 * 2.99792458e-5 / 3551**2)


def test_zorder_key_matches_numpy(spark):
    from hiss_cube_spark.functions.spatial import _interleave_bits, zorder_key

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, 50)
    b = rng.integers(0, 1 << 16, 50)
    exp = _interleave_bits(a.astype(np.int64), b.astype(np.int64))
    df = spark.createDataFrame([(int(x), int(y)) for x, y in zip(a, b)], "a long, b long")
    got = [r[0] for r in df.select(zorder_key(F.col("a"), F.col("b")).alias("z")).collect()]
    assert got == exp.tolist()


def test_rebin_spectrum_grid_contract():
    """F9: rebin lands on the fixed 4620-sample survey grid with NaN fill
    outside coverage and exact values at matching grid points
    (ref photometry.py:343-350; grid config.ini:76-78)."""
    from hiss_cube_spark.sources.ingest import REBIN_GRID
    from hiss_cube_spark.sources.photometry_ingest import rebin_spectrum

    lo, hi, n = REBIN_GRID
    assert n == 4620
    grid = np.linspace(lo, hi, n)
    # source spectrum covering only the middle half of the grid
    wl = np.linspace(lo + (hi - lo) * 0.25, hi - (hi - lo) * 0.25, 1000)
    flux = np.full(1000, 2.5)
    sigma = np.full(1000, 0.5)
    f, s = rebin_spectrum(wl, flux, sigma, grid)
    assert f.shape == (4620,) and s.shape == (4620,)
    assert f.dtype == np.float32 and s.dtype == np.float32
    inside = (grid >= wl[0]) & (grid <= wl[-1])
    assert np.all(np.isnan(f[~inside])) and np.all(np.isnan(s[~inside]))
    assert np.allclose(f[inside], 2.5) and np.allclose(s[inside], 0.5)
    # exact passthrough where the source samples coincide with the grid
    f2, _ = rebin_spectrum(grid, np.arange(n, dtype=float), sigma=np.ones(n), grid=grid)
    assert np.array_equal(f2, np.arange(n, dtype=np.float32))


def test_transmission_ratio_interpolation():
    """F8: linear interpolation on the merged curve, zero outside coverage
    (ref _get_transmission_ratio, photometry.py:248-254)."""
    from hiss_cube_spark.sources.photometry_ingest import transmission_ratio

    curve_wl = np.array([4000.0, 5000.0, 6000.0])
    curve_ratio = np.array([0.2, 0.8, 0.4])
    got = transmission_ratio(np.array([3500.0, 4000.0, 4500.0, 5500.0, 6000.0, 6500.0]),
                             curve_wl, curve_ratio)
    assert got.tolist() == [0.0, 0.2, pytest.approx(0.5), pytest.approx(0.6), 0.4, 0.0]


def _ang2pix_ring_np_oracle(ra_deg, dec_deg, nside):
    """Independent RING-scheme ang2pix, transcribed directly from the
    published HEALPix formulas (Górski et al. 2005 §4 / the reference
    C ang2pix_ring) — deliberately NOT sharing any code with the package's
    nested implementation. healpy is absent from this container, so the
    cross-scheme agreement below is the healpy-parity check: the package's
    nest path (face/Morton arithmetic) and this ring path (ring/in-ring
    arithmetic) are disjoint derivations that can only agree everywhere if
    both implement the published pixelization."""
    import numpy as np

    ra = np.mod(np.asarray(ra_deg, dtype=np.float64), 360.0)
    dec = np.asarray(dec_deg, dtype=np.float64)
    z = np.sin(np.deg2rad(dec))
    za = np.abs(z)
    tt = np.mod(ra / 90.0, 4.0)
    pix = np.empty(ra.shape, dtype=np.int64)
    ncap = 2 * nside * (nside - 1)
    npix = 12 * nside * nside

    eq = za <= 2.0 / 3.0
    if np.any(eq):
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * z[eq] * 0.75
        jp = (temp1 - temp2).astype(np.int64)  # ascending edge line
        jm = (temp1 + temp2).astype(np.int64)  # descending edge line
        ir = nside + 1 + jp - jm               # ring counter (1 at z=2/3)
        kshift = 1 - (ir & 1)
        ip = (jp + jm - nside + kshift + 1) >> 1
        ip = np.mod(ip, 4 * nside)
        pix[eq] = ncap + (ir - 1) * 4 * nside + ip
    po = ~eq
    if np.any(po):
        tp = tt[po] - np.floor(tt[po])
        tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
        jp = (tp * tmp).astype(np.int64)
        jm = ((1.0 - tp) * tmp).astype(np.int64)
        ir = jp + jm + 1                        # polar ring counter
        ip = (tt[po] * ir).astype(np.int64)
        ip = np.mod(ip, 4 * ir)
        north_pix = 2 * ir * (ir - 1) + ip
        south_pix = npix - 2 * ir * (ir + 1) + ip
        pix[po] = np.where(z[po] > 0, north_pix, south_pix)
    return pix


def test_healpix_nest_agrees_with_independent_ring_scheme():
    """ring2nest(ang2pix_ring(p)) == ang2pix_nest(p) across random points
    and every seam (face edges, polar/equatorial boundary z=±2/3, poles,
    ra wrap) at nsides from 1 to 2^15 (the orders the reference uses for
    images and spectra, config.ini:17-18)."""
    import numpy as np

    from hiss_cube_spark.functions.spatial import _ang2pix_nest_np, _ring2nest_np

    rng = np.random.default_rng(1234)
    ra = rng.uniform(0.0, 360.0, 4000)
    dec = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 4000)))
    # seams: face boundaries, the z = ±2/3 regime switch, poles, ra wrap
    seam_ra = np.array([0.0, 45.0, 90.0, 135.0, 180.0, 270.0, 359.999999, 1e-9])
    seam_dec = np.array(
        [0.0, 41.8103148957786, -41.8103148957786, 89.999999, -89.999999, 66.0, -66.0, 19.47]
    )
    g_ra, g_dec = np.meshgrid(seam_ra, seam_dec)
    ra = np.concatenate([ra, g_ra.ravel()])
    dec = np.concatenate([dec, g_dec.ravel()])

    for order in (0, 1, 4, 10, 15):
        nside = 1 << order
        ring = _ang2pix_ring_np_oracle(ra, dec, nside)
        assert ring.min() >= 0 and ring.max() < 12 * nside * nside
        got = _ang2pix_nest_np(ra, dec, nside)
        want = _ring2nest_np(ring, nside)
        bad = np.nonzero(got != want)[0]
        assert bad.size == 0, (
            f"nside={nside}: {bad.size} disagreements, first at "
            f"ra={ra[bad[0]]} dec={dec[bad[0]]}: nest={got[bad[0]]} ring2nest={want[bad[0]]}"
        )


def test_healpix_nside1_base_pixel_geometry():
    """At nside=1 the 12 pixels ARE the base diamonds; their centers are
    analytically pinned by the published geometry (faces 0-3 at z=2/3,
    phi=45/135/225/315; faces 4-7 at z=0, phi=0/90/180/270; faces 8-11 at
    z=-2/3) — an absolute anchor independent of both code paths."""
    import numpy as np

    from hiss_cube_spark.functions.spatial import _ang2pix_nest_np

    z23 = np.degrees(np.arcsin(2.0 / 3.0))
    centers = (
        [(45.0 + 90.0 * k, z23) for k in range(4)]        # faces 0..3
        + [(0.0 + 90.0 * k, 0.0) for k in range(4)]        # faces 4..7
        + [(45.0 + 90.0 * k, -z23) for k in range(4)]      # faces 8..11
    )
    ra = np.array([c[0] for c in centers])
    dec = np.array([c[1] for c in centers])
    assert _ang2pix_nest_np(ra, dec, 1).tolist() == list(range(12))
