"""Spatial indexing: equiangular grid cells (native exprs) + nested HEALPix.

The reference indexes observations by HEALPix id and probes a sorted index
with binary search (ref: hisscube/utils/astrometry.py:158-182,
metadata_strategy_dataset.py:154-156). In Spark the index column + an
equi-join replaces the probe. Two index families:

* **grid**: an equiangular (ra, dec) grid. Pure native Column expressions —
  SQL-expressible, codegen'd, usable in the DuckDB-oracle parity suite.
* **healpix**: nested-scheme HEALPix ang2pix implemented in pure numpy as a
  pandas UDF (healpy is not available in this container; the algorithm is the
  standard one from the HEALPix paper, Górski et al. 2005). Used for parity
  with the reference's spatial semantics.

Disc covers are *supersets* of the exact disc; every cross-match applies an
exact distance post-filter, so over-coverage only costs a few candidate rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "grid_cell",
    "grid_disc_cells",
    "sphere_dist_deg",
    "healpix_ang2pix_nest",
    "healpix_disc_cover",
    "grid_ncols",
]


# --------------------------------------------------------------------------
# Equiangular grid index (native expressions)
# --------------------------------------------------------------------------

def grid_ncols(cell_deg: float) -> int:
    """Number of ra columns for a given cell size."""
    return int(math.ceil(360.0 / cell_deg))


def grid_cell(ra: Column, dec: Column, cell_deg: float) -> Column:
    """Cell id of a point on an equiangular (ra, dec) grid.

    ``cell = row * ncols + col`` with ``row = floor((dec+90)/s)`` and
    ``col = floor(pmod(ra,360)/s)``. Native expressions only — stays inside
    whole-stage codegen and is reproducible in ANSI SQL for the oracle.
    """
    ncols = grid_ncols(cell_deg)
    row = F.floor((dec + F.lit(90.0)) / F.lit(cell_deg))
    col = F.floor(F.pmod(ra, F.lit(360.0)) / F.lit(cell_deg))
    return (row * F.lit(ncols) + col).cast("long")


def grid_disc_cells(ra: Column, dec: Column, radius_deg: float, cell_deg: float) -> Column:
    """Array of grid cell ids covering a disc (superset cover), native exprs.

    Covers the bounding box [dec±r] × [ra±r] of the disc; ra columns wrap via
    pmod, dec rows clamp at the poles. With ``radius <= cell_deg`` this is at
    most a 3×3 neighborhood. Equivalent of the reference's
    ``get_overlapping_healpix_pixel_ids`` (astrometry.py:158-182) for the grid
    index family.

    Pole caveat: within ``radius`` of a pole the ra bounding box understates
    the true cover (all ra columns of the polar row would be needed) — use
    the HEALPix family (:func:`healpix_disc_cover`) for polar workloads; the
    equiangular grid is the equatorial/oracle-parity index.
    """
    ncols = grid_ncols(cell_deg)
    nrows = int(math.ceil(180.0 / cell_deg))
    r = F.lit(float(radius_deg))
    s = F.lit(float(cell_deg))
    row_lo = F.greatest(F.floor((dec - r + F.lit(90.0)) / s), F.lit(0))
    row_hi = F.least(F.floor((dec + r + F.lit(90.0)) / s), F.lit(nrows - 1))
    col_lo = F.floor((F.pmod(ra, F.lit(360.0)) - r) / s)
    col_hi = F.floor((F.pmod(ra, F.lit(360.0)) + r) / s)
    cells = F.flatten(
        F.transform(
            F.sequence(row_lo, row_hi),
            lambda rw: F.transform(
                F.sequence(col_lo, col_hi),
                lambda c: (rw * F.lit(ncols) + F.pmod(c, F.lit(ncols))).cast("long"),
            ),
        )
    )
    return F.array_distinct(cells)


def sphere_dist_deg(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Planar angular distance with ra wraparound, in degrees.

    ``sqrt(min(|Δra|, 360-|Δra|)² + Δdec²)`` — the small-angle metric the
    cross-match post-filter uses. Exact spherical separation (haversine) is
    available via :func:`haversine_deg`; the reference's own containment test
    is likewise planar in pixel space (astrometry.py:96-137).
    """
    dra = F.abs(ra1 - ra2)
    dra = F.least(dra, F.lit(360.0) - dra)
    ddec = dec1 - dec2
    return F.sqrt(dra * dra + ddec * ddec)


def haversine_deg(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Great-circle separation in degrees (haversine, numerically stable)."""
    to_rad = F.lit(math.pi / 180.0)
    phi1, phi2 = dec1 * to_rad, dec2 * to_rad
    dphi = (dec2 - dec1) * to_rad
    dlmb = (ra2 - ra1) * to_rad
    a = F.sin(dphi / 2) ** 2 + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) ** 2
    return F.lit(2.0) * F.asin(F.sqrt(a)) / to_rad


# --------------------------------------------------------------------------
# Nested HEALPix (pure numpy; pandas UDFs)
# --------------------------------------------------------------------------

def _ang2pix_nest_np(ra_deg: np.ndarray, dec_deg: np.ndarray, nside: int) -> np.ndarray:
    """Vectorized nested-scheme ang2pix (Górski et al. 2005 algorithm).

    Mirrors the semantics of healpy.ang2pix(nside, ra, dec, nest=True,
    lonlat=True) as used at reference metadata_strategy_dataset.py:154-156.
    """
    ra = np.mod(np.asarray(ra_deg, dtype=np.float64), 360.0)
    dec = np.asarray(dec_deg, dtype=np.float64)
    z = np.sin(np.deg2rad(dec))
    za = np.abs(z)
    tt = np.mod(ra / 90.0, 4.0)  # phi / (pi/2) in [0, 4)

    ix = np.empty(ra.shape, dtype=np.int64)
    iy = np.empty(ra.shape, dtype=np.int64)
    face = np.empty(ra.shape, dtype=np.int64)

    eq = za <= 2.0 / 3.0
    if np.any(eq):
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * z[eq] * 0.75
        jp = (temp1 - temp2).astype(np.int64)  # ascending edge index
        jm = (temp1 + temp2).astype(np.int64)  # descending edge index
        ifp = jp >> int(np.log2(nside)) if nside > 1 else jp
        ifm = jm >> int(np.log2(nside)) if nside > 1 else jm
        f = np.where(
            ifp == ifm,
            (ifp & 3) + 4,
            np.where(ifp < ifm, ifp & 3, (ifm & 3) + 8),
        )
        face[eq] = f
        ix[eq] = jm & (nside - 1)
        iy[eq] = nside - (jp & (nside - 1)) - 1

    po = ~eq
    if np.any(po):
        ntt = np.minimum(tt[po].astype(np.int64), 3)
        tp = tt[po] - ntt
        tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
        jp = np.minimum((tp * tmp).astype(np.int64), nside - 1)
        jm = np.minimum(((1.0 - tp) * tmp).astype(np.int64), nside - 1)
        north = z[po] >= 0
        face[po] = np.where(north, ntt, ntt + 8)
        ix[po] = np.where(north, nside - jm - 1, jp)
        iy[po] = np.where(north, nside - jp - 1, jm)

    return face * nside * nside + _interleave_bits(ix, iy)


def _interleave_bits(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Morton-interleave ix (even bits) and iy (odd bits)."""
    out = np.zeros_like(ix)
    for b in range(32):
        out |= ((ix >> b) & 1) << (2 * b)
        out |= ((iy >> b) & 1) << (2 * b + 1)
    return out


def _deinterleave_bits(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`_interleave_bits`."""
    ix = np.zeros_like(p)
    iy = np.zeros_like(p)
    for b in range(32):
        ix |= ((p >> (2 * b)) & 1) << b
        iy |= ((p >> (2 * b + 1)) & 1) << b
    return ix, iy


# Face rows / longitude offsets of the 12 base pixels (Górski et al. 2005).
_JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4], dtype=np.int64)
_JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7], dtype=np.int64)


def _pix2ang_nest_np(pix: np.ndarray, nside: int) -> tuple[np.ndarray, np.ndarray]:
    """Pixel-center (ra_deg, dec_deg) of nested ids — inverse of
    :func:`_ang2pix_nest_np` (mirrors healpy.pix2ang(..., nest=True,
    lonlat=True) semantics)."""
    p = np.asarray(pix, dtype=np.int64)
    npface = nside * nside
    face = p // npface
    ix, iy = _deinterleave_bits(p % npface)

    jr = _JRLL[face] * nside - ix - iy - 1  # ring index, 1 .. 4*nside-1
    north = jr < nside
    south = jr > 3 * nside
    eq = ~(north | south)

    nr = np.full(p.shape, nside, dtype=np.int64)
    z = np.empty(p.shape, dtype=np.float64)
    kshift = np.zeros(p.shape, dtype=np.int64)

    nr[north] = jr[north]
    z[north] = 1.0 - (nr[north] * nr[north]) / (3.0 * npface)
    nr[south] = 4 * nside - jr[south]
    z[south] = (nr[south] * nr[south]) / (3.0 * npface) - 1.0
    z[eq] = (2 * nside - jr[eq]) * 2.0 / (3.0 * nside)
    kshift[eq] = (jr[eq] - nside) & 1

    jp = (_JPLL[face] * nr + ix - iy + 1 + kshift) // 2
    jp = np.where(jp > 4 * nside, jp - 4 * nside, jp)
    jp = np.where(jp < 1, jp + 4 * nside, jp)
    phi = (jp - (kshift + 1) * 0.5) * (np.pi / 2.0) / nr

    ra = np.mod(np.degrees(phi), 360.0)
    dec = np.degrees(np.arcsin(np.clip(z, -1.0, 1.0)))
    return ra, dec


def healpix_pix2ang_nest(pix: Column, order: int) -> Column:
    """Pixel-center (ra, dec) struct for nested ids at ``order`` — the
    healpy.pix2ang(nest=True, lonlat=True) analog (pandas UDF)."""
    nside = 1 << order

    @F.pandas_udf("ra double, dec double")
    def _udf(p_s: pd.Series) -> pd.DataFrame:
        ra, dec = _pix2ang_nest_np(p_s.to_numpy(), nside)
        return pd.DataFrame({"ra": ra, "dec": dec})

    return _udf(pix)


def healpix_ang2pix_nest(ra: Column, dec: Column, order: int) -> Column:
    """Nested HEALPix pixel id at ``order`` (nside = 2**order), pandas UDF.

    The reference computes this with healpy at order IMG_SPAT_INDEX_ORDER-1=10
    for images and 15 for spectra (FIXTURES.md §1–2, config.ini:17-18).
    """
    nside = 1 << order

    @F.pandas_udf(LongType())
    def _udf(ra_s: pd.Series, dec_s: pd.Series) -> pd.Series:
        return pd.Series(_ang2pix_nest_np(ra_s.to_numpy(), dec_s.to_numpy(), nside))

    return _udf(ra, dec)


def healpix_disc_cover(ra: Column, dec: Column, radius_deg: float, order: int) -> Column:
    """Superset disc cover in nested HEALPix ids, pandas UDF → array<long>.

    Samples the disc (center + boundary rings at step < pixel size / 2) and
    collects distinct pixel ids — a guaranteed superset once the cross-match
    post-filter is applied, mirroring query_disc(inclusive=True) usage at
    reference astrometry.py:158-182.
    """
    nside = 1 << order
    # HEALPix pixel angular size ≈ 58.6°/nside; sample at a third of it.
    pix_deg = 58.6323 / nside
    step = max(min(pix_deg / 3.0, radius_deg / 2.0), 1e-6)
    n_ring = max(int(math.ceil(radius_deg / step)), 1)
    pad = radius_deg + pix_deg  # inclusive: pad by one pixel size

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(ra_s: pd.Series, dec_s: pd.Series) -> pd.Series:
        ra0 = ra_s.to_numpy(dtype=np.float64)
        dec0 = dec_s.to_numpy(dtype=np.float64)
        out = []
        # Offsets: concentric rings out to radius+pad.
        offs = [(0.0, 0.0)]
        for i in range(1, n_ring + 2):
            rr = min(i * step, pad)
            n_pts = max(8, int(2 * math.pi * rr / step))
            for k in range(n_pts):
                a = 2 * math.pi * k / n_pts
                offs.append((rr * math.cos(a), rr * math.sin(a)))
            if rr >= pad:
                break
        offs_np = np.array(offs)
        # Any pixel intersecting the disc has its center within
        # radius + max_pixrad; 1.3×pix_deg safely bounds max_pixrad at every
        # nside, so the center-distance trim keeps the superset guarantee
        # while dropping the sampling overshoot ring.
        keep_r = math.radians(radius_deg + 1.3 * pix_deg)
        for r0, d0 in zip(ra0, dec0):
            cosd = max(math.cos(math.radians(d0)), 1e-9)
            ras = r0 + offs_np[:, 0] / cosd
            decs = np.clip(d0 + offs_np[:, 1], -90.0 + 1e-9, 90.0 - 1e-9)
            ids = np.unique(_ang2pix_nest_np(ras, decs, nside))
            cra, cdec = _pix2ang_nest_np(ids, nside)
            sd = np.sin(np.radians((cdec - d0) / 2.0))
            sr = np.sin(np.radians((cra - r0) / 2.0))
            h = sd * sd + math.cos(math.radians(d0)) * np.cos(np.radians(cdec)) * sr * sr
            dist = 2.0 * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))
            out.append(ids[dist <= keep_r].tolist())
        return pd.Series(out)

    return _udf(ra, dec)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of two non-negative ints — native exprs.

    The multi-dimensional clustering key for bronze layout: sorting by
    ``zorder_key(healpix_low_bits, time_bucket)`` keeps both dimensions
    local within parquet row groups (min/max pruning on either predicate),
    the distributed analog of the reference's (spatial, time) index sort
    (metadata_strategy_image.py:351-355).
    """
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out
