"""Subtractive-dither quantization for FITS tiled-image compression.

Clean-room implementation of the dithering scheme specified by the
registered FITS convention "Tiled Image Compression in FITS Binary Tables"
(Pence, Seaman & White 2013, §"Preserving the noise in floating point
images" / cfitsio's published quantize algorithm).  fpack compresses FLOAT
science frames by linearly quantizing each tile to int32 and *subtracting a
deterministic uniform dither* before rounding, so the quantization noise is
decorrelated from the signal; the decompressor must regenerate the exact
same pseudo-random stream to undo it.  The reference stack reads such files
transparently through fitsio (/root/reference/hisscube/utils/photometry.py:
18,31); this module completes the pure-python `.fits.fz` reader in
:mod:`hiss_cube_spark.sources.fits` (NO_DITHER tiles already decode there).

The published algorithm:

* a fixed table of ``N_RANDOM = 10000`` uniform values is generated once
  with the Park–Miller minimal-standard LCG (a=16807, m=2^31-1) seeded at
  1: ``seed = (a*seed) mod m; value = seed/m``.  The convention pins the
  final seed to 1043618065 as a build-time sanity check.
* for tile number ``T`` (1-based) under dither seed ``D`` (header card
  ZDITHER0, 1..10000): ``i0 = (T + D - 2) mod 10000`` and the stream
  starts at offset ``int(table[i0] * 500)``; when the offset reaches
  10000, ``i0`` advances by one (mod 10000) and the offset re-derives the
  same way.  One value is consumed per pixel, including null/zero pixels.
* quantize:   ``q = NINT((v - ZZERO)/ZSCALE + r - 0.5)``
  unquantize:  ``v = (q - r + 0.5)*ZSCALE + ZZERO``
  with NINT = round-half-away-from-zero, so |error| <= ZSCALE/2.
* ``SUBTRACTIVE_DITHER_2`` additionally preserves exact zeros: a source
  pixel of 0.0 stores the reserved integer ``ZERO_VALUE`` and restores to
  exactly 0.0 (the dither value is still consumed).  ``NULL_VALUE`` is the
  reserved integer for null (ZBLANK) pixels and restores to NaN.

All functions are numpy-vectorized per tile; the Spark ingest path runs
tiles inside mapInPandas batches, so decode is executor-parallel.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "N_RANDOM",
    "NULL_VALUE",
    "ZERO_VALUE",
    "rand_table",
    "tile_dither",
    "quantize_tile",
    "unquantize_tile",
]

N_RANDOM = 10000
NULL_VALUE = -2147483647  # reserved int32 for null (ZBLANK) pixels
ZERO_VALUE = -2147483646  # reserved int32 for exact 0.0 (DITHER_2)

_TABLE: np.ndarray | None = None


def rand_table() -> np.ndarray:
    """The convention's fixed 10000-entry uniform table (cached)."""
    global _TABLE
    if _TABLE is None:
        a, m = 16807.0, 2147483647.0
        seed = 1.0
        vals = np.empty(N_RANDOM, dtype=np.float64)
        for i in range(N_RANDOM):
            temp = a * seed
            seed = temp - m * float(int(temp / m))
            vals[i] = seed / m
        if seed != 1043618065.0:
            raise AssertionError(
                "dither LCG self-check failed: platform float arithmetic "
                f"diverged from the convention (final seed {seed!r})"
            )
        _TABLE = vals
    return _TABLE


def tile_dither(tile_num: int, dither_seed: int, npix: int) -> np.ndarray:
    """The ``npix`` dither values for 1-based tile ``tile_num``."""
    rv = rand_table()
    iseed = int((tile_num + dither_seed - 2) % N_RANDOM)
    nextrand = int(rv[iseed] * 500.0)
    out = np.empty(npix, dtype=np.float64)
    filled = 0
    while filled < npix:
        take = min(npix - filled, N_RANDOM - nextrand)
        out[filled : filled + take] = rv[nextrand : nextrand + take]
        filled += take
        nextrand += take
        if nextrand == N_RANDOM:
            iseed = (iseed + 1) % N_RANDOM
            nextrand = int(rv[iseed] * 500.0)
    return out


def _nint(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (the convention's NINT), as int64."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def quantize_tile(
    vals: np.ndarray,
    tile_num: int,
    dither_seed: int,
    zscale: float,
    zzero: float,
    method: str = "SUBTRACTIVE_DITHER_1",
) -> np.ndarray:
    """Float tile → dithered int32 codes (flat arrays, 1-based tile_num)."""
    v = np.asarray(vals, dtype=np.float64).ravel()
    r = tile_dither(tile_num, dither_seed, v.size)
    nul = ~np.isfinite(v)
    q = _nint((np.where(nul, 0.0, v) - zzero) / zscale + r - 0.5)
    q[nul] = NULL_VALUE
    if method == "SUBTRACTIVE_DITHER_2":
        q[(v == 0.0) & ~nul] = ZERO_VALUE
    return q.astype(np.int64)


def unquantize_tile(
    codes: np.ndarray,
    tile_num: int,
    dither_seed: int,
    zscale: float,
    zzero: float,
    method: str = "SUBTRACTIVE_DITHER_1",
) -> np.ndarray:
    """Dithered int codes → float64 tile values (flat arrays)."""
    q = np.asarray(codes, dtype=np.float64).ravel()
    r = tile_dither(tile_num, dither_seed, q.size)
    out = (q - r + 0.5) * zscale + zzero
    iq = np.asarray(codes, dtype=np.int64).ravel()
    out[iq == NULL_VALUE] = np.nan
    if method == "SUBTRACTIVE_DITHER_2":
        out[iq == ZERO_VALUE] = 0.0
    return out

from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
