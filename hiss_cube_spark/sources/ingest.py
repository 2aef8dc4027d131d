"""Observation ingest: FITS bytes → bronze rows (single-object API + bulk).

Mirrors the reference's SingleImageBuilder / SingleSpectrumBuilder
(builders.py:36-123): one file → metadata + uncertainties + multi-resolution
pyramid → one bronze row per zoom. The bulk path is the same kernel inside
``mapInPandas`` over a ``binaryFile`` scan.

Header vocabulary used (FIXTURES.md §3): images
{RUN, CAMCOL, FILTER, TAI, NAXIS1, NAXIS2, CRPIX1/2, CD1_1..CD2_2,
CRVAL1/2, CTYPE1/2}; spectra {PLUG_RA, PLUG_DEC, TAI, MJD, PLATEID, FIBERID}.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# everything an executor-run kernel touches imports at MODULE level:
# a lazy `from hiss_cube_spark...` inside a mapInPandas-called function
# dies with ModuleNotFoundError on workers when the driver runs outside
# the repo (the package ships by-value via _serde cloudpickle
# registration; import statements inside the function body bypass it)
from hiss_cube_spark.functions.pyramid import downsample_image, downsample_spectrum
from hiss_cube_spark.functions.spatial import _ang2pix_nest_np
from hiss_cube_spark.sources.fits import (
    parse_fits_bintable,
    parse_fits_header,
    parse_fits_image,
)
from hiss_cube_spark.sources.photometry_ingest import (
    rebin_spectrum,
    spectrum_physical_units,
)

__all__ = [
    "image_rows_from_fits", "ingest_images", "spectrum_rows_from_fits",
    "ingest_spectra", "ingest_one", "overwrite_one", "IMG_SPAT_ORDER",
]

IMG_SPAT_ORDER = 10  # nside 2^10, ref config IMG_SPAT_INDEX_ORDER=11 → order-1

_FILTER_WL = {"u": 3551, "g": 4686, "r": 6166, "i": 7480, "z": 8932}


def image_rows_from_fits(
    content: bytes,
    path: str = "",
    zooms: int = 5,
    error_fraction: float = 0.05,
) -> list[dict]:
    """One FITS image → one bronze-row dict per zoom (single-object ingest).

    Without a sky/calib HDU pair the uncertainty falls back to a flat
    fractional error; pass real frames through
    ``photometry_ingest.derive_image_uncertainty`` upstream for the full S5
    derivation.
    """
    header, data = parse_fits_image(content)
    if data is None:
        raise ValueError(f"not a 2-D image HDU: {path}")
    errors = np.abs(data) * np.float32(error_fraction) + np.float32(1e-6)
    band = str(header.get("FILTER", "r")).strip() or "r"
    ra = float(header.get("CRVAL1", 0.0))
    dec = float(header.get("CRVAL2", 0.0))
    healpix = int(_ang2pix_nest_np(np.array([ra]), np.array([dec]), 1 << IMG_SPAT_ORDER)[0])
    rows = []
    d, e = data, errors
    for z in range(zooms):
        h, w = d.shape
        rows.append(
            {
                "path": path,
                "run": int(header.get("RUN", 0)),
                "camcol": int(header.get("CAMCOL", 0)),
                "band": band,
                "wl": _FILTER_WL.get(band, 0),
                "tai_time": float(header.get("TAI", 0.0)),
                "ra": ra,
                "dec": dec,
                "healpix": healpix,
                "zoom": z,
                "naxis1": w,
                "naxis2": h,
                # FITS CRPIX is 1-based; the engine's WCS struct is 0-based
                # (functions/wcs.py) — convert at the boundary
                "wcs": {
                    "crpix1": ((float(header["CRPIX1"]) - 1.0) if "CRPIX1" in header else w / 2)
                    / (1 << z),
                    "crpix2": ((float(header["CRPIX2"]) - 1.0) if "CRPIX2" in header else h / 2)
                    / (1 << z),
                    "cd1_1": float(header.get("CD1_1", 1e-4)) * (1 << z),
                    "cd1_2": float(header.get("CD1_2", 0.0)) * (1 << z),
                    "cd2_1": float(header.get("CD2_1", 0.0)) * (1 << z),
                    "cd2_2": float(header.get("CD2_2", 1e-4)) * (1 << z),
                    "crval1": ra,
                    "crval2": dec,
                    "ctype1": str(header.get("CTYPE1", "RA---TAN")),
                    "ctype2": str(header.get("CTYPE2", "DEC--TAN")),
                },
                "header": json.dumps(header, default=str),
                # list of 1-D float32 row arrays: Arrow converts numpy rows
                # ~30x faster than nested python lists (3M boxed floats per
                # full-size frame dominated ingest before)
                "data": list(np.ascontiguousarray(d)),
                "errors": list(np.ascontiguousarray(e)),
            }
        )
        if z < zooms - 1:
            d, e = downsample_image(d, e)
    return rows


_IMG_SCHEMA = (
    "path string, run int, camcol int, band string, wl int, tai_time double, "
    "ra double, dec double, healpix long, zoom int, naxis1 int, naxis2 int, "
    "wcs struct<crpix1:double, crpix2:double, cd1_1:double, cd1_2:double, "
    "cd2_1:double, cd2_2:double, crval1:double, crval2:double, "
    "ctype1:string, ctype2:string>, header string, "
    "data array<array<float>>, errors array<array<float>>"
)


def _binary_scan(
    spark: SparkSession,
    directory: str,
    pattern: str,
    paths: list[str] | None = None,
) -> DataFrame:
    """binaryFile scan: glob-over-directory, or an explicit path list (the
    CSV-driven S2/S3 scans resolve their lists to paths first — the
    reference expands CSV rows to per-row globs the same way,
    processors/metadata.py:132-160)."""
    reader = spark.read.format("binaryFile")
    if paths is not None:
        if not paths:
            raise ValueError("empty path list for binary scan")
        return reader.load(list(paths)).select("path", "content")
    return (
        reader.option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(directory)
        .select("path", "content")
    )


def ingest_images(
    spark: SparkSession, directory: str, pattern: str = "*.fits*", zooms: int = 5,
    paths: list[str] | None = None, limit: int | None = None,
) -> DataFrame:
    """Bulk image ingest: binaryFile scan → per-batch pyramid build.

    ``limit`` caps the FILE count (config.ini Writer.LIMIT_IMAGE_COUNT);
    deterministic first-N in path order — the reference truncates its
    walked path list the same way, just in walk order.

    The image_id is assigned after the parallel parse (dense ids via
    zipWithIndex-free hash of path — stable and shuffle-free)."""
    from pyspark.sql import functions as F

    files = _binary_scan(spark, directory, pattern, paths)
    if limit is not None:
        files = files.orderBy("path").limit(limit)

    cols = [
        "path", "run", "camcol", "band", "wl", "tai_time", "ra", "dec",
        "healpix", "zoom", "naxis1", "naxis2", "wcs", "header", "data", "errors",
    ]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(image_rows_from_fits(bytes(content), path, zooms))
                except Exception:
                    continue  # corrupt file: skipped here, logged by S4 scan
            yield pd.DataFrame(out, columns=cols)

    parsed = files.mapInPandas(_parse, schema=_IMG_SCHEMA)
    # stable image id from the path digest (no global counter → no driver sync)
    return parsed.withColumn("image_id", F.xxhash64("path"))


# --------------------------------------------------------------------------
# Spectrum ingest (S6): BINTABLE HDU → physical units → rebin → pyramid
# --------------------------------------------------------------------------

SPEC_SPAT_ORDER = 15  # ref config SPEC_SPAT_INDEX_ORDER-1 (config.ini:18)
REBIN_GRID = (3839.7244, 8914.597, 4620)  # ref config.ini:76-78


def spectrum_rows_from_fits(
    content: bytes,
    path: str = "",
    zooms: int = 5,
    rebin_samples: int | None = None,
) -> list[dict]:
    """One spectrum FITS (BINTABLE HDU1: loglam/flux/ivar) → one bronze row
    per zoom: physical units (photometry.py:105-108), rebin onto the fixed
    survey grid (photometry.py:343-350), Gaussian pyramid (σ/2 per level)."""
    header = parse_fits_header(content)
    cols = parse_fits_bintable(content, hdu_index=1)
    wl, flux, sigma = spectrum_physical_units(
        np.asarray(cols["loglam"], dtype=np.float64),
        np.asarray(cols["flux"], dtype=np.float64),
        np.asarray(cols["ivar"], dtype=np.float64),
    )
    lo, hi, n0 = REBIN_GRID
    n0 = rebin_samples or n0
    grid = np.linspace(lo, hi, n0)
    f, s = rebin_spectrum(wl, flux, sigma, grid)
    ra = float(header.get("PLUG_RA", header.get("RA", 0.0)))
    dec = float(header.get("PLUG_DEC", header.get("DEC", 0.0)))
    time = float(header.get("TAI", header.get("MJD", 0.0)))
    healpix = int(_ang2pix_nest_np(np.array([ra]), np.array([dec]), 1 << SPEC_SPAT_ORDER)[0])
    rows = []
    w, fl, sg = grid, f, s
    for z in range(zooms):
        rows.append(
            {
                "path": path,
                "plateid": int(header.get("PLATEID", 0)),
                "mjd": int(header.get("MJD", 0)),
                "fiberid": int(header.get("FIBERID", 0)),
                "plug_ra": ra,
                "plug_dec": dec,
                "healpix": healpix,
                "time": time,
                "zoom": z,
                "wl": np.asarray(w, dtype=np.float32),
                "flux_mean": np.asarray(fl, dtype=np.float32),
                "flux_sigma": np.asarray(sg, dtype=np.float32),
            }
        )
        if z < zooms - 1:
            w, fl, sg = downsample_spectrum(np.asarray(w, dtype=np.float64), fl, sg)
    return rows


_SPEC_SCHEMA = (
    "path string, plateid int, mjd int, fiberid int, plug_ra double, "
    "plug_dec double, healpix long, time double, zoom int, wl array<float>, "
    "flux_mean array<float>, flux_sigma array<float>"
)


def ingest_spectra(
    spark: SparkSession, directory: str, pattern: str = "*.fits*",
    zooms: int = 5, rebin_samples: int | None = None,
    paths: list[str] | None = None, limit: int | None = None,
) -> DataFrame:
    """Bulk spectrum ingest: binaryFile scan → mapInPandas kernel.

    ``limit`` caps the FILE count (Writer.LIMIT_SPECTRA_COUNT),
    deterministic first-N in path order."""
    from pyspark.sql import functions as F

    files = _binary_scan(spark, directory, pattern, paths)
    if limit is not None:
        files = files.orderBy("path").limit(limit)
    cols = [
        "path", "plateid", "mjd", "fiberid", "plug_ra", "plug_dec",
        "healpix", "time", "zoom", "wl", "flux_mean", "flux_sigma",
    ]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(
                        spectrum_rows_from_fits(bytes(content), path, zooms, rebin_samples)
                    )
                except Exception:
                    continue
            yield pd.DataFrame(out, columns=cols)

    parsed = files.mapInPandas(_parse, schema=_SPEC_SCHEMA)
    return parsed.withColumn("spec_id", F.xxhash64("path"))


# --------------------------------------------------------------------------
# Single-object ingest (ref SingleImageBuilder / SingleSpectrumBuilder,
# builders.py:36-123): one FITS → all-zoom bronze rows appended to the
# warehouse table. Duplicate insert raises, mirroring the reference's
# duplicate-spatial-index AssertionError (tests/test_serial_builders.py:
# 108-116); ``overwrite_one`` is the idempotent variant.
# --------------------------------------------------------------------------


def _one_file_rows(
    spark: SparkSession, path: str, kind: str, zooms: int,
    rebin_samples: int | None,
) -> tuple[str, DataFrame]:
    """Parse ONE observation file → (table name, all-zoom rows DataFrame).

    The file bytes come back through the JVM's Hadoop FS layer (so any
    warehouse-reachable URI works), and the parse runs on the driver —
    deliberate: this is the serial maintenance API for appending a single
    observation, the reference's serial-builder cost model. Bulk loads go
    through ``ingest_images``/``ingest_spectra`` (executor-side parse)."""
    from pyspark.sql import functions as F

    row = (
        spark.read.format("binaryFile").load(path)
        .select("path", "content").head()
    )
    if row is None:
        raise FileNotFoundError(path)
    content, full_path = bytes(row["content"]), row["path"]
    if kind == "auto":
        from hiss_cube_spark.sources.fits import (
            maybe_decompress,
            read_fits_bytes_header,
        )

        hdr, _ = read_fits_bytes_header(maybe_decompress(content), 0)
        # spectrum files carry the plug coordinates in an NAXIS=0 primary
        # header; image frames are 2-D primary HDUs
        kind = "spectrum" if int(hdr.get("NAXIS", 0)) == 0 else "image"
    def _plain(v):
        # createDataFrame wants python-native containers, not ndarrays
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, dict):
            return {k: _plain(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [_plain(x) for x in v]
        return v

    if kind == "image":
        rows = image_rows_from_fits(content, full_path, zooms)
        df = spark.createDataFrame([_plain(r) for r in rows], schema=_IMG_SCHEMA)
        return "images", df.withColumn("image_id", F.xxhash64("path"))
    if kind == "spectrum":
        rows = spectrum_rows_from_fits(content, full_path, zooms, rebin_samples)
        df = spark.createDataFrame([_plain(r) for r in rows], schema=_SPEC_SCHEMA)
        return "spectra", df.withColumn("spec_id", F.xxhash64("path"))
    raise ValueError(f"kind must be image|spectrum|auto, got {kind!r}")


def ingest_one(
    spark: SparkSession,
    path: str,
    warehouse: str,
    kind: str = "auto",
    zooms: int = 5,
    rebin_samples: int | None = None,
) -> str:
    """Append ONE observation to the warehouse; returns the table written.

    Raises ``ValueError`` if the path is already ingested (the reference's
    duplicate-insert contract). The append lands in the existing
    ``zoom=N`` partition directories; per-file healpix clustering of the
    bulk sink is not disturbed (one extra file per zoom partition)."""
    import os

    from pyspark.sql import functions as F

    from pyspark.errors import AnalysisException

    table, df = _one_file_rows(spark, path, kind, zooms, rebin_samples)
    tpath = os.path.join(warehouse, table)
    new_path = df.select("path").head()["path"]
    try:
        existing = spark.read.parquet(tpath)
        dup = existing.where(F.col("path") == new_path).limit(1).count()
    except AnalysisException:
        # table absent: first object creates it. Only the path-not-found
        # case may disable the duplicate guard — a corrupt footer or a
        # permission error must propagate, not silently append a dup
        # (ADVICE r7).
        dup = 0
    if dup:
        raise ValueError(
            f"{new_path} already ingested into {tpath}; use overwrite_one "
            "for idempotent re-ingest (ref duplicate-insert contract, "
            "tests/test_serial_builders.py:108-116)"
        )
    df.write.mode("append").partitionBy("zoom").parquet(tpath)
    return table


def overwrite_one(
    spark: SparkSession,
    path: str,
    warehouse: str,
    kind: str = "auto",
    zooms: int = 5,
    rebin_samples: int | None = None,
) -> str:
    """Idempotent single-observation re-ingest: replaces any existing rows
    for the same path, inserts if absent.

    Parquet has no row-level delete, so replacement rewrites the table
    minus the old rows through a temp directory and swaps — correct and
    atomic-enough for the serial maintenance API this is; a high-churn
    update workload belongs on the manifest snapshot store
    (``streaming/manifest.py``), not on raw parquet."""
    import os
    import shutil

    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    table, df = _one_file_rows(spark, path, kind, zooms, rebin_samples)
    tpath = os.path.join(warehouse, table)
    new_path = df.select("path").head()["path"]
    try:
        existing = spark.read.parquet(tpath)
        has_old = existing.where(F.col("path") == new_path).limit(1).count()
    except AnalysisException:
        # only "table absent" means insert-fresh; other read errors propagate
        existing, has_old = None, 0
    if not has_old:
        df.write.mode("append").partitionBy("zoom").parquet(tpath)
        return table
    tmp = tpath + "__rewrite_tmp"
    kept_cols = existing.columns
    (
        existing.where(F.col("path") != new_path)
        .unionByName(df.select(*kept_cols))
        .write.mode("overwrite").partitionBy("zoom").parquet(tmp)
    )
    shutil.rmtree(tpath)
    os.replace(tmp, tpath)
    return table


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
