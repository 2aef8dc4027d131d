"""Visualization cube — per-zoom point table + exports (SURVEY.md §3.3).

Reference: DatasetVisualizationProcessorStrategy
(metadata_strategy_cube_visualization.py:41-55,323-394): for each zoom emit
one row per spectrum sample (F17) and one row per linked-cutout pixel with
computed per-pixel (ra, dec) (F18), record shape
(heal_id, ra, dec, time, wl, mean, sigma, …) (:31-36).

Spark: two pure select/explode pipelines union'd — embarrassingly parallel,
the biggest-row-count query in the system (276,100 rows from 11 spectra at
the reference's fixture scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hiss_cube_spark.functions.wcs import pixel_to_world
from hiss_cube_spark.operators.cutouts import dereference_cutouts

__all__ = ["spectra_point_table", "cutout_point_table", "build_visualization_cube"]


def _basename32(df: DataFrame, col: str = "path") -> Column:
    """fits_name: path basename truncated to 32 chars (the reference's S32
    cast, cube_visualization.py:170,350-352); null when no path column."""
    if col in df.columns:
        return F.substring(F.element_at(F.split(F.col(col), "/"), -1), 1, 32)
    return F.lit(None).cast("string")


def spectra_point_table(spectra: DataFrame) -> DataFrame:
    """Unpivot spectra: one row per (spectrum, sample) (F17).

    Input: (spec_id, healpix, plug_ra, plug_dec, time, zoom, wl array,
    flux_mean array, flux_sigma array)."""
    z = F.arrays_zip("wl", "flux_mean", "flux_sigma")
    spec_name = _basename32(spectra)
    return spectra.select(
        F.col("healpix").alias("heal_id"),
        F.col("plug_ra").cast("float").alias("ra"),
        F.col("plug_dec").cast("float").alias("dec"),
        F.col("time").cast("float").alias("time"),
        "zoom",
        F.col("spec_id"),
        F.col("plug_ra").cast("float").alias("spec_ra"),
        F.col("plug_dec").cast("float").alias("spec_dec"),
        spec_name.alias("fits_name"),       # a spectrum sample's own file
        spec_name.alias("spec_fits_name"),
        F.explode(z).alias("_s"),
    ).select(
        "heal_id",
        "ra",
        "dec",
        "time",
        "zoom",
        "spec_id",
        F.col("_s.wl").cast("float").alias("wl"),
        F.col("_s.flux_mean").cast("float").alias("mean"),
        F.col("_s.flux_sigma").cast("float").alias("sigma"),
        "spec_ra",
        "spec_dec",
        "fits_name",
        "spec_fits_name",
    )


def cutout_point_table(
    refs: DataFrame,
    images: DataFrame,
    spectra: DataFrame,
    tiles: DataFrame | None = None,
    tile: int = 256,
) -> DataFrame:
    """Unpivot linked cutouts: one row per cutout pixel with per-pixel
    world coordinates (F18; ref cube_visualization.py:147-188).

    Pixel (ra, dec) comes from the linear WCS forward transform — all native
    expressions over a double posexplode (rows, then columns).

    With ``tiles``, pixels come from the tiled raster table (≤4 covering
    tiles per cutout) and ``images`` contributes ONLY scalar metadata
    (wcs/tai_time/path — a column-pruned join that never touches frame
    payloads).
    """
    # one metadata row per spectrum (the input carries one row per zoom)
    spec_meta = spectra.select(
        "spec_id",
        F.col("healpix").alias("heal_id"),
        F.col("plug_ra").cast("float").alias("spec_ra"),
        F.col("plug_dec").cast("float").alias("spec_dec"),
        F.col("time").alias("spec_time"),
        _basename32(spectra).alias("spec_fits_name"),
    ).dropDuplicates(["spec_id"])
    img_cols = ["image_id", "zoom", "wcs", "tai_time", "data", "errors"] + (
        ["path"] if "path" in images.columns else []
    )
    if tiles is not None:
        from hiss_cube_spark.operators.tiles import dereference_cutouts_tiled

        meta_cols = [c for c in img_cols if c not in ("data", "errors")]
        meta = images.select(*meta_cols)
        # ref side authoritative on shared columns, like dereference_cutouts
        dup = [
            c for c in meta.columns
            if c in refs.columns and c not in ("image_id", "zoom")
        ]
        enriched = refs.join(meta.drop(*dup), ["image_id", "zoom"])
        cut = dereference_cutouts_tiled(enriched, tiles, tile=tile)
    else:
        cut = dereference_cutouts(refs, images.select(*img_cols))
    # Pair mean/sigma row-wise first so both posexplodes stay aligned.
    paired = cut.withColumn(
        "_rows",
        F.zip_with(
            "cutout_data", "cutout_errors", lambda d, e: F.struct(d.alias("m"), e.alias("s"))
        ),
    )
    paired = paired.withColumn("fits_name", _basename32(paired))
    keys = [
        "spec_id", "image_id", "zoom", "band", "wl", "x_min", "y_min", "wcs",
        "tai_time", "fits_name",
    ]
    rows = (
        paired.select(*keys, F.posexplode("_rows").alias("_iy", "_rp"))
        .select(
            *keys,
            "_iy",
            F.posexplode(F.arrays_zip(F.col("_rp.m"), F.col("_rp.s"))).alias("_ix", "_px"),
        )
    )
    ra, dec = pixel_to_world(
        F.col("wcs"),
        (F.col("x_min") + F.col("_ix")).cast("double"),
        (F.col("y_min") + F.col("_iy")).cast("double"),
    )
    return rows.join(spec_meta, "spec_id").select(
        "heal_id",
        ra.cast("float").alias("ra"),
        dec.cast("float").alias("dec"),
        F.col("tai_time").cast("float").alias("time"),
        "zoom",
        F.col("spec_id"),
        F.col("wl").cast("float").alias("wl"),
        F.col("_px.m").cast("float").alias("mean"),
        F.col("_px.s").cast("float").alias("sigma"),
        "spec_ra",
        "spec_dec",
        "fits_name",
        "spec_fits_name",
    )


def build_visualization_cube(
    spectra: DataFrame,
    refs: DataFrame,
    images: DataFrame,
    tiles: DataFrame | None = None,
    tile: int = 256,
) -> DataFrame:
    """Union of spectrum samples and cutout pixels per zoom (§3.3) —
    ``unionByName`` of two explode pipelines."""
    sp = spectra_point_table(spectra)
    cp = cutout_point_table(refs, images, spectra, tiles=tiles, tile=tile)
    return sp.unionByName(cp)
