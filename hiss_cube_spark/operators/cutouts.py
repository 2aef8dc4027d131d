"""Cutout reference generation + dereference (SURVEY.md J2 output, J5, P8).

The reference models a cutout as a portable tuple
``(ds_path, ds_slice_idx, x_min, x_max, y_min, y_max)``
(processors/metadata_strategy.py:27-30, utils/io_strategy.py:93-100) — i.e.
a foreign key + slice bounds. Here that is a struct column joined back to the
``images`` table; slicing is a native array expression (no region "pointers"
needed in a relational engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hiss_cube_spark.functions.arrays import slice_2d
from hiss_cube_spark.functions.wcs import world_to_pixel

__all__ = ["cutout_bounds", "is_cutout_whole", "dereference_cutouts"]


def cutout_bounds(
    wcs: Column, ra: Column, dec: Column, size: int
) -> tuple[Column, Column, Column, Column]:
    """(x_min, x_max, y_min, y_max) of a ``size``-px cutout centered on a
    world position (half-open, 0-based; ref astrometry.py:71-125 — 64 px at
    zoom 0, 64/2^z at lower zooms)."""
    x, y = world_to_pixel(wcs, ra, dec)
    half = size // 2
    x0 = (F.floor(x) - half).cast("int")
    y0 = (F.floor(y) - half).cast("int")
    return x0, x0 + size, y0, y0 + size


def is_cutout_whole(
    x_min: Column, x_max: Column, y_min: Column, y_max: Column, naxis1: Column, naxis2: Column
) -> Column:
    """Rectangle fully inside the image (ref is_cutout_whole,
    utils/astrometry.py:128-137; truth table pinned in
    tests/test_serial_builders.py:189-211)."""
    return (x_min >= 0) & (y_min >= 0) & (x_max <= naxis1) & (y_max <= naxis2)


def dereference_cutouts(
    refs: DataFrame,
    images: DataFrame,
    image_id: str = "image_id",
    data_col: str = "data",
    errors_col: str = "errors",
) -> DataFrame:
    """Join cutout refs to image pixel arrays and slice (J5 as join + expr).

    ``refs`` needs (image_id, x_min, x_max, y_min, y_max); output adds
    ``cutout_data`` / ``cutout_errors`` 2-D arrays. The join shuffles only
    the refs side if images are broadcast-able, else a key-partitioned
    sort-merge; the pixel slicing never leaves the JVM.

    When both sides carry ``zoom``, it joins on (image_id, zoom): a zoom-z
    ref dereferences the zoom-z pixel stack. Other columns duplicated on the
    image side are dropped (the ref side is authoritative).
    """
    keys = [image_id] + (["zoom"] if "zoom" in refs.columns and "zoom" in images.columns else [])
    dup = [c for c in images.columns if c in refs.columns and c not in keys]
    j = refs.join(images.drop(*dup), keys)
    return j.withColumn(
        "cutout_data",
        slice_2d(F.col(data_col), F.col("y_min"), F.col("y_max"), F.col("x_min"), F.col("x_max")),
    ).withColumn(
        "cutout_errors",
        slice_2d(F.col(errors_col), F.col("y_min"), F.col("y_max"), F.col("x_min"), F.col("x_max")),
    ).drop(data_col, errors_col)
