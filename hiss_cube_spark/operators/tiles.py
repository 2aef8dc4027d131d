"""Tiled raster storage (SURVEY.md §7.4 hard part 1).

A zoom-0 reference frame is 2048×1489×2 float32 ≈ 24 MB per row — workable
but hostile to shuffles and memory. The tiled layout stores one row per
``tile×tile`` block (row-group-friendly, ~256 KB at 256px), and cutout
dereference becomes: compute covering tiles natively → equi-join on
(image_id, zoom, tile_y, tile_x) → slice the intra-tile overlap → assemble
the cutout with a small Arrow-batched kernel. Only the touched tiles are
ever read or shuffled — the 100 TB analog of the reference's HDF5 chunked
region reads (io_strategy.py:80-91).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from hiss_cube_spark.functions.arrays import slice_2d

__all__ = ["tile_images", "dereference_cutouts_tiled"]


def tile_images(
    images: DataFrame,
    tile: int = 256,
    id_col: str = "image_id",
    data_col: str = "data",
    errors_col: str = "errors",
) -> DataFrame:
    """Explode image rows into tile rows.

    Output: (image_id, zoom, tile_y, tile_x, y0, x0, data, errors) where
    (y0, x0) is the tile origin in image coordinates. Pure native
    expressions: a 2-level sequence explode + 2-D slices.
    """
    h = F.size(F.col(data_col))
    w = F.size(F.element_at(F.col(data_col), 1))
    nty = F.ceil(h / F.lit(tile)).cast("int")
    keys = [c for c in images.columns if c not in (data_col, errors_col)]

    # Memory discipline: a naive explode(tile_y) × explode(tile_x) carries
    # the FULL frame arrays through both generators, and GenerateExec
    # copies its input row into every generated row — 48 × 24 MB per SDSS
    # frame, which OOMs executors regardless of heap (measured). Instead
    # each step pre-builds an array of the NEXT-level slices row-locally
    # and posexplodes ELEMENTS: the full frame never rides a generated
    # row; a band (≤ tile rows) is the largest payload after step 1 and a
    # single tile after step 2. F.slice clamps at the array end, handling
    # the ragged last band/column for free.
    bands = F.transform(
        F.sequence(F.lit(0), nty - 1),
        lambda b: F.struct(
            F.slice(F.col(data_col), b * tile + 1, tile).alias("d"),
            F.slice(F.col(errors_col), b * tile + 1, tile).alias("e"),
        ),
    )
    t1 = images.withColumn("_h", h).withColumn("_w", w).select(
        *keys, "_w",
        F.posexplode(bands).alias("tile_y", "_band"),
    )
    tiles_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(F.col("_w") / F.lit(tile)).cast("int") - 1),
        lambda x: F.struct(
            F.transform(
                F.col("_band")["d"], lambda r: F.slice(r, x * tile + 1, tile)
            ).alias("d"),
            F.transform(
                F.col("_band")["e"], lambda r: F.slice(r, x * tile + 1, tile)
            ).alias("e"),
        ),
    )
    t2 = t1.select(
        *keys, "tile_y",
        F.posexplode(tiles_arr).alias("tile_x", "_t"),
    )
    return t2.select(
        *keys,
        "tile_y",
        "tile_x",
        (F.col("tile_y") * tile).cast("int").alias("y0"),
        (F.col("tile_x") * tile).cast("int").alias("x0"),
        F.col("_t")["d"].alias(data_col),
        F.col("_t")["e"].alias(errors_col),
    )


def dereference_cutouts_tiled(
    refs: DataFrame,
    tiles: DataFrame,
    tile: int = 256,
    id_col: str = "image_id",
) -> DataFrame:
    """Cutout dereference against the tiled layout.

    ``refs`` carries (image_id[, zoom], x_min, x_max, y_min, y_max). Each ref
    explodes into its covering tile coordinates (≤4 for cutouts smaller than
    a tile), joins the tile table on the tile key, slices each tile's
    overlap, and a grouped Arrow kernel pastes the pieces into the final
    2-D ``cutout_data``/``cutout_errors`` arrays.
    """
    join_keys = [id_col] + (["zoom"] if "zoom" in refs.columns and "zoom" in tiles.columns else [])
    ref_cols = refs.columns

    r = (
        refs.withColumn(
            "tile_y",
            F.explode(
                F.sequence(
                    F.floor(F.col("y_min") / tile).cast("int"),
                    F.floor((F.col("y_max") - 1) / tile).cast("int"),
                )
            ),
        )
        .withColumn(
            "tile_x",
            F.explode(
                F.sequence(
                    F.floor(F.col("x_min") / tile).cast("int"),
                    F.floor((F.col("x_max") - 1) / tile).cast("int"),
                )
            ),
        )
    )
    dup = [c for c in tiles.columns if c in r.columns and c not in join_keys + ["tile_y", "tile_x"]]
    j = r.join(tiles.drop(*dup), join_keys + ["tile_y", "tile_x"])

    # intra-tile overlap rectangle (image coords → tile coords)
    oy0 = F.greatest(F.col("y_min"), F.col("y0"))
    oy1 = F.least(F.col("y_max"), F.col("y0") + tile)
    ox0 = F.greatest(F.col("x_min"), F.col("x0"))
    ox1 = F.least(F.col("x_max"), F.col("x0") + tile)
    piece = j.select(
        *[F.col(c) for c in ref_cols],
        (oy0 - F.col("y_min")).cast("int").alias("py"),
        (ox0 - F.col("x_min")).cast("int").alias("px"),
        slice_2d(F.col("data"), oy0 - F.col("y0"), oy1 - F.col("y0"), ox0 - F.col("x0"), ox1 - F.col("x0")).alias("_pd"),
        slice_2d(F.col("errors"), oy0 - F.col("y0"), oy1 - F.col("y0"), ox0 - F.col("x0"), ox1 - F.col("x0")).alias("_pe"),
    )

    # Paste-assembly: collect the ≤4 pieces per cutout with a native
    # shuffle agg, then ONE Arrow-batched pandas UDF pastes whole batches
    # of cutouts. (A per-group applyInPandas here costs one Python call +
    # pandas DataFrame per CUTOUT — measured 1.8 s of the 2.0 s
    # j5_tiled_cutout_service wall at sf0.1 for 455 cutouts; the batched
    # UDF pastes the same 455 in one call.)
    grouped = piece.groupBy(*ref_cols).agg(
        F.collect_list(F.struct("py", "px", "_pd", "_pe")).alias("_pieces")
    )

    paste_t = StructType(
        [
            StructField("cutout_data", ArrayType(ArrayType(FloatType()))),
            StructField("cutout_errors", ArrayType(ArrayType(FloatType()))),
        ]
    )

    @F.pandas_udf(paste_t)
    def _paste(
        y_min: pd.Series, y_max: pd.Series, x_min: pd.Series,
        x_max: pd.Series, pieces: pd.Series,
    ) -> pd.DataFrame:
        out_d, out_e = [], []
        for y0, y1, x0, x1, pcs in zip(y_min, y_max, x_min, x_max, pieces):
            h, w = int(y1 - y0), int(x1 - x0)
            cd = np.full((h, w), np.nan, dtype=np.float32)
            ce = np.full((h, w), np.nan, dtype=np.float32)
            for p in pcs:
                blk_d = np.asarray(
                    [np.asarray(r_, dtype=np.float32) for r_ in p["_pd"]]
                )
                blk_e = np.asarray(
                    [np.asarray(r_, dtype=np.float32) for r_ in p["_pe"]]
                )
                py, px = int(p["py"]), int(p["px"])
                cd[py : py + blk_d.shape[0], px : px + blk_d.shape[1]] = blk_d
                ce[py : py + blk_e.shape[0], px : px + blk_e.shape[1]] = blk_e
            out_d.append([r_.tolist() for r_ in cd])
            out_e.append([r_.tolist() for r_ in ce])
        return pd.DataFrame({"cutout_data": out_d, "cutout_errors": out_e})

    pasted = grouped.withColumn(
        "_cut",
        _paste(
            F.col("y_min"), F.col("y_max"), F.col("x_min"), F.col("x_max"),
            F.col("_pieces"),
        ),
    )
    return pasted.select(
        *ref_cols,
        F.col("_cut.cutout_data").alias("cutout_data"),
        F.col("_cut.cutout_errors").alias("cutout_errors"),
    )
