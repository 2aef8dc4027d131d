"""Tiled raster layout: tiling roundtrip + tiled cutout dereference must
equal the untiled dereference exactly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.astro_fixtures import make_images


@pytest.fixture(scope="module")
def images_z0(spark):
    df = make_images(spark).where(F.col("zoom") == 0).limit(12).cache()
    df.count()
    return df


def test_tile_roundtrip_covers_image(spark, images_z0):
    from hiss_cube_spark.operators.tiles import tile_images

    tiles = tile_images(images_z0, tile=20)  # 64×48 → 4×3 grid with edges
    one = tiles.where(F.col("image_id") == images_z0.select("image_id").first()[0])
    got = one.select("tile_y", "tile_x", F.size("data").alias("h"),
                     F.size(F.element_at("data", 1)).alias("w")).collect()
    assert len(got) == 12  # ceil(48/20) * ceil(64/20) = 3 * 4
    area = sum(r["h"] * r["w"] for r in got)
    assert area == 64 * 48


def test_tiled_deref_equals_untiled(spark, images_z0):
    from hiss_cube_spark.operators.cutouts import dereference_cutouts
    from hiss_cube_spark.operators.tiles import dereference_cutouts_tiled, tile_images

    ids = [r[0] for r in images_z0.select("image_id").collect()]
    # refs straddling tile boundaries on purpose (tile=20, cutout 16 at x=12)
    refs = spark.createDataFrame(
        [(i, 12, 28, 14, 30) for i in ids] + [(ids[0], 0, 16, 0, 16), (ids[1], 48, 64, 32, 48)],
        "image_id long, x_min int, x_max int, y_min int, y_max int",
    )
    plain = {
        (r["image_id"], r["x_min"], r["y_min"]): np.array(r["cutout_data"], dtype=np.float32)
        for r in dereference_cutouts(refs, images_z0.drop("zoom")).collect()
    }
    tiles = tile_images(images_z0.drop("zoom"), tile=20)
    tiled = dereference_cutouts_tiled(refs, tiles, tile=20)
    rows = tiled.collect()
    assert len(rows) == refs.count()
    for r in rows:
        got = np.array(r["cutout_data"], dtype=np.float32)
        assert got.shape == (r["y_max"] - r["y_min"], r["x_max"] - r["x_min"])
        np.testing.assert_array_equal(got, plain[(r["image_id"], r["x_min"], r["y_min"])])
    assert not any(np.isnan(np.array(r["cutout_data"])).any() for r in rows)


def test_compact_table_preserves_rows_and_restores_clustering(spark, tmp_path_factory):
    """Many unordered appends -> one compaction pass: row parity, file-count
    target, and within-file key ordering (the pruning property) restored."""
    from pyspark.sql import functions as F

    from hiss_cube_spark.plans.maintenance import compact_table, parquet_file_count

    path = str(tmp_path_factory.mktemp("compact") / "tbl")
    # 20 tiny appends with interleaved keys (the streaming-ingest aftermath)
    for i in range(20):
        spark.range(i, 2000, 20).select(
            F.col("id").alias("healpix"), (F.col("id") * 2).alias("v")
        ).coalesce(1).write.mode("append").parquet(path)
    assert parquet_file_count(path) >= 20
    before = spark.read.parquet(path)
    n = before.count()
    checksum = before.agg(F.sum("v")).collect()[0][0]

    n_files = compact_table(spark, path, target_rows_per_file=500, sort_cols=["healpix"])
    assert n_files == 4  # 2000 rows / 500
    after = spark.read.parquet(path)
    assert after.count() == n
    assert after.agg(F.sum("v")).collect()[0][0] == checksum
    # per-file ordering: within every file, healpix must be non-decreasing
    withfile = after.select("healpix", F.col("_metadata.file_path").alias("f"))
    disorder = (
        withfile.withColumn(
            "prev",
            F.lag("healpix").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "f"
                ).orderBy(F.monotonically_increasing_id())
            ),
        )
        .where(F.col("prev") > F.col("healpix"))
        .count()
    )
    assert disorder == 0


def _scan_counts(df) -> dict[str, int]:
    """Parquet scans per table in the formatted physical plan (the
    tools/scan_audit.py counter, inlined for phase-level audits)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    per: dict[str, int] = {}
    for line in buf.getvalue().splitlines():
        if "Location:" in line:
            tbl = line.rstrip("]").rstrip("/").rsplit("/", 1)[-1]
            per[tbl] = per.get(tbl, 0) + 1
    return per


def test_viz_phase_scan_audit(spark, tmp_path_factory):
    """Viz-phase plan audit: the FRAME table (the 100 TB payload) is
    scanned exactly once in untiled mode; in tiled mode the tile table is
    scanned once and the frame table contributes one column-pruned
    metadata scan that must NOT read the pixel arrays. The spectra table
    legitimately appears twice (full arrays for the sample unpivot + a
    pruned scalar-metadata scan for the cutout rows) — the second scan's
    ReadSchema must carry no flux arrays."""
    import contextlib
    import io
    import os

    from tests.astro_fixtures import make_images, make_spectra

    from hiss_cube_spark.operators.viz_cube import build_visualization_cube
    from hiss_cube_spark.plans.pipeline import CubePipeline

    wh = str(tmp_path_factory.mktemp("viz_audit_wh"))
    pipe = CubePipeline(spark, wh, match_radius_deg=0.01, cutout_size=16,
                        tiled=True, tile=20)
    pipe.phase_ingest(make_images(spark), make_spectra(spark))
    pipe.phase_link()

    spectra = pipe.read("spectra")
    refs = pipe.read("cutout_refs")
    images = pipe.read("images")
    tiles = pipe.read("image_tiles")

    untiled = build_visualization_cube(spectra, refs, images)
    per = _scan_counts(untiled)
    assert per.get("images") == 1, per
    assert per.get("cutout_refs") == 1, per
    assert per.get("spectra") == 2, per

    tiled = build_visualization_cube(spectra, refs, images,
                                     tiles=tiles, tile=20)
    per_t = _scan_counts(tiled)
    assert per_t.get("image_tiles") == 1, per_t
    assert per_t.get("images") == 1, per_t

    # the frame-table scan in tiled mode is metadata-only: no pixel arrays
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tiled.explain("formatted")
    plan = buf.getvalue()
    img_schemas = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and f"{os.sep}images" in plan  # plan-wide guard
    ]
    frame_reads = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    # exactly one ReadSchema may carry the 2-D float arrays (the tile scan)
    heavy = [ln for ln in frame_reads if "array<array<float" in ln]
    assert len(heavy) == 1, heavy
