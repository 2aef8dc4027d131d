"""CLI — the reference's ``hisscube.py <input> <output> create|update``
surface (hisscube.py:18-68) on Spark.

    python -m hiss_cube_spark <input_dir> <warehouse> create
    python -m hiss_cube_spark <input_dir> <warehouse> update --link
    python -m hiss_cube_spark <input_dir> <warehouse> update --ml-cube
    python -m hiss_cube_spark <input_dir> <warehouse> update --visualization-cube

``create`` ingests FITS images from <input_dir> (spectra ingest via the
library API), then runs link + both cubes; each ``update`` flag re-runs one
phase against the existing warehouse (the reference's per-phase update
semantics).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hiss_cube_spark")
    p.add_argument("input_dir")
    p.add_argument("warehouse")
    p.add_argument("command", choices=["create", "update"])
    p.add_argument("--image-pattern", default="*.fits*")
    p.add_argument("--link", action="store_true")
    p.add_argument("--ml-cube", action="store_true")
    p.add_argument("--visualization-cube", action="store_true")
    p.add_argument("--match-radius-deg", type=float, default=0.133)
    p.add_argument("--cutout-size", type=int, default=64)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from hiss_cube_spark import get_spark
    from hiss_cube_spark.plans.pipeline import CubePipeline
    from hiss_cube_spark.sources.ingest import ingest_images

    # getOrCreate may return a caller's session — only stop what we created
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("hiss-cube-cli")
    spark.sparkContext.setLogLevel("WARN")
    pipe = CubePipeline(
        spark,
        args.warehouse,
        match_radius_deg=args.match_radius_deg,
        cutout_size=args.cutout_size,
    )

    if args.command == "create":
        images = ingest_images(spark, args.input_dir, args.image_pattern)
        pipe.write_bronze(images, "images")
        print(f"ingested images → {pipe.path('images')}")
        # spectra ingest requires spectrum FITS layout; link/cubes run when
        # both bronze tables exist
        import os

        if os.path.isdir(pipe.path("spectra")):
            pipe.phase_link()
            pipe.phase_ml_cube()
            pipe.phase_visualization()
    else:
        if args.link:
            pipe.phase_link()
        if args.ml_cube:
            pipe.phase_ml_cube()
        if args.visualization_cube:
            pipe.phase_visualization()
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
