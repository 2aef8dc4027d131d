"""Astronomy-engine quickstart: synthetic sky → full cube build → queries.

Runs the whole reference-parity pipeline in miniature (no FITS files
needed — the fixtures synthesize image/spectrum tables with the real
schemas): bronze ingest with pyramids, the link cross-match, the ML cube
(inverse-variance-weighted stacks), and the visualization point table,
then reads every warehouse table back.

For real data, `python -m hiss_cube_spark create <fits_dir> <out_dir>`
drives the same pipeline from FITS files (see sources/ingest.py).

Run:  python examples/astro_quickstart.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    from astro_fixtures import make_images, make_spectra

    from hiss_cube_spark.plans.pipeline import CubePipeline
    from hiss_cube_spark.session import get_spark

    spark = get_spark("astro-quickstart")
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="hcs_quickstart_")

    pipeline = CubePipeline(spark, out_dir, match_radius_deg=0.01, cutout_size=16)
    pipeline.create(make_images(spark), make_spectra(spark))

    for table in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, table)
        if os.path.isdir(path):
            n = spark.read.parquet(path).count()
            print(f"{table}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
