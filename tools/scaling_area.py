"""Area-growth scaling measurement for the spatial cross-match.

The replication corpus (`make_scale10.py`) is a DENSITY stress: key-derived
coordinates stay quasi-uniform over the same 360°×170° synthetic sky, so a
K× corpus has K× the sources per square degree and the cross-match's
candidate-pair count grows ~K² (SCALING.md documents this as the expected
replication artifact). Real surveys grow the other way — new observations
land on NEW sky at roughly constant source density, and cross-match cost
grows ~linearly with covered area.

This harness measures that regime directly instead of asserting it:
coordinates are deterministic functions of the keys and quasi-uniform in
declination, so a dec-band window of width W selects a constant-density
subset covering ~W/170 of the sky. Growing W by K grows covered area (and
row count) by ~K at fixed density — the area-growth regime. The flagship
shape (disc-cover crossmatch → inverse-variance-weighted aggregate) runs
per window; the claim under test is pairs ∝ K and wall-time ~ K (modulo
fixed job overhead at these sizes).

Usage: python tools/scaling_area.py [sf_dir] [ks ...]   (default 1 10 30)
Prints one JSON line per K: rows, candidate pairs, matched groups, sec.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(k) for k in sys.argv[2:]] or [1, 10, 30]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location("_entry", f"{REPO}/__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from hiss_cube_spark.operators.crossmatch import crossmatch

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    kmax = max(ks)
    for k in ks:
        dec_max = -85.0 + k * (170.0 / kmax)
        spectra = entry._spectra(spark, sf_dir).where(F.col("dec") < dec_max)
        images = entry._images(spark, sf_dir).where(F.col("dec") < dec_max)
        n_spec, n_img = spectra.count(), images.count()
        t0 = time.time()
        m = crossmatch(spectra, images, radius_deg=entry._RADIUS_DEG)
        g = m.groupBy("t_img_id").agg(F.count(F.lit(1)).alias("n_obs"))
        pairs = m.count()
        groups = g.count()
        sec = time.time() - t0
        print(
            json.dumps(
                {
                    "k": k,
                    "dec_band_deg": round(k * 170.0 / kmax, 2),
                    "n_spec": n_spec,
                    "n_img": n_img,
                    "pairs": pairs,
                    "groups": groups,
                    "sec": round(sec, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
