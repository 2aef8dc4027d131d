"""Multimodal-family scale stress: codec-kernel queries at 1x / 10x /
100x document rows (and 1000x for the round-5-flagged FLAC leg).

Corpus ladder reuses what already exists on disk — the natural sf
dirs and the replica corpora built by tools/make_scale10.py:

  1x    /root/testdata/sf0.01      500 docs
  10x   /root/testdata/sf0.1     5,000 docs
  100x  /tmp/scale10            50,000 docs  (sf0.1 x 10 replicas)
  1000x /tmp/scale100          500,000 docs  (sf0.1 x 100 replicas)

Every query here is a per-document constant-work codec kernel behind
`repartition(defaultParallelism)` (mapInPandas, no shuffle after the
rebalance), so the expected law is wall ∝ rows once the fixed job
overhead is amortized — this harness exists to catch the round-5
failure mode where a per-sample Python leg made one kernel super-linear
in practice (mm_flac_pipeline: 16x wall at 10x rows before the
vectorized Rice/CRC decode).

Near-dup mm queries (mm_phash_neardup, mm_audio_neardup) are excluded
by design: on a replica corpus every doc gains N-1 verbatim copies, so
their pair output grows ~N^2 by construction — density stress, measured
separately (SCALING.md area-growth section).

Usage: python tools/scaling_mm.py [out_json] — idle machine only (see
PLANS.md protocol hazard).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

LADDER = [
    ("1x", "/root/testdata/sf0.01"),
    ("10x", "/root/testdata/sf0.1"),
    ("100x", "/tmp/scale10"),
]
DEEP = ("1000x", "/tmp/scale100")

QUERIES = [
    "mm_flac_pipeline",
    "mm_jpeg_pipeline",
    "mm_png_variants",
    "mm_fits_codec_sweep",
    "mm_image_pipeline",
    "mm_video_pipeline",
]
DEEP_QUERIES = ["mm_flac_pipeline", "mm_jpeg_pipeline", "mm_fits_codec_sweep"]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_mm.json"
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qreg = mod.queries()
    results = {}
    for name in QUERIES:
        ladder = list(LADDER)
        if name in DEEP_QUERIES and os.path.isdir(DEEP[1]):
            ladder.append(DEEP)
        row = {}
        for label, d in ladder:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qreg[name](spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            row[label] = round(best, 2)
        row["ratio_100x"] = round(row["100x"] / row["1x"], 1)
        if "1000x" in row:
            row["ratio_1000x"] = round(row["1000x"] / row["1x"], 1)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
    json.dump(results, open(out_path, "w"), indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
