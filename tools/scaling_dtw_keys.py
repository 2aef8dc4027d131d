"""Key-scale stress for the banded DTW pair source (VERDICT r8 wrong-3
done-criterion): time dtw_distance(pair_source=dtw_banded_pairs) over ALL
qualified keys at 1x (sf0.1: 150 users) vs 100x (/tmp/scale100: 150k
users — 1000x the key count), where the capped default would silently
truncate coverage. All-pairs at 150k keys would be 1.1e10 DP cells;
banding keeps candidates to signature-bucket joins.

Usage: python tools/scaling_dtw_keys.py  (idle machine; see PLANS.md)
"""

from __future__ import annotations

import importlib.util
import json
import time


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.timeseries import (
        dtw_banded_pairs,
        dtw_distance,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    thr = 28_000
    out = {}
    for label, d in (("1x", "/root/testdata/sf0.1"), ("100x", "/tmp/scale100")):
        e = mod._events(spark, d)
        best, pairs = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            r = dtw_distance(
                e, n=16, pair_source=lambda s: dtw_banded_pairs(s, thr)
            ).where(F.col("dtw_q") <= thr)
            n = r.count()
            best = min(best, time.perf_counter() - t0)
            pairs = n
            spark.catalog.clearCache()
        nkeys = e.select("user_id").distinct().count()
        out[label] = {"sec": round(best, 2), "keys": nkeys, "true_pairs": pairs}
        print(json.dumps({label: out[label]}), flush=True)
    out["ratio"] = round(out["100x"]["sec"] / out["1x"]["sec"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
