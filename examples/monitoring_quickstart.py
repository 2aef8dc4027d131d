"""Data-quality monitoring quickstart: the mergeable-sketch + drift stack
a production pipeline keeps running beside ingestion.

    per source/day:  log-bucket quantile sketch  (≤ ~1k int counters)
                     count-min frequency sketch  (4×512 int counters)
    merge:           plain count sums — no raw data re-read, ever
    read:            p50/p99 (global and per-key), heavy hitters with
                     exactness companions, PSI drift between slices
    streaming:       the SAME quantile sketch as stream state
                     (streaming/sketch.py), snapshot always readable

Everything is exact integer arithmetic, so a sketch built on Monday and
merged with Tuesday's equals the sketch of both days bit-for-bit — the
property this example asserts at the end.

Run:  python examples/monitoring_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.quality_checks import (
        cm_heavy_hitters_report,
        logbucket_estimate,
        logbucket_grouped_quantiles,
        logbucket_sketch,
        psi_drift,
    )
    from hiss_cube_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("monitoring-quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        "l_returnflag", "l_shipdate",
    )

    # ---- 1. quantiles from a sketch (guaranteed rel-err <= 1/16) ----
    sk = logbucket_sketch(cents, "c")
    print("== price percentiles (sketch estimates, cents) ==")
    for r in logbucket_estimate(sk).orderBy("pct").collect():
        print(f"  p{r['pct']:<3} ~ {r['est']}")

    # ---- 2. per-key p50/p99 in one pass ----
    print("== p50/p99 by return flag ==")
    grouped = logbucket_grouped_quantiles(cents, "l_returnflag", "c", (50, 99))
    for r in grouped.orderBy("l_returnflag", "pct").collect():
        print(f"  {r['l_returnflag']} p{r['pct']:<3} ~ {r['est']}")

    # ---- 3. heavy hitters with exactness companions ----
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    print("== top customers by order count (count-min vs exact) ==")
    rep = cm_heavy_hitters_report(orders.select("o_custkey"), "o_custkey", 5)
    for r in rep.orderBy(F.desc("exact_n"), "key").collect():
        print(f"  cust {r['key']}: exact {r['exact_n']}, cm {r['cm_n']}, "
              f"overestimates={r['overestimates']} within_eps={r['within_eps']}")

    # ---- 4. drift between slices (PSI) ----
    psi = psi_drift(
        li, "l_extendedprice",
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"),
        0.0, 110000.0, 20,
    )
    total = psi.agg(
        (F.sum("psi_term_q") / F.lit(1e9)).alias("psi")
    ).head()["psi"]
    verdict = ("stable" if total < 0.1 else
               "shifting" if total < 0.25 else "ACTION")
    print(f"== PSI(price | pre-1998 vs 1998+) = {total:.4f} -> {verdict} ==")

    # ---- 5. the merge law, asserted ----
    monday = logbucket_sketch(cents.where("c % 2 = 0"), "c")
    tuesday = logbucket_sketch(cents.where("c % 2 = 1"), "c")
    merged = (monday.unionByName(tuesday)
              .groupBy("bucket").agg(F.sum("n").alias("n")))
    whole = {r["bucket"]: r["n"] for r in sk.collect()}
    m = {r["bucket"]: r["n"] for r in merged.collect()}
    assert m == whole, "sketch merge law violated"
    print("== merge law: Monday+Tuesday sketches == whole corpus sketch ✓ ==")

    spark.stop()


if __name__ == "__main__":
    main()
