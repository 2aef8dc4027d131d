"""100x scale-stress harness: time registered queries at sf0.1 vs a
100-replica corpus (tools/make_scale10.py with copies=100 — 60M-row
lineitem, 10M events, 500k documents, ~2.3GB parquet).

The replica method preserves modular doc_id laws and shifts join keys
consistently, so join/agg/window/text/ANN queries scale realistically.
Queries whose cost depends on CONTENT DENSITY (spatial crossmatch in a
fixed sky area; near-dup pairs when every doc gains 99 verbatim copies)
are excluded by design — their density-stress behavior is measured
separately (SCALING.md area-growth section, dedup 10x rows).

Usage: python tools/scaling_100x.py [out_json] — run from anywhere;
needs an otherwise-idle machine (see PLANS.md protocol hazard).
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q8_market_share",
    "w_rank_topk",
    "w_moving_sum",
    "stream_tumbling_window",
    "a_median_quartiles",
    "text_langid",
    "text_quality",
    "text_gopher_rules",
    "dedup_exact",
    "cur_temperature_sample",
    "cur_chunk_documents",
    "ann_cosine_topk",
    "ts_ewma",
    # round 9
    "dq_quantile_sketch",
    "ab_cuped",
    "text_trigram_lm",
    "dq_grouped_quantiles",
    "dq_cm_sketch",
    "dq_sketch_merge",
    "stream_quantile_sketch",
    "cur_token_weighted_quality",
    "mm_crossmodal_dedup",
    # round 10
    "dq_theta_intersect",
    "dq_topk_sketch",
    "dq_kmv_distinct",
    # round-10 second batch (er_golden_record / graph_label_propagation
    # are near-dup-pair-density queries -> measured on the dedup 10x
    # ladder instead, like dedup_* / cur_neardup_corpus)
    "dq_k_anonymity",
    "ab_srm",
    "cur_dp_clip",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_100x.json"
    only = set(sys.argv[2:])  # optional: measure just these queries
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
    for name in QUERIES if not only else [q for q in QUERIES if q in only]:
        row = {}
        for label, d in (("1x", "/root/testdata/sf0.1"), ("100x", "/tmp/scale100")):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qreg[name](spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            row[label] = round(best, 2)
        row["ratio"] = round(row["100x"] / row["1x"], 1)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
    json.dump(results, open(out_path, "w"), indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
