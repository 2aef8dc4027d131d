#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with the
noop sink (full computation, no driver collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from hiss_cube_spark import get_spark  # noqa: E402

# Headline set: the flagship + one representative per operator family.
HEADLINE = [
    "flagship_ml_cube",
    "j2_crossmatch",
    "q1_pricing_summary",
    "a1_ivw_mean",
    "q3_shipping_priority",
    "q5_region_revenue",
    "j4_left_join",
    "j7_first_in_group",
    "w_rank_topk",
    "stream_tumbling_window",
    "stream_session_window",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_langid",
    "text_quality",
    "f17_unpivot",
    "q6_forecast_revenue",
    "q8_market_share",
    "q21_lone_returned_supplier",
    "stream_sliding_window",
    "a_median_quartiles",
    "j_interval_overlap",
    "dedup_clusters",
    "cur_decontaminate",
    "stream_interval_join",
    "text_heavy_hitters",
    "text_tfidf_topk",
    "cur_temperature_sample",
    "dedup_paragraphs",
    "cur_redact_pii",
    "w_funnel_stages",
    "w_cohort_retention",
    "ts_resample_locf",
    "cur_chunk_documents",
    "cur_incremental_dedup",
    "cdc_apply_changelog",
    "a1_light_curve",
    "ts_ewma",
    "cur_model_quality",
    "dq_histogram",
    "cdc_time_travel",
    "j_bloom_prune",
    "cur_full_pipeline",
    "stream_neardup_minhash",
    "text_bm25_topk",
    "ann_sq_topk",
    # round-3 additions (one representative per new family; totals are
    # therefore not comparable across rounds — compare per-query)
    "dedup_span_removal",
    "cur_perplexity_buckets",
    "q_hybrid_retrieval",
    "cur_url_dedup",
    "text_gopher_rules",
    "emb_dbscan",
    "mm_video_pipeline",
    "text_rake_keywords",
    "cur_pack_atomic",
    "ts_seasonal_anomaly",
    # round-4 additions
    "emb_dbscan_blocked",
    "mm_jpeg_pipeline",
    # round-5 additions
    "mm_png_variants",
    "mm_fits_codec_sweep",
    "dq_kl_divergence",
    "text_zipf_slope",
    "cur_bottomk_sample",
    "mm_flac_pipeline",
    "ts_theil_sen",
    "ts_holt_linear",
    "mm_exif_pipeline",
    "j5_tiled_cutout_service",
    # round-7 additions
    "j_polar_crossmatch",
    "text_readability",
    "cur_source_overlap",
    "ts_structure_function",
    # round-8 additions
    "dq_psi",
    "emb_kmeans_cosine",
    "emb_cluster_prototypes",
    "ts_dtw_distance",
    "text_mattr",
    "w_rolling_distinct",
    "ts_periodogram",
    # round-9 additions
    "ts_dtw_banded",
    "dq_quantile_sketch",
    "ab_cuped",
    "text_trigram_lm",
    "mm_crossmodal_dedup",
    "dq_cm_sketch",
    "dq_sketch_merge",
    "stream_quantile_sketch",
    "dq_grouped_quantiles",
    "cur_token_weighted_quality",
    # round-10 additions
    "dq_theta_intersect",
    "dq_topk_sketch",
    "dq_kmv_distinct",
    "dq_k_anonymity",
    "ab_srm",
    "er_golden_record",
    "cur_dp_clip",
    "graph_label_propagation",
    # round-11 additions
    "j_bucketed_colocated",
    "text_bpe_train",
    # round-12 additions
    "j_bucketed_flagship",
    "w_cumulative_sum",
    "cur_emb_decontaminate",
]

# Environment-drift sentinels: per-query ratchets are expressed relative to
# the MEDIAN of these queries' times in the same run (PLANS.md "Relative
# ratchet protocol"; multi-sentinel since round 12 — a single sentinel made
# every rel-ratchet hostage to one query's jitter, and q1's own reading was
# the r11 outlier). Three code-stable queries of different shapes: q1 is
# pure scan+groupBy, w_cumulative_sum is one exchange + running window,
# ann_cosine_topk is a broadcast join + per-query top-k.
SENTINELS = ["q1_pricing_summary", "w_cumulative_sum", "ann_cosine_topk"]
# The r5-r11 single sentinel, kept ONLY so a reader can locate q1 in old
# records; since r12 the rel map divides by sentinel_median_sec (the
# median of `sentinels`), NOT by this query's time — `rel_basis` says so
# in-band. Old rel maps (divided by q1) and new ones are mixed-denominator.
SENTINEL = SENTINELS[0]


def _loadavg_now():
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # contention witness: the r10-r12 investigations showed driver-bench
    # readings taken while other work shares the box inflate shuffle/HOF
    # heavy queries 2-6x while sentinels barely move (PLANS.md round-12);
    # recording the load average makes that state visible IN the record.
    load_start = _loadavg_now()

    spark = get_spark("hiss-cube-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qreg = entrymod.queries()
    names = [n for n in HEADLINE if n in qreg]
    timings: dict[str, float] = {}

    # Warm the JVM/codegen once on the smallest query so timings measure the
    # plan, not session startup.
    qreg[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    total = 0.0
    for name in names:
        # Adaptive best-of-N: 2 attempts always; queries still above 1 s get
        # up to 4 — the iterative dedup/clustering plans pay multi-second
        # one-time JIT+GC costs that a single retry doesn't always absorb,
        # and the point of the bench is the plan's cost, not the JIT's.
        best = float("inf")
        attempts = 0
        while attempts < 4:
            t0 = time.perf_counter()
            qreg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            attempts += 1
            if attempts >= 2 and best <= 1.0:
                break
        timings[name] = round(best, 3)
        total += best

    sent = sorted(timings[n] for n in SENTINELS if timings.get(n))
    sentinel_sec = (
        (sent[len(sent) // 2] if len(sent) % 2 else
         (sent[len(sent) // 2 - 1] + sent[len(sent) // 2]) / 2)
        if sent
        else 1.0
    )
    rel = {n: round(t / sentinel_sec, 3) for n, t in timings.items()}
    side_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_last.json"
    )
    # round-over-round signal: median per-query ratio vs the previous
    # bench_last.json (the prior round's committed run), common queries
    median_vs_prev = None
    try:
        with open(side_path) as fh:
            prev_rec = json.load(fh)
        # only comparable when the previous run used the SAME scale
        # factor (the regress gate runs this bench at sf0.01; comparing
        # that against an sf0.1 run would report a meaningless 10x)
        prev = (
            prev_rec.get("queries", {})
            if prev_rec.get("sf") == sf
            else {}
        )
        ratios = sorted(
            timings[n] / prev[n]
            for n in timings
            if n in prev and prev[n] > 0
        )
        if ratios:
            mid = len(ratios) // 2
            med = (
                ratios[mid]
                if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2
            )
            median_vs_prev = round(med, 3)
    except (OSError, ValueError, KeyError):
        pass
    record = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "sentinel": SENTINEL,
        "sentinels": {n: timings[n] for n in SENTINELS if n in timings},
        "sentinel_median_sec": round(sentinel_sec, 3),
        "rel_basis": "sentinel_median_sec",
        "load_1m_start": load_start,
        "load_1m_end": _loadavg_now(),
        "median_vs_prev": median_vs_prev,
        "rel": rel,
    }
    # Full record (all per-query timings + the derivable rel map) goes to
    # the side file; stdout gets ONE compact line, printed last and HARD
    # BOUNDED below the driver's 2000-char tail window (BENCH_r08/r09
    # "parsed": null was the full 93-query map front-truncating the tail):
    # aggregates + the most expensive queries that still fit + a pointer
    # to the side file with everything.
    try:
        with open(side_path, "w") as fh:
            json.dump(record, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass
    spark.stop()
    sys.stdout.flush()
    compact = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n": len(timings),
        "sentinel": SENTINEL,
        "sentinels": {n: timings[n] for n in SENTINELS if n in timings},
        "rel_basis": "sentinel_median_sec",
        "load_1m": [load_start, _loadavg_now()],
        "median_vs_prev": median_vs_prev,
        "file": "bench_last.json",
        "n_queries_omitted": 0,
        "queries": {},
    }
    # stdout budget: the driver captures a ~2000-char tail; at 101+
    # queries a 1800-byte line left almost no headroom (VERDICT r10 #7),
    # so cap BOTH the bytes (1500) and the list (top 20 most expensive —
    # the full map is always in bench_last.json).
    budget = 1500
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1])[:20]:
        compact["queries"][name] = sec
        if len(json.dumps(compact, separators=(",", ":"))) > budget:
            del compact["queries"][name]
            break
    # truncation must be detectable downstream (ADVICE r11): a consumer
    # grepping stdout for a query that didn't fit sees the omission count
    compact["n_queries_omitted"] = len(timings) - len(compact["queries"])
    print(json.dumps(compact, separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
