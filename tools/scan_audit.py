"""Physical-plan scan audit: count parquet scans per registered query.

A query whose formatted plan scans the same fact table many times is a
100 TB red flag (each scan is a full pass at scale) — usually a lazily
re-derived aggregate that should be a window over a bounded intermediate
(see PLANS.md "Drift family single-scan rewrite"). Some multi-scan
shapes are legitimate: self-joins (dedup pairs, crossmatch), recall
companions that run an exact baseline beside the approximate leg, and
multi-table queries. The audit prints every query with >= `threshold`
scans so the legitimate ones can be triaged once and documented.

Usage: python tools/scan_audit.py [sf_dir] [threshold] [--gate]

``--gate`` exits nonzero when a query outside the triaged allowlist
below reaches the threshold — run it after adding queries so a new lazy
re-derivation can't land silently.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import sys

# Triaged legitimate multi-scans (architecture documented in PLANS.md
# "Same-table scan audit"): ANN train/encode/rerank passes + recall
# companions, self-join pair generators, set-op legs, CDC version reads,
# column-pair matrices, two-grain aggregations.
ALLOWLIST = {
    "graph_triangles", "ann_pq_topk", "ann_ivf_pq_topk", "ann_sq_topk",
    "ann_lsh_topk", "ann_ivf_topk", "ann_cosine_topk", "emb_whiten",
    "emb_dbscan", "emb_dbscan_blocked", "emb_matryoshka_recall",
    "cur_semantic_dedup", "cur_full_pipeline", "cur_perplexity_buckets",
    "cur_temperature_sample", "cur_incremental_dedup", "cur_decontaminate",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_clusters", "dedup_substring_spans", "dedup_span_removal",
    "stream_neardup_minhash", "set_ops", "j_fuzzy_match",
    "j_interval_overlap", "q21_lone_returned_supplier", "q22_no_order_customers",
    "cdc_time_travel", "cdc_incremental_agg", "cdc_snapshot_diff",
    "a_corr_matrix", "a_approx_stats", "text_tfidf_topk", "text_vocab_growth",
    "text_bm25_topk", "q_hybrid_retrieval", "dq_equidepth",
}


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--gate"]
    gate = "--gate" in sys.argv
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    threshold = int(argv[1]) if len(argv) > 1 else 3
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    for name, fn in mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            per_table: dict[str, int] = {}
            for line in plan.splitlines():
                if "Location:" in line and ".parquet" in line:
                    tbl = line.rsplit("/", 1)[-1].rstrip("]").removesuffix(
                        ".parquet"
                    )
                    per_table[tbl] = per_table.get(tbl, 0) + 1
            if per_table and max(per_table.values()) >= threshold:
                worst = max(per_table, key=per_table.get)
                flagged.append((per_table[worst], f"{name} ({worst})"))
        except Exception as e:  # streaming-only entries etc.
            print(f"SKIP {name}: {type(e).__name__}", file=sys.stderr)
    for nscan, name in sorted(flagged, reverse=True):
        print(nscan, name)
    print(f"-- {len(flagged)} queries with >= {threshold} scans")
    if gate:
        bad = [
            (n, label)
            for n, label in flagged
            if label.split(" (")[0] not in ALLOWLIST
        ]
        if bad:
            print(f"GATE FAIL: {len(bad)} un-triaged multi-scan queries: {bad}")
            sys.exit(1)
        print("GATE PASS: every flagged query is on the triaged allowlist")


if __name__ == "__main__":
    main()
