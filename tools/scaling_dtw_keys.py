"""Key-scale stress for the banded constrained-DTW miner.

Two regimes, measured separately because they scale differently BY THE
DATA'S NATURE, not the design's (VERDICT r9 `weak` done-criterion):

1. CLUSTERED corpus (the realistic heterogeneous-fleet shape), built so
   that every key-level LB_Kim aggregate (first/last/max/min) is
   IDENTICAL across keys — the r9 design would go quadratic here — but
   per-position shapes differ by cluster. The r10 anchor-envelope
   signature keys (positions 6/11, band-dilated build windows) separate
   the clusters, so with cluster count ∝ keys the candidate set and
   wall grow ~LINEARLY at 1x→10x→100x keys. This is the regime the
   VERDICT asked to demonstrate: sub-quadratic growth on a clustered
   (non-i.i.d.) corpus via per-position signatures.

2. I.I.D.-concentrated corpus (sf0.01→sf0.1 real events, plus a 100x
   synthetic point): the TRUE answer set is itself quadratic (~1.2%
   pair density — no sound miner is sub-quadratic when the answer is),
   so the honest bound is the EXPLICIT CAP: max_bucket keeps each
   signature bucket's lowest keys (join output linear in keys),
   max_pairs caps the DP input, and BOTH losses are DISCLOSED here as
   dropped build rows / capped candidate counts.

Usage: python tools/scaling_dtw_keys.py  (idle machine; see PLANS.md)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def clustered_events(spark, n_keys: int, keys_per_cluster: int = 15):
    """Synthetic hourly event series whose LB_Kim aggregates are
    IDENTICAL for every key (pos 1 = +1e7 cents, pos 16 = -1e7 set
    first/last/max/min globally) while positions 4..13 carry a
    per-cluster level shift (4x the threshold) + deterministic per-key
    jitter (±15 units, well inside threshold) — so only per-position
    signatures can separate keys. 16 events per key."""
    from pyspark.sql import functions as F

    n_clusters = max(1, n_keys // keys_per_cluster)
    return (
        spark.range(n_keys * 16)
        .select(
            (F.col("id") / 16).cast("long").alias("user_id"),
            (F.col("id") % 16).alias("_pos"),
        )
        .select(
            "user_id",
            ((F.col("_pos") + 1) * 3_600_000_000).alias("ts_us"),
            (
                F.when(F.col("_pos") == 0, F.lit(10_000_000))
                .when(F.col("_pos") == 15, F.lit(-10_000_000))
                .otherwise(
                    F.lit(100_000)
                    + F.when(
                        (F.col("_pos") >= 3) & (F.col("_pos") <= 12),
                        (F.col("user_id") % n_clusters) * 120_000,
                    ).otherwise(F.lit(0))
                    + F.pmod(
                        F.col("user_id") * 2_654_435_761
                        + F.col("_pos") * 40_503,
                        F.lit(3_000),
                    )
                    - 1_500
                ) / F.lit(100.0)
            ).alias("value"),
        )
    )


def iid_events(spark, n_keys: int):
    """Concentrated i.i.d. corpus: every position ~100k cents ± 20k —
    all signatures collide, the answer set is quadratic by design."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_keys * 16)
        .select(
            (F.col("id") / 16).cast("long").alias("user_id"),
            (F.col("id") % 16).alias("_pos"),
        )
        .select(
            "user_id",
            ((F.col("_pos") + 1) * 3_600_000_000).alias("ts_us"),
            (
                (
                    F.lit(100_000)
                    + F.pmod(
                        F.col("user_id") * 2_654_435_761
                        + F.col("_pos") * 40_503,
                        F.lit(40_000),
                    )
                    - 20_000
                ) / F.lit(100.0)
            ).alias("value"),
        )
    )


def main() -> None:
    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.timeseries import (
        dtw_banded_pairs,
        dtw_distance,
    )

    spark = _spark()
    thr = 30_000
    out = {}

    # ---- regime 1: clustered corpus, anchors on, no caps ----
    for label, n_keys in (("c1x", 150), ("c10x", 1_500), ("c100x", 15_000)):
        e = clustered_events(spark, n_keys).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        cand = dtw_banded_pairs(
            dtw_distance_series(e, spark), thr, radius=2, anchors=(6, 11)
        )
        n_cand = cand.count()
        t_cand = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = dtw_distance(
            e, n=16, radius=2, lb_prune_q=thr,
            pair_source=lambda s: dtw_banded_pairs(
                s, thr, radius=2, anchors=(6, 11)
            ),
        ).where(F.col("dtw_q") <= thr)
        n_true = r.count()
        t_full = time.perf_counter() - t0
        out[label] = {
            "keys": n_keys, "candidates": n_cand, "true_pairs": n_true,
            "cand_sec": round(t_cand, 2), "full_sec": round(t_full, 2),
        }
        print(json.dumps({label: out[label]}), flush=True)
        spark.catalog.clearCache()

    # ---- regime 2: real i.i.d. events (uncapped, as in r9) ----
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for label, d in (("1x", "/root/testdata/sf0.01"),
                     ("10x", "/root/testdata/sf0.1")):
        e = mod._events(spark, d)
        nkeys = e.select("user_id").distinct().count()
        t0 = time.perf_counter()
        r = dtw_distance(
            e, n=16, radius=2, lb_prune_q=thr,
            pair_source=lambda s: dtw_banded_pairs(
                s, thr, radius=2, anchors=(6, 11)
            ),
        ).where(F.col("dtw_q") <= thr)
        n = r.count()
        out[label] = {
            "keys": nkeys, "true_pairs": n,
            "sec": round(time.perf_counter() - t0, 2),
        }
        print(json.dumps({label: out[label]}), flush=True)
        spark.catalog.clearCache()

    # ---- regime 3: i.i.d. 100x, CAPPED — bounded wall, disclosed loss ----
    n_keys, mb, mp = 15_000, 8, 200_000
    e = iid_events(spark, n_keys).localCheckpoint(eager=True)
    ser = dtw_distance_series(e, spark)
    # disclosure: build rows before/after the per-bucket cap
    t0 = time.perf_counter()
    capped = dtw_banded_pairs(
        ser, thr, radius=2, anchors=(6, 11), max_bucket=mb, max_pairs=mp
    )
    n_capped = capped.count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = dtw_distance(
        e, n=16, radius=2, lb_prune_q=thr,
        pair_source=lambda s: dtw_banded_pairs(
            s, thr, radius=2, anchors=(6, 11), max_bucket=mb, max_pairs=mp
        ),
    ).where(F.col("dtw_q") <= thr)
    n_true = r.count()
    t_full = time.perf_counter() - t0
    out["iid100x_capped"] = {
        "keys": n_keys, "max_bucket": mb, "max_pairs": mp,
        "candidates_after_caps": n_capped,
        "capped_to_max_pairs": bool(n_capped >= mp),
        "true_pairs_within_cap": n_true,
        "cand_sec": round(t_cand, 2), "full_sec": round(t_full, 2),
        "disclosure": "caps DROP true pairs on this corpus by design; "
                      "the uncapped answer set is quadratic (~1.2% density)",
    }
    print(json.dumps({"iid100x_capped": out["iid100x_capped"]}), flush=True)
    print(json.dumps(out))


def dtw_distance_series(e, spark):
    """The qualified-series table dtw_distance builds internally (first
    16 full hourly buckets per key) — via the SHARED builder, so the
    candidate-generation timings always run over exactly the miner's
    series set."""
    from hiss_cube_spark.operators.timeseries import dtw_qualified_series

    return dtw_qualified_series(
        e, "user_id", "ts_us", "value", 3_600_000_000, 16
    ).select("key", "v")


if __name__ == "__main__":
    main()
