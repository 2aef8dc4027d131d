"""Data-governance quickstart: the release checklist a training-data
platform runs before user-derived tables or text corpora leave the
boundary.

    text release:   PII redaction (native regexp, codegen-friendly)
    table release:  k-anonymity generalization ladder + l-diversity
    metric release: per-user contribution clipping (DP sensitivity prep)
    readout guard:  sample-ratio mismatch before any A/B readout

Each step is deterministic and one-or-two aggregate passes — the shapes
that survive a 100 TB fact table. The example asserts the governance
invariants at the end (every released group >= k, clipped sums never
exceed raw, redacted text carries no raw emails).

Run:  python examples/governance_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.experiments import ab_srm
    from hiss_cube_spark.operators.privacy import (
        bounded_contribution,
        k_anonymity_ladder,
        redact_pii,
    )
    from hiss_cube_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("governance-quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. text release: PII scrub -----------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scrubbed = redact_pii(docs, "text")
    n_pii = scrubbed.agg(
        F.sum("n_email").alias("emails"), F.sum("n_ipv4").alias("ips")
    ).collect()[0]
    print(f"PII scrub: {n_pii.emails or 0} emails, {n_pii.ips or 0} IPs replaced")
    leftover = scrubbed.where(
        F.col("redacted").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ).count()
    assert leftover == 0, "raw email survived redaction"

    # ---- 2. table release: k-anonymity ladder -------------------------
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            "c_custkey",
            F.col("c_nationkey").cast("long").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
            (F.col("c_acctbal") < 0).cast("int").alias("in_debt"),
        )
        .withColumn(
            "bb",
            F.expr("(cents - ((cents % 100000 + 100000) % 100000)) DIV 100000"),
        )
    )
    anon = k_anonymity_ladder(cust, ["nat", "seg", "bb"], "in_debt", k=8, l=2)
    levels = anon.groupBy("anon_level").count().orderBy("anon_level").collect()
    print("k-anonymity levels:", {r.anon_level: r["count"] for r in levels})
    assert anon.where(F.col("group_n") < 8).count() == 0, "group below k released"

    # ---- 3. metric release: DP sensitivity prep -----------------------
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    clipped = bounded_contribution(
        events, "user_id", "event_type", count_cap=4,
        value_col="value", value_cap_cents=50_000,
    )
    bad = clipped.where(
        (F.col("clipped_count") > F.col("raw_count"))
        | (F.abs(F.col("clipped_cents")) > F.col("n_users") * 50_000)
    ).count()
    assert bad == 0, "clipping invariant broken"
    print("DP clip report:")
    clipped.select(
        "event_type", "raw_count", "clipped_count",
        "n_count_clipped", "count_sensitivity",
    ).show(truncate=False)

    # ---- 4. readout guard: sample-ratio mismatch ----------------------
    srm = ab_srm(events)
    print("SRM guard:")
    srm.orderBy("segment").show(truncate=False)
    flagged = [r.segment for r in srm.where("srm").collect()]
    print("SRM-flagged segments:", flagged or "none — readouts trustworthy")

    print("governance quickstart OK")


if __name__ == "__main__":
    main()
