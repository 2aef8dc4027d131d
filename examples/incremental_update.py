"""Incremental corpus maintenance: the steady-state loop that follows the
one-shot curation of ``train_pipeline.py`` once a corpus is live and new
data arrives in batches.

    persisted state:  corpus snapshot  +  fingerprint index (hash-only)
    per batch:
      new documents
        → incremental dedup      (within-batch firsts, anti-join vs index)
        → quality + LM gates     (row-local scores; corpus-trained bigram LM)
        → chunk for embedding    (overlapping token windows, zero shuffle)
      snapshot maintenance:
        → table_diff             (what changed vs the previous snapshot)
        → apply_changelog        (fold the delta in; full-outer on the key)
        → scd2_history           (queryable version history of every doc)

At 100 TB the invariant that matters: the corpus itself is never
re-scanned — the index is hash-only (~32 B/doc), the delta-side window and
joins touch only the incoming batch, and the snapshot join co-locates when
the snapshot is bucketed by key.

Run:  python examples/incremental_update.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index: DataFrame,
    min_lm_score: float = 0.0,
) -> dict[str, DataFrame]:
    """One incremental-ingest round; returns the new artifacts."""
    from hiss_cube_spark.operators.curation import chunk_documents, incremental_dedup
    from hiss_cube_spark.operators.text_analysis import bigram_lm_score, quality_filter

    # 1. drop what the corpus has already seen (or the batch repeats)
    fresh = incremental_dedup(batch, index)

    # 2. gates: rule-based quality + corpus-trained LM likelihood
    passing = quality_filter(fresh).where(F.col("keep")).select("doc_id")
    gated = fresh.join(passing, "doc_id", "left_semi")
    lm = bigram_lm_score(gated).where(F.col("lm_score") >= min_lm_score)
    accepted = gated.join(lm.select("doc_id"), "doc_id", "left_semi")

    # 3. pre-embedding chunks for the similarity index
    chunks = chunk_documents(accepted, size=32, overlap=8)

    # 4. the index grows by exactly the accepted fingerprints
    new_index = index.unionByName(accepted.select("fp")).distinct()
    return {"accepted": accepted, "chunks": chunks, "index": new_index}


def maintain_snapshot(
    snapshot: DataFrame, next_snapshot: DataFrame
) -> dict[str, DataFrame]:
    """Derive the changelog between snapshots and its SCD2 history."""
    from hiss_cube_spark.operators.cdc import apply_changelog, scd2_history, table_diff

    diff = table_diff(snapshot, next_snapshot, key_col="doc_id").withColumn(
        "seq", F.monotonically_increasing_id()
    )
    applied = apply_changelog(snapshot, diff, key_col="doc_id")
    history = scd2_history(diff, key_col="doc_id")
    return {"changelog": diff, "applied": applied, "history": history}


def main() -> None:
    from hiss_cube_spark.operators.curation import build_dedup_index
    from hiss_cube_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-update")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # day 0: corpus = even doc_ids; day 1: the rest arrives
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    index = build_dedup_index(corpus)

    arts = ingest_batch(spark, batch.select("doc_id", "text", "source"), index)
    n_batch, n_acc = batch.count(), arts["accepted"].count()
    print(f"batch {n_batch} -> accepted {n_acc}, chunks {arts['chunks'].count()}")

    snap = corpus.select("doc_id", "text")
    nxt = corpus.select("doc_id", "text").unionByName(
        arts["accepted"].select("doc_id", "text")
    )
    m = maintain_snapshot(snap, nxt)
    print(
        "changelog", m["changelog"].count(),
        "applied", m["applied"].count(),
        "history", m["history"].count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
