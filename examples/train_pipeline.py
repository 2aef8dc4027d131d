"""End-to-end training-data curation pipeline over the `documents` table.

The composition a 100 TB pretraining-data run executes, stage by stage —
every stage is one of this engine's operators, so the whole pipeline is a
single lazy DataFrame program until the final writes:

    raw corpus
      → exact dedup                  (hash-groupBy, keeps first by doc_id)
      → near-dup pair mining         (n-gram Jaccard, AllPairs prefix filter)
      → cluster resolution           (connected components → 1 doc/cluster)
      → benchmark decontamination    (n-gram anti-join vs the held-out set)
      → quality + repetition gates   (row-local column math)
      → deterministic split          (hash buckets: train/val/test)
      → sequence packing             (concat-and-chunk into context windows)
      → corpus report                (per-source data card)

Run:  python examples/train_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, docs: DataFrame, benchmark: DataFrame) -> dict[str, DataFrame]:
    """Full curation pass; returns the stage outputs that would be persisted."""
    from hiss_cube_spark.operators.clusters import resolve_duplicates
    from hiss_cube_spark.operators.curation import (
        corpus_report,
        decontaminate,
        hash_split,
        pack_sequences,
    )
    from hiss_cube_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
    from hiss_cube_spark.operators.text_analysis import quality_score, repetition_score

    # 1. exact dedup (keep each text's canonical doc), then near-dup cluster
    # resolution on what remains
    canonical = exact_dedup(docs).select(F.col("canonical_id").alias("doc_id"))
    docs = docs.join(canonical, "doc_id", "left_semi")
    eligible = docs.where(F.size(F.split("text", " ")) >= 3)
    pairs = ngram_jaccard_pairs(eligible, threshold=0.8, n=3, prefix_filter=True)
    docs = resolve_duplicates(docs, pairs)

    # 2. benchmark decontamination (5-grams; see cur_decontaminate rationale)
    docs = decontaminate(docs, benchmark, n=5)

    # 3. quality + repetition gates (row-local; thresholds are corpus policy)
    q = quality_score(docs).select("doc_id", "quality")
    r = repetition_score(docs).select("doc_id", "dup_token_frac")
    docs = (
        docs.join(q, "doc_id")
        .join(r, "doc_id")
        .where((F.col("quality") >= 0.5) & (F.col("dup_token_frac") <= 0.6))
        .drop("quality", "dup_token_frac")
    )

    # 4. deterministic split + packing of the train shard
    split = hash_split(docs)
    train = split.where(F.col("split") == "train").drop("split")
    packed = pack_sequences(train, capacity=512, shard_col="source")

    return {
        "curated": docs,
        "split": split,
        "packed_train": packed,
        "report": corpus_report(docs),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_pipeline_out"
    from hiss_cube_spark import get_spark

    spark = get_spark("train-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    benchmark = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    outs = curate(spark, corpus, benchmark)
    for name, df in outs.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
        print(f"{name}: {spark.read.parquet(os.path.join(out_dir, name)).count()} rows")


if __name__ == "__main__":
    main()
