"""Dataset-curation operators: invariants beyond the oracle-parity gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hiss_cube_spark.operators.curation import balanced_sample, hash_split, pack_sequences


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_split_partition_and_stability(docs):
    out = hash_split(docs)
    n = docs.count()
    by = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(by.values()) == n  # total partition: every row in exactly one split
    assert set(by) <= {"train", "val", "test"}
    assert by["train"] > by.get("val", 0) and by["train"] > by.get("test", 0)
    # pure function of the key: dropping rows never reassigns the others
    half = hash_split(docs.where(F.col("doc_id") % 2 == 0))
    joined = out.alias("a").join(half.alias("b"), "doc_id").where(
        F.col("a.split") != F.col("b.split")
    )
    assert joined.count() == 0


def test_pack_sequences_reconstructs_stream(docs):
    capacity = 512
    out = pack_sequences(docs, capacity=capacity, shard_col="source").collect()
    # regroup per shard in doc order and replay the greedy concat
    shards: dict[str, list] = {}
    for r in out:
        shards.setdefault(r["source"], []).append(r)
    for rows in shards.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["bin_id"] == cum // capacity
            assert r["chunk_offset"] == cum % capacity
            cum += r["n_tokens"]
    # offsets always inside the window
    assert all(0 <= r["chunk_offset"] < capacity for r in out)


def test_balanced_sample_k_per_label(docs):
    k = 7
    out = balanced_sample(docs, k=k, label_col="lang")
    sizes = out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    label_sizes = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for r in sizes:
        assert r["cnt"] == min(k, label_sizes[r["lang"]])
    # deterministic: same result twice
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in balanced_sample(docs, k=k, label_col="lang").collect())
    assert a == b
