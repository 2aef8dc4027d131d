"""Streaming NEAR-duplicate corpus dedup: a document stream lands into a
near-deduplicated corpus, checked against a persistent minhash signature
index — the fuzzy sibling of `streaming.dedup_index.stream_incremental_dedup`.

State is parquet, not executor memory: the index is one partitioned table
(``kind=sig`` rows carry (doc_id, sig array<long>) at ~1 KB/doc; ``kind=band``
rows carry (doc_id, band_id, band_hash) at 32 x 24 B/doc), so the steady
growth is ~1.8 KB per accepted document regardless of document size, and a
restart re-reads nothing but the index. Batch semantics are exactly
`curation.incremental_neardup`, which the `stream_neardup_minhash` oracle
query pins (band-bucket candidates, signature-estimated Jaccard gate,
min-id connected components within the batch).

Exactly-once discipline mirrors `streaming.cdc.stream_apply_changelog`:
survivors write to ``corpus_dir/batch=<epoch>`` with overwrite (a replayed
epoch rewrites, never duplicates), and the index swaps via stage -> rename
with an epoch marker so a replayed epoch is skipped and a crash between the
renames is repaired on restart (`_recover`). Local paths only, same as the
CDC materializer — on object stores the swap becomes a table-format commit.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hiss_cube_spark.operators.curation import incremental_neardup
from hiss_cube_spark.streaming.cdc import _EPOCH_MARKER, _last_applied, _recover

__all__ = ["init_neardup_index", "stream_neardup_minhash"]

_INDEX_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("doc_id", LongType()),
        StructField("band_id", IntegerType()),
        StructField("band_hash", LongType()),
        StructField("sig", ArrayType(LongType())),
    ]
)


def init_neardup_index(spark: SparkSession, index_dir: str) -> None:
    """Write an empty near-dup index. Reads supply ``_INDEX_SCHEMA``
    explicitly, so the fileless initial directory scans as zero rows."""
    spark.createDataFrame([], _INDEX_SCHEMA).write.mode("overwrite").partitionBy(
        "kind"
    ).parquet(index_dir)


def _split_index(spark: SparkSession, index_dir: str):
    idx = spark.read.schema(_INDEX_SCHEMA).parquet(index_dir)
    sigs = idx.where(F.col("kind") == "sig").select("doc_id", "sig")
    bands = idx.where(F.col("kind") == "band").select(
        "band_id", "band_hash", "doc_id"
    )
    return sigs, bands


def stream_neardup_minhash(
    docs: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 128,
    bands: int = 32,
):
    """Start a streaming query landing near-deduplicated documents.

    ``index_dir`` must exist (see `init_neardup_index`); ``corpus_dir`` is
    created on first land. Returns the started ``StreamingQuery``.
    """
    for p in (corpus_dir, index_dir):
        if "://" in p and not p.startswith("file://"):
            raise ValueError(f"local filesystem path required, got {p!r}")
    _recover(index_dir)
    spark = docs.sparkSession

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied(index_dir):
            return  # replayed epoch: survivors directory already rewritten
        sigs, band_rows = _split_index(spark, index_dir)
        survivors = incremental_neardup(
            batch_df,
            sigs,
            band_rows,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            n=n,
            n_hashes=n_hashes,
            bands=bands,
        )
        # epoch-keyed overwrite: replay rewrites, never duplicates
        survivors.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
        landed = spark.read.parquet(os.path.join(corpus_dir, f"batch={batch_id}"))
        new_sigs = landed.select(
            F.lit("sig").alias("kind"),
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(None).cast("int").alias("band_id"),
            F.lit(None).cast("long").alias("band_hash"),
            "sig",
        )
        new_bands = landed.select(
            F.lit("band").alias("kind"),
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode("bands").alias("band_id", "band_hash"),
        ).select(
            "kind",
            "doc_id",
            "band_id",
            "band_hash",
            F.lit(None).cast("array<long>").alias("sig"),
        )
        staging = index_dir.rstrip("/") + f"._stage_{batch_id}"
        (
            spark.read.schema(_INDEX_SCHEMA)
            .parquet(index_dir)
            .unionByName(new_sigs)
            .unionByName(new_bands)
            .write.mode("overwrite")
            .partitionBy("kind")
            .parquet(staging)
        )
        with open(os.path.join(staging, _EPOCH_MARKER), "w") as fh:
            fh.write(str(batch_id))
        backup = index_dir.rstrip("/") + "._old"
        os.rename(index_dir, backup)
        os.rename(staging, index_dir)
        shutil.rmtree(backup)

    return (
        docs.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
