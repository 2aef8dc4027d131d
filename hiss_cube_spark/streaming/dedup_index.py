"""Streaming incremental corpus dedup: a document stream lands into a
deduplicated corpus, checked against a persistent fingerprint index.

The steady-state ingestion shape at 100 TB: the corpus itself is never
re-scanned — each micro-batch is first-occurrence-reduced within itself,
anti-joined against the (hash-only, ~32 B/doc) index, its survivors landed,
and their fingerprints folded into the index. Batch semantics are exactly
`curation.incremental_dedup`, which the `cur_incremental_dedup` oracle
query pins.

Exactly-once discipline mirrors `streaming.cdc.stream_apply_changelog`:

* survivors write to ``corpus_dir/batch=<epoch>`` with overwrite — a
  replayed epoch rewrites the same directory instead of duplicating rows;
* the index swaps via stage → rename with an epoch marker, so a replayed
  epoch is skipped and a crash between the renames is repaired on restart
  (`_recover`). Local paths only, same as the CDC materializer.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hiss_cube_spark.operators.curation import incremental_dedup
from hiss_cube_spark.streaming.cdc import _EPOCH_MARKER, _last_applied, _recover

__all__ = ["stream_incremental_dedup"]


def stream_incremental_dedup(
    docs: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    commit: str = "rename",
):
    """Start a streaming query landing deduplicated documents.

    With ``commit="rename"`` (default, local fast path) ``index_dir`` must
    exist with an initial (possibly empty) one-column ``fp string`` parquet
    table and swaps via sibling-dir rename. With ``commit="manifest"``
    (object-store-safe pointer protocol, see `streaming.manifest`)
    ``index_dir`` is a `ManifestSnapshotStore` root initialized via
    ``ManifestSnapshotStore(index_dir).init(empty_fp_df)``. ``corpus_dir``
    is created on first land either way. Returns the started
    ``StreamingQuery``.
    """
    for p in (corpus_dir, index_dir):
        if "://" in p and not p.startswith("file://"):
            raise ValueError(f"local filesystem path required, got {p!r}")
    spark = docs.sparkSession

    store = None
    if commit == "manifest":
        from hiss_cube_spark.streaming.manifest import ManifestSnapshotStore

        store = ManifestSnapshotStore(index_dir)
        store.recover()
    elif commit == "rename":
        _recover(index_dir)
    else:
        raise ValueError(f"unknown commit protocol {commit!r}")

    def _read_index() -> DataFrame:
        return store.read(spark) if store else spark.read.parquet(index_dir)

    def _last() -> int:
        return store.last_applied() if store else _last_applied(index_dir)

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last():
            return  # replayed epoch: survivors directory already rewritten
        index = _read_index()
        survivors = incremental_dedup(
            batch_df, index, text_col=text_col, id_col=id_col
        )
        # epoch-keyed overwrite: replay rewrites, never duplicates
        survivors.drop("fp").write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
        nxt = index.unionByName(
            spark.read.parquet(
                os.path.join(corpus_dir, f"batch={batch_id}")
            ).select(F.md5(F.col(text_col)).alias("fp"))
        ).distinct()
        if store:
            store.stage(nxt, batch_id)
            store.commit(batch_id)
            return
        staging = index_dir.rstrip("/") + f"._stage_{batch_id}"
        nxt.write.mode("overwrite").parquet(staging)
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
