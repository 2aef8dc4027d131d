"""Streaming CDC materialization: a changelog stream keeps a Parquet
snapshot current — the `foreachBatch` pattern that turns the batch
`apply_changelog` MERGE into a continuously-maintained materialized view.

Each micro-batch folds its I/U/D rows into the persisted snapshot with the
batch operator (exactly the same semantics the oracle pins), stages the
next snapshot, and commits atomically — readers see the old state or the
new state, never a mix. Two protocols: sibling-dir rename (local posix
fast path, same discipline as plans/maintenance.compact_table) or the
``commit="manifest"`` pointer flip (`streaming.manifest` — versioned
snapshot dirs + one ``_current`` file, the object-store-safe protocol).

Exactly-once: `foreachBatch` replays a batch after failure with the same
batch_id; the epoch marker written beside the snapshot makes the fold
idempotent — a replayed batch_id is skipped instead of double-applied.

Scale shape per batch: one window over the delta (small by definition) and
one full-outer join against the snapshot — identical to the batch MERGE;
nothing re-reads history.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

from hiss_cube_spark.operators.cdc import apply_changelog

__all__ = ["stream_apply_changelog"]

_EPOCH_MARKER = "_last_applied_batch"


def _last_applied(snapshot_dir: str) -> int:
    try:
        with open(os.path.join(snapshot_dir, _EPOCH_MARKER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return -1


def _stage_id(path: str) -> int:
    try:
        return int(path.rsplit("._stage_", 1)[1])
    except (IndexError, ValueError):
        return -1


def _recover(snapshot_dir: str) -> None:
    """Repair a crash between the two swap renames.

    The swap is rename(snapshot→backup); rename(staging→snapshot);
    rmtree(backup) — a crash in the middle can leave ``snapshot_dir``
    missing. A staging dir whose epoch marker was written is complete
    (marker is the last file staged), so finishing the swap with the newest
    complete stage is safe; otherwise the backup restores the pre-batch
    state and the checkpoint replays the batch onto it.
    """
    base = snapshot_dir.rstrip("/")
    backup = base + "._old"
    if not os.path.exists(snapshot_dir):
        stages = sorted(
            (s for s in glob.glob(base + "._stage_*")
             if os.path.exists(os.path.join(s, _EPOCH_MARKER))),
            key=_stage_id,
        )
        if stages:
            os.rename(stages[-1], snapshot_dir)
        elif os.path.exists(backup):
            os.rename(backup, snapshot_dir)
        else:
            raise FileNotFoundError(
                f"snapshot {snapshot_dir} missing and no backup/staging to recover"
            )
    if os.path.exists(backup):
        shutil.rmtree(backup)
    for s in glob.glob(base + "._stage_*"):
        shutil.rmtree(s, ignore_errors=True)


def stream_apply_changelog(
    changes: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_col: str = "key",
    seq_col: str = "seq",
    op_col: str = "op",
    commit: str = "rename",
):
    """Start a streaming query that maintains ``snapshot_dir`` from the
    changelog stream ``changes`` (columns: seq, op, key, values...).

    Two commit protocols:

    * ``commit="rename"`` (default, local fast path): ``snapshot_dir`` IS
      the parquet directory and must exist with an initial state; each
      batch stages a sibling dir and swaps via rename — atomic only on a
      local posix fs.
    * ``commit="manifest"`` (object-store-safe protocol): ``snapshot_dir``
      is a `ManifestSnapshotStore` root — versioned ``snap_<epoch>``
      directories plus one small ``_current`` pointer file whose rewrite
      is the commit (locally ``os.replace``; on an object store the same
      protocol is one atomic PUT). Initialize with
      ``ManifestSnapshotStore(root).init(initial_df)``; read with
      ``.read(spark)``.

    Returns the started ``StreamingQuery``; callers own
    awaitTermination/stop.
    """
    if "://" in snapshot_dir and not snapshot_dir.startswith("file://"):
        raise ValueError(
            f"stream_apply_changelog requires a local snapshot path, got {snapshot_dir!r}"
        )
    spark = changes.sparkSession

    if commit == "manifest":
        from hiss_cube_spark.streaming.manifest import ManifestSnapshotStore

        store = ManifestSnapshotStore(snapshot_dir)
        store.recover()

        def _fold(batch_df: DataFrame, batch_id: int) -> None:
            if batch_id <= store.last_applied():
                return  # replayed epoch after a post-commit crash
            nxt = apply_changelog(
                store.read(spark), batch_df, key_col, seq_col, op_col
            )
            store.stage(nxt, batch_id)
            store.commit(batch_id)

    elif commit == "rename":
        _recover(snapshot_dir)

        def _fold(batch_df: DataFrame, batch_id: int) -> None:
            if batch_id <= _last_applied(snapshot_dir):
                return  # replayed epoch after recovery: already folded in
            snap = spark.read.parquet(snapshot_dir)
            nxt = apply_changelog(snap, batch_df, key_col, seq_col, op_col)
            staging = snapshot_dir.rstrip("/") + f"._stage_{batch_id}"
            nxt.write.mode("overwrite").parquet(staging)
            with open(os.path.join(staging, _EPOCH_MARKER), "w") as fh:
                fh.write(str(batch_id))
            backup = snapshot_dir.rstrip("/") + "._old"
            os.rename(snapshot_dir, backup)
            os.rename(staging, snapshot_dir)
            shutil.rmtree(backup)

    else:
        raise ValueError(f"unknown commit protocol {commit!r}")

    return (
        changes.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
