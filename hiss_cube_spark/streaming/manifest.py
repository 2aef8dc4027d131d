"""Object-store-safe snapshot commits: a ``_current`` manifest pointer.

``os.rename`` directory swaps are atomic only on a local posix filesystem.
Object stores (S3/GCS/ABFS) have no atomic directory rename — but they DO
have atomic single-object PUT. This module keeps versioned snapshot
directories under one root and commits by rewriting one small ``_current``
file that names the active snapshot — the pointer-flip discipline
Iceberg/Delta use for their metadata pointer, reduced to the single-writer
case our streaming sinks are (one foreachBatch writer per sink; Spark's
checkpoint serializes batches).

Layout::

    root/
      _current        # text: "snap_<batch_id>" — the committed snapshot
      snap_-1/        # initial state (parquet + _last_applied_batch marker)
      snap_3/         # a later committed or staged snapshot

Commit protocol per micro-batch:

1. write the new snapshot parquet to ``root/snap_<batch_id>`` (mode
   overwrite — a replayed epoch rewrites the same directory);
2. write the epoch marker file inside it (stage complete);
3. flip ``_current`` to name it — THE commit point. Locally this is a tmp
   write + ``os.replace`` (atomic); on an object store the equivalent is a
   single small PUT, which is atomic per object;
4. garbage-collect snapshots older than the previous committed one (the
   previous is retained so in-flight readers of the old pointer finish).

Crash analysis: a crash before (3) leaves the pointer on the old snapshot —
the checkpoint replays the batch and the stage directory is overwritten
(idempotent); a crash after (3) makes the replayed batch_id ≤
``last_applied`` and it is skipped; a crash between (3) and (4) leaves only
garbage directories, removed by the next ``recover()``/``commit()``.
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["ManifestSnapshotStore"]

_MARKER = "_last_applied_batch"
# optional c<k> suffix: compaction rewrites of the same batch state
_SNAP_RE = re.compile(r"snap_(-?\d+)(?:c\d+)?$")


class ManifestSnapshotStore:
    """Versioned parquet snapshots under ``root`` with a ``_current``
    pointer commit. Single-writer (one streaming sink), many-reader."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    # -- pointer -----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_current")

    def current_name(self) -> str | None:
        try:
            with open(self._manifest_path()) as fh:
                return fh.read().strip() or None
        except FileNotFoundError:
            return None

    def current_dir(self) -> str:
        name = self.current_name()
        if name is None:
            raise FileNotFoundError(
                f"no committed snapshot under {self.root} (run init() first)"
            )
        return os.path.join(self.root, name)

    def last_applied(self) -> int:
        name = self.current_name()
        if name is None:
            return -(2**31)
        m = _SNAP_RE.search(name)
        return int(m.group(1)) if m else -(2**31)

    # -- write path --------------------------------------------------------
    def _snap_dir(self, batch_id: int) -> str:
        return os.path.join(self.root, f"snap_{batch_id}")

    def stage(self, df: DataFrame, batch_id: int) -> str:
        """Write ``df`` as snapshot ``batch_id`` (overwrite → replay-safe)
        and mark the stage complete. Not yet visible to readers."""
        d = self._snap_dir(batch_id)
        df.write.mode("overwrite").parquet(d)
        with open(os.path.join(d, _MARKER), "w") as fh:
            fh.write(str(batch_id))
        return d

    def commit(self, batch_id: int) -> None:
        """Flip the pointer to snapshot ``batch_id`` (atomic single-file
        replace — the object-store analogue is one PUT), then gc."""
        self._commit_name(f"snap_{batch_id}")

    def _commit_name(self, name: str) -> None:
        prev = self.current_name()
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, self._manifest_path())
        self._gc(keep={name} | ({prev} if prev else set()))

    def compact(
        self,
        spark: SparkSession,
        target_rows_per_file: int,
        sort_cols: list[str] | None = None,
    ) -> str:
        """Rewrite the CURRENT snapshot into ~target-sized, optionally
        re-sorted files and commit it as a new snapshot VERSION of the same
        batch state — small-file maintenance through the same pointer-flip
        protocol the streaming writer uses, so readers never see a mix and
        the sink's replay arithmetic is untouched.

        Version naming is the crux: the rewrite commits as
        ``snap_<batch>c<k>`` — the numeric prefix keeps ``last_applied()``
        (the stream's idempotence cursor) unchanged, and the ``c`` suffix
        keeps the directory disjoint from every future batch's stage dir,
        so a compaction can never be overwritten by an in-flight batch
        staging to its own id. Returns the committed snapshot name."""
        cur = self.current_name()
        if cur is None:
            raise FileNotFoundError(f"nothing to compact under {self.root}")
        m = re.match(r"snap_(-?\d+)(?:c(\d+))?$", cur)
        base, k = int(m.group(1)), int(m.group(2) or 0)
        df = self.read(spark)
        n_rows = df.count()
        n_files = max(1, -(-n_rows // max(1, target_rows_per_file)))
        out = df.repartition(n_files)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        name = f"snap_{base}c{k + 1}"
        d = os.path.join(self.root, name)
        out.write.mode("overwrite").parquet(d)
        if spark.read.parquet(d).count() != n_rows:
            raise RuntimeError("compaction row-count drift")
        with open(os.path.join(d, _MARKER), "w") as fh:
            fh.write(str(base))
        self._commit_name(name)
        return name

    def init(self, df: DataFrame) -> None:
        """Commit ``df`` as the initial snapshot (batch −1) unless a
        committed snapshot already exists."""
        if self.current_name() is None:
            self.stage(df, -1)
            self.commit(-1)

    # -- maintenance -------------------------------------------------------
    def _complete_snaps(self) -> list[tuple[int, str]]:
        out = []
        for d in glob.glob(os.path.join(self.root, "snap_*")):
            m = _SNAP_RE.search(d)
            if m and os.path.exists(os.path.join(d, _MARKER)):
                out.append((int(m.group(1)), d))
        return sorted(out)

    def _gc(self, keep: set[str]) -> None:
        for _, d in self._complete_snaps():
            if os.path.basename(d) not in keep:
                shutil.rmtree(d, ignore_errors=True)

    def recover(self) -> None:
        """Startup repair. The pointer flip is atomic, so ``_current`` is
        either the old or the new snapshot — never half-written. Recovery
        is therefore just hygiene: drop stage directories NEWER than the
        committed snapshot (crash before their commit; the checkpoint will
        replay those batches) and older ones beyond the retained previous.
        If the pointer itself is missing but complete snapshots exist (a
        crash between ``stage`` and ``commit`` during init), adopt the
        newest complete one — its marker proves the stage finished."""
        name = self.current_name()
        snaps = self._complete_snaps()
        if name is None:
            if not snaps:
                raise FileNotFoundError(
                    f"no snapshot under {self.root} to recover (init() first)"
                )
            # adopt the newest complete snapshot BY DIRECTORY NAME: after
            # repeated compactions only c-suffixed versions of a batch may
            # survive, so rebuilding "snap_<id>" from the batch id could
            # commit a dangling pointer and then gc the real directory
            self._commit_name(os.path.basename(snaps[-1][1]))
            return
        cur = self.last_applied()
        for bid, d in snaps:
            if bid > cur:
                shutil.rmtree(d, ignore_errors=True)
        # retain the current snapshot BY NAME (it may be a c-suffixed
        # compaction version — rebuilding the name from the batch id would
        # gc the live directory) + the newest older batch for in-flight
        # readers of the previous pointer
        older = [(b, d) for b, d in snaps if b < cur]
        keep = {name}
        if older:
            keep.add(os.path.basename(max(older)[1]))
        self._gc(keep)

    # -- read path ---------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.current_dir())
