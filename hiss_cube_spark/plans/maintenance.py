"""Table maintenance for the Parquet warehouse: small-file compaction that
preserves the clustering the query layer depends on.

Continuous ingest (streaming link, micro-batch bronze appends) leaves many
small files per table; scans then pay per-file open/footer costs and lose
row-group min/max pruning power (each tiny file spans a wide key range).
The reference never needs this — HDF5 is one file — but a 100 TB Parquet
deployment compacts routinely. This is the engine-side analog of the
reference's preallocate-then-fill write discipline (processors/data.py:52-73):
keep the physical layout friendly to the read path.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["compact_table", "parquet_file_count"]


def parquet_file_count(path: str) -> int:
    """Number of parquet data files under ``path`` (recursive — counts
    partition subdirectories too)."""
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def compact_table(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ceil(rows / target_rows_per_file) files,
    re-sorting within files by ``sort_cols`` so row-group min/max pruning
    works again after many unordered appends. Returns the new file count.

    The rewrite stages into a sibling directory and then swaps via rename —
    readers either see the old file set or the new one, never a mix. (On
    object stores use a manifest/table format for the swap; the staging
    pattern is the same.)
    """
    df: DataFrame = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // max(1, target_rows_per_file)))
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)

    staging = path.rstrip("/") + "._compact_staging"
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    check = spark.read.parquet(staging)
    if check.count() != n_rows:
        raise RuntimeError(f"compaction row-count drift: {n_rows} -> {check.count()}")

    backup = path.rstrip("/") + "._compact_old"
    os.rename(path, backup)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(backup)
    return parquet_file_count(path)
