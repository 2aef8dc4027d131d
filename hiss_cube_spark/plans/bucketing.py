"""Bucketed warehouse layout: pre-shuffled tables for co-located joins.

At 100 TB the dominant recurring cost of a fact⋈fact join is the shuffle —
every query over (lineitem ⋈ orders), (events ⋈ users), (corpus ⋈ index)
re-pays an all-to-all exchange of both sides. Hive-style bucketing pays
that shuffle ONCE at write time: both tables are written pre-hashed into
the same number of buckets on the join key (``bucketBy``) and pre-sorted
within each bucket (``sortBy``); every subsequent equi-join on that key is
planned as a sort-merge join with NO Exchange on either side (and, with
``sortBy``, no per-task Sort either). Spark also prunes buckets on
key-equality filters — a point lookup reads 1/n of the files.

This is the storage-layout analog of the reference's sorted semi-sparse
cube (pipeline `sortWithinPartitions` on the healpix range key): organize
bytes at ingest so the query-time plan degenerates to a scan.

Local caveat encoded here: ``bucketBy`` requires ``saveAsTable`` (bucket
metadata lives in the catalog, not in parquet footers), so tables are
written as EXTERNAL tables at an explicit ``path`` — the session's
in-memory Derby catalog works fine and nothing leaks outside the caller's
directory.

Bucket-pruning caveat: with ``spark.sql.sources.bucketing.autoBucketedScan
.enabled`` (default true) the planner converts the bucketed scan back to a
plain one for queries that get no partitioning benefit (no join/agg on the
bucket key) — which ALSO discards bucket pruning on key-equality filters.
For a point-lookup workload on a bucketed table, disable autoBucketedScan
so the scan reads 1/n of the files (``SelectedBucketsCount`` in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key_cols: list[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed (and optionally sorted) table.

    ``n_buckets`` must match between co-joined tables (Spark only elides
    the exchange when both sides agree); pick it like you would pick
    shuffle partitions for the FACT side — enough that one bucket fits an
    executor — and reuse everywhere. This is the pay-once shuffle: the
    write itself hash-distributes by ``key_cols``.
    """
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(int(n_buckets), *key_cols)
    )
    if sort:
        w = w.sortBy(*key_cols)
    w.saveAsTable(table)


def join_exchange_count(joined: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the final physical plan —
    0 for a properly co-located bucketed join. Plan-level, no execution.

    Counts only ShuffleExchange nodes (printed as a bare ``Exchange``):
    ``BroadcastExchange`` (no all-to-all shuffle) and ``ReusedExchange``
    (a pointer to an already-counted one) are excluded, so the value is a
    true shuffle count, not a substring tally."""
    import re

    # AQE finalizes the plan lazily; the initial executedPlan string still
    # shows the static Exchanges, which is what bucketing elides.
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<![A-Za-z])Exchange\b", plan))


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on their bucket key.

    The MERGE hint pins the sort-merge strategy: it is the plan bucketing
    accelerates (zero exchange, zero sort), and at fact⋈fact scale it is
    the strategy you want anyway — without the hint a locally-tiny side
    would broadcast and hide the demonstration."""
    return (
        spark.table(left_table).hint("merge").join(spark.table(right_table), on)
    )
