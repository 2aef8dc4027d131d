"""Time-series regularization: resample an irregular event stream onto a
fixed time grid with gap filling (last-observation-carried-forward).

The relational analog of the reference's spectrum rebin onto a fixed
wavelength grid (hisscube/utils/photometry.py:343-350 rebins irregular
samples to a common 4620-point grid): here the grid is time buckets and the
interpolation rule is LOCF — the standard feature-engineering step before
windowed models.

Scale shape: one shuffle to bucket the events (map-side combine keeps a
single survivor per (key, bucket) partial), the grid generation is a
row-local ``sequence``/``explode`` whose output is proportional to
span × keys (never to raw event count), and the fill is one window pass per
key — at 100 TB the expensive cardinality (raw events) is reduced *before*
the grid join, and keys partition independently across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["resample_locf"]


def resample_locf(
    df: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Resample per-key events onto a dense ``bucket_us`` grid with LOCF.

    Per key: buckets run from the key's first to its last observation; a
    bucket's observed value is the value of the LAST event inside it (ties on
    timestamp broken by ``id_col`` — deterministic across engines); empty
    buckets carry the previous bucket's value forward (``is_gap = 1``).

    Every bucket from min to max has a non-null value because bucket 0 is by
    construction observed (the key's first event lives in it).
    """
    # Integer division: double division + cast can round a just-below-boundary
    # timestamp up into the next bucket; DIV matches DuckDB's `//` exactly.
    bucket = F.expr(f"CAST({ts_us_col} AS BIGINT) DIV {int(bucket_us)}").alias("bucket")
    events = df.select(F.col(key_col).alias("key"), bucket, F.col(value_col).alias("v"),
                       F.col(ts_us_col).alias("ts_us"), F.col(id_col).alias("oid"))

    # One survivor per (key, bucket): last event by (ts, id). row_number over
    # a composite order matches DuckDB exactly (max_by tie rules would not).
    w_last = Window.partitionBy("key", "bucket").orderBy(
        F.desc("ts_us"), F.desc("oid")
    )
    series = (
        events.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("key", "bucket", "v")
    )

    # Dense per-key grid: sequence is row-local; output size = span, not events.
    span = series.groupBy("key").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = span.select(
        "key", F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket")
    )

    # LOCF: left join the grid onto the sparse series, then carry the last
    # non-null value forward within each key (one window pass, rows
    # unbounded-preceding..current — streaming-friendly frame).
    w_fill = Window.partitionBy("key").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = grid.join(series, ["key", "bucket"], "left")
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        F.last("v", ignorenulls=True).over(w_fill).alias(value_col),
        F.when(F.col("v").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )
