"""Event-time windowed aggregations — batch/streaming dual-mode.

These functions take any DataFrame (static or streaming) with an event-time
column; in streaming mode add ``.withWatermark(ts, ...)`` upstream and the
same plan runs incrementally with state cleanup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_from_directory",
    "stream_dedup",
]


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window counts/sums (epoch-aligned windows)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("win")] + [F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,8)")).alias("_sv"),
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        *[c for c in (group_cols or [])],
        "n_events",
        F.round(F.col("_sv").cast("double"), 6).alias("sum_value"),
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window/slide overlapping windows (epoch-aligned starts)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window, slide).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    out = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,8)")).alias("_sv"),
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        *[c for c in (group_cols or [])],
        "n_events",
        F.round(F.col("_sv").cast("double"), 6).alias("sum_value"),
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows per key (session = events separated < gap).

    Uses the native ``session_window`` operator; in streaming mode this is a
    stateful merging-session aggregation with watermark-driven eviction.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.session_window(F.col(ts_col), gap).alias("sw")] + [
        F.col(c) for c in (group_cols or [])
    ]
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        *[c for c in (group_cols or [])],
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
    )


def stream_from_directory(spark, path: str, schema, fmt: str = "parquet"):
    """File-source streaming ingest: new files in ``path`` become micro-batches
    feeding the same bronze transformations as the batch path."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication by key: emit only the FIRST arrival of
    each key, across micro-batches.

    The continuous-ingest form of the training-data ``exact_dedup``
    operator. ``dropDuplicatesWithinWatermark`` bounds the dedup state to
    the watermark horizon — exact within it, and state for keys older than
    the watermark is evicted instead of growing without bound (the property
    that matters on an unbounded 100 TB/day ingest stream; a plain
    ``dropDuplicates`` on a stream keeps ALL keys forever). Works in append
    mode: first arrivals emit immediately, duplicates inside the horizon
    are suppressed.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
