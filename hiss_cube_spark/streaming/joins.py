"""Stream-stream event-time interval join — batch/streaming dual-mode.

The reference engine is batch-only (SURVEY.md §2.9); this is the streaming
extension of its equi-join surface: correlate two unbounded event streams on
a key within a bounded event-time interval (the click→purchase attribution
shape). The same plan runs as a plain join in batch mode, which is how the
DuckDB oracle validates it.

Scale notes (100 TB/day streams): the watermark + time-range condition is
what makes the state bounded — Spark keeps only rows younger than
(watermark + interval width) per side, evicting the rest. Without the range
condition a stream-stream inner join must buffer BOTH streams forever. The
join itself shuffles both sides by key; key skew is handled by AQE in batch
and by `spark.sql.streaming.statefulOperator` partitioning in streaming.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_event_join"]


def interval_event_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join right-events to left-events on key columns with
    ``left.ts + lower <= right.ts <= left.ts + upper`` (event time).

    Output columns are prefixed ``l_``/``r_`` (both sides usually share a
    schema, e.g. the same event stream filtered two ways). In streaming
    mode pass ``watermark``: both sides get ``withWatermark`` and the range
    condition lets the state store evict rows outside the horizon — the
    two conditions Spark requires for an unbounded-safe stream-stream join.
    """
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"l_{k}") == F.col(f"r_{k}") for k in on],
        (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}")),
    )
    return l.join(r, cond, how)
