"""As-of (time-series) join — an operator Spark has no native primitive for.

Extension beyond the reference (SURVEY.md §2.3 notes it has no as-of joins);
part of the training-data/time-series surface alongside the windowed
aggregations in ``streaming/``.

Implementation is the canonical scalable shape: tag and union both sides,
ONE hash shuffle by the equality keys, sort by (time, side) within each key,
and carry the most recent right-side values across left rows with
``last(..., ignorenulls=True)`` over a running row frame. No range
explosion, no per-row probe: cost is a single shuffle + sort regardless of
time skew, and the window state is one row per value column — the same
plan a forward-fill takes. At 100 TB: partitions are bounded by the key
cardinality, and AQE splits skewed keys; for a single giant key, pre-bucket
by coarse time and as-of join within buckets (carrying the last value of
the previous bucket forward).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "asof_interpolate"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = ("key",),
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row's value columns with the
    largest right ``on`` <= left ``on`` (direction="backward", inclusive) or
    the smallest right ``on`` >= left ``on`` ("forward"), per ``by`` group.

    Left rows with no qualifying right row keep nulls (left-join
    semantics, matching DuckDB's ``ASOF LEFT JOIN`` oracle). Right-side
    (by, on) duplicates should be pre-aggregated by the caller — ties are
    otherwise resolved arbitrarily (same as the oracle).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    val_cols = [c for c in right.columns if c not in set(by) | {on}]
    left_only = [c for c in left.columns if c not in set(by) | {on}]
    if not val_cols:
        raise ValueError("right side has no value columns to attach")
    overlap = set(val_cols) & set(left_only)
    if overlap:
        raise ValueError(f"column name collision between sides: {sorted(overlap)}")

    l = left.withColumn("_is_left", F.lit(1))
    for c in val_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r = right.withColumn("_is_left", F.lit(0))
    for c in left_only:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal time → inclusive match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in val_cols}
    else:
        # left rows sort BEFORE right rows at equal time → inclusive match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = {c: F.first(F.col(c), ignorenulls=True).over(w) for c in val_cols}

    out = u
    for c, expr in picked.items():
        out = out.withColumn(c, expr)
    return out.where(F.col("_is_left") == 1).drop("_is_left")


def asof_interpolate(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = ("key",),
    value_col: str = "v",
) -> DataFrame:
    """As-of join with LINEAR INTERPOLATION: for each left row, the right
    series' value at exactly the left timestamp — v_prev + (v_next−v_prev)
    ·(t−t_prev)/(t_next−t_prev) between the bracketing right points,
    clamped to the nearest endpoint outside the series (sensor fusion /
    quote-at-trade-time with sub-sample alignment).

    Same single-shuffle union shape as `asof_join`, run in BOTH directions
    over one sorted partition: a running `last(… ignorenulls)` carries the
    previous right (t, v) onto each left row, a mirrored
    `first(… ignorenulls)` with a following frame carries the next. A
    right point exactly at the left time brackets from both sides
    (t_prev = t_next) and short-circuits to its own value. Adds
    (prev_ts, next_ts, v_interp) to the left rows; the interpolation
    arithmetic is all correctly-rounded IEEE, so results are engine-exact.
    """
    by = list(by)
    ts_t = right.schema[on].dataType
    v_t = right.schema[value_col].dataType
    l = (
        left.withColumn("_is_left", F.lit(1))
        .withColumn("_rt", F.lit(None).cast(ts_t))
        .withColumn("_rv", F.lit(None).cast(v_t))
    )
    left_only = [c for c in left.columns if c not in set(by) | {on}]
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_is_left"),
        F.col(on).alias("_rt"),
        F.col(value_col).alias("_rv"),
    )
    for c in left_only:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r)

    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = (
        u.withColumn("_pt", F.last("_rt", ignorenulls=True).over(wb))
        .withColumn("_pv", F.last("_rv", ignorenulls=True).over(wb))
        .withColumn("_nt", F.first("_rt", ignorenulls=True).over(wf))
        .withColumn("_nv", F.first("_rv", ignorenulls=True).over(wf))
    )
    t = F.col(on).cast("double")
    pt, nt = F.col("_pt").cast("double"), F.col("_nt").cast("double")
    pv, nv = F.col("_pv").cast("double"), F.col("_nv").cast("double")
    interp = (
        F.when(F.col("_pt").isNotNull() & F.col("_nt").isNotNull(),
               F.when(F.col("_nt") == F.col("_pt"), pv)
                .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt)))
        .when(F.col("_pt").isNotNull(), pv)
        .when(F.col("_nt").isNotNull(), nv)
    )
    return (
        u.where(F.col("_is_left") == 1)
        .withColumn("v_interp", interp)
        .withColumnRenamed("_pt", "prev_ts")
        .withColumnRenamed("_nt", "next_ts")
        .drop("_is_left", "_rt", "_rv", "_pv", "_nv")
    )
