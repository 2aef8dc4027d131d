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

__all__ = ["resample_locf", "ewma"]


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


def ewma(
    df: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
    id_col: str = "event_id",
    horizon: int = 60,
) -> DataFrame:
    """Exponentially-weighted moving average per key, α = 1/2 (exact).

    Semantics: order each key's events by (ts, id); ``y_1 = x_1`` and
    ``y_i = (x_i + y_{i-1}) / 2``. The recursion has the closed form
    ``y_i = (x_1 + Σ_{j≤i} 2^{j-1} x_j) / 2^i``, which this operator
    evaluates with *integer* arithmetic: values are quantized to cents
    (``xq = round(100·x)``) and the numerator is a cumulative DECIMAL(38,0)
    sum of ``xq_j · 2^{j-1}`` — exact and order-independent, so the result
    is bit-identical across engines (same trick as the Simpson-diversity
    rational score). Only the final division produces a double.

    ``horizon`` bounds the series at the first ``horizon`` events per key:
    with α = 1/2 a term older than 60 steps contributes < 2⁻⁶⁰ ≈ 8.7e-19
    relative — far below round-to-6 resolution — so a production deployment
    would run a rolling 60-step horizon; the bound also keeps the 2^{j-1}
    factors exactly representable (DECIMAL(38) holds Σ 6e4·2⁵⁹ ≈ 2e24).

    Scale shape: one shuffle (hash by key), two window passes over the same
    partitioning (rank + cumulative sum — Spark reuses the sort), no joins,
    no data-dependent driver work. Keys spread independently at 100 TB.
    """
    if horizon > 100:
        raise ValueError("horizon > 100 overflows DECIMAL(38) numerators")
    w_ord = Window.partitionBy("key").orderBy("ts_us", "oid")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_us_col).alias("ts_us"),
        F.col(id_col).alias("oid"),
        F.round(F.col(value_col) * 100).cast("decimal(12,0)").alias("xq"),
    )
    ranked = e.withColumn("rn", F.row_number().over(w_ord)).where(
        F.col("rn") <= horizon
    )
    # c_j = xq_j * 2^(j-1): power(2, rn-1) is an exact double for rn ≤ 100,
    # and the DECIMAL cast preserves it exactly.
    c = ranked.withColumn(
        "c",
        (
            F.col("xq")
            * F.expr("CAST(power(2, rn - 1) AS DECIMAL(26,0))")
        ).cast("decimal(38,0)"),
    )
    return c.select(
        F.col("key").alias(key_col),
        "ts_us",
        F.col("oid").alias(id_col),
        "rn",
        (F.col("xq").cast("double") / 100).alias(value_col),
        # NOT rounded: the numerator is exact, /2^rn only shifts the
        # exponent, and /100 is one IEEE-nearest step — so the double is
        # bit-identical across engines. round(6) would *break* parity: the
        # exact value N/(2^rn·100) can tie at the 7th decimal, and Spark
        # (BigDecimal HALF_UP) and DuckDB (scaled-multiply) break such ties
        # against different intermediate representations.
        (
            (F.first("xq").over(w_cum) + F.sum("c").over(w_cum)).cast("double")
            / F.expr("power(2, rn)")
            / 100
        ).alias("ewma"),
    )
