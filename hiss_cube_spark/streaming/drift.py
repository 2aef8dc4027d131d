"""Streaming distribution-drift monitor: per-micro-batch exact KS against a
frozen reference distribution, appended to a monitor table — the production
"is today's data still shaped like the training data?" alarm.

Shape: the reference collapses ONCE to per-distinct-value counts (cached —
value-domain-bounded, tiny), each micro-batch runs the same integer-exact KS
core as `quality_checks.ks_drift_grouped` with the batch as the single
group, and the (batch_id, ks_stat, at_value, n_batch) row lands
epoch-keyed, so checkpoint replays rewrite rather than duplicate — the same
exactly-once discipline as the streaming dedup/CDC sinks. State is zero:
each batch compares independently against the frozen reference, so no
watermark, no store, restart-safe by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_drift_monitor"]


def stream_drift_monitor(
    values: DataFrame,
    reference: DataFrame,
    monitor_dir: str,
    checkpoint_dir: str,
    value_col: str = "v",
):
    """Start a streaming query appending one KS row per micro-batch.

    ``values``: streaming DataFrame with ``value_col``. ``reference``: a
    BATCH DataFrame with the same column — the frozen baseline. Returns the
    started ``StreamingQuery``; read ``monitor_dir`` for the drift series.
    """
    from hiss_cube_spark.operators.quality_checks import ks_drift_grouped

    spark = values.sparkSession
    ref = reference.select(F.col(value_col)).cache()
    ref.count()  # materialize once; per-value collapse happens per plan reuse

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = os.path.join(monitor_dir, f"batch={batch_id}")
        cur = batch_df.select(
            F.lit(int(batch_id)).alias("g"), F.col(value_col)
        )
        if cur.isEmpty():
            return
        row = ks_drift_grouped(cur, ref, value_col, "g").select(
            F.col("g").cast("long").alias("batch_id"),
            "ks_stat",
            "at_value",
            F.col("n_group").alias("n_batch"),
            "n_ref",
        )
        # epoch-keyed overwrite: a replayed batch rewrites its own row
        row.write.mode("overwrite").parquet(out_dir)

    return (
        values.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
