"""Streaming mergeable quantile sketch: the log-bucket sketch
(`operators/quality_checks.logbucket_sketch`) maintained as a stateful
streaming aggregation — the "what is p99 of the metric RIGHT NOW"
monitor that never stores raw values.

Shape: the bucket index is a row-local integer expression, so the whole
operator is one built-in streaming groupBy(bucket).count() — Spark's
state store holds ≤ ~1k counters (value-DOMAIN-bounded, not
corpus-bounded), complete-mode emits the full current sketch each epoch,
and foreachBatch overwrites one snapshot directory (idempotent rewrite =
exactly-once on replay, the drift/CDC sink discipline). Because the
sketch is MERGEABLE with exact integer counts, the streamed cumulative
sketch equals the batch sketch over all data seen — bit-for-bit, which
the test asserts — and `logbucket_estimate` reads quantiles off either
identically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["stream_quantile_sketch"]


def stream_quantile_sketch(
    values: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
    value_col: str = "v",
):
    """Start the streaming sketch; returns the StreamingQuery.

    ``values``: streaming DataFrame with a positive-BIGINT ``value_col``
    (cents-quantize upstream). The current sketch is always at
    ``{sketch_dir}/latest`` as (bucket, n) parquet.
    """
    from hiss_cube_spark.operators.quality_checks import logbucket_sketch

    agg = logbucket_sketch(values, value_col)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        # complete mode: batch_df IS the whole current sketch; rewrite
        # the snapshot (a replayed epoch rewrites identical content)
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, "latest")
        )

    return (
        agg.writeStream.outputMode("complete")
        .foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
