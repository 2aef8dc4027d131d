"""Structured Streaming surface: file-source micro-batch ingest feeding the
same windowed aggregations as batch (the batch oracle validates semantics)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


def test_file_stream_tumbling_window(spark, tmp_path_factory):
    from hiss_cube_spark.streaming import tumbling_window_agg
    from hiss_cube_spark.streaming.windows import stream_from_directory

    src = str(tmp_path_factory.mktemp("stream_src"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    batch = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", "click", 1.0),
            (2, "2024-01-01 00:25:00", "click", 2.0),
            (3, "2024-01-01 01:05:00", "view", 3.0),
            (4, "2024-01-01 01:45:00", "click", 4.0),
        ],
        "event_id long, ts_s string, event_type string, value double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    batch.write.mode("overwrite").parquet(src)

    stream = stream_from_directory(spark, src, batch.schema, fmt="parquet")
    assert stream.isStreaming
    agg = tumbling_window_agg(stream, ts_col="ts", window="1 hour",
                              group_cols=["event_type"], watermark="2 hours")
    # complete mode + memory sink: a single availableNow micro-batch emits
    # every window (append mode would wait for a later batch to close them)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_agg")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {(r["window_start"].isoformat(), r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM stream_agg").collect()}

    # batch run of the SAME transformation over the same files must agree
    batch_agg = tumbling_window_agg(spark.read.parquet(src), ts_col="ts",
                                    window="1 hour", group_cols=["event_type"])
    b = {(r["window_start"].isoformat(), r["event_type"]): (r["n_events"], r["sum_value"])
         for r in batch_agg.collect()}
    assert rows == b
    assert rows[("2024-01-01T00:00:00", "click")] == (2, 3.0)
    assert rows[("2024-01-01T01:00:00", "view")] == (1, 3.0)
