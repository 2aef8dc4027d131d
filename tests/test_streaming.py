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


def test_watermark_drops_late_data(spark, tmp_path_factory):
    """Watermark semantics across checkpointed runs: append mode emits a
    window only once its end passes the watermark, and events older than the
    watermark are dropped instead of reopening closed windows.

    A row is late only when its WINDOW END is below the watermark (a row
    merely older than the watermark still merges into its open window).
    Three availableNow runs over one checkpoint (each run includes a flush
    micro-batch, so a window closed by that run's watermark emits in-run):
      run 1: events 00:05, 00:25, 02:05 → watermark 01:35 → [00:00,01:00)
             finalizes with n=2.
      run 2: late 00:40 (window end 01:00 < wm 01:35 → DROPPED — its state
             was already evicted; acceptance would resurrect and re-emit
             the window) + on-time 03:05 → no newly closed windows.
      run 3: 04:30 → watermark 04:00 → [02:00) and [03:00) finalize.
    """
    import glob as _glob

    from hiss_cube_spark.streaming import tumbling_window_agg
    from hiss_cube_spark.streaming.windows import stream_from_directory

    src = str(tmp_path_factory.mktemp("wm_src"))
    out = str(tmp_path_factory.mktemp("wm_out"))
    ckpt = str(tmp_path_factory.mktemp("wm_ckpt"))

    schema = "event_id long, ts timestamp, event_type string, value double"

    def _stage(rows, part):
        spark.createDataFrame(
            [(i, t, e, v) for i, t, e, v in rows],
            "event_id long, ts_s string, event_type string, value double",
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def _run():
        stream = stream_from_directory(spark, src, spark.read.parquet(src).schema)
        agg = tumbling_window_agg(
            stream, ts_col="ts", window="1 hour", group_cols=None, watermark="30 minutes"
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if not _glob.glob(os.path.join(out, "*.parquet")):
            return {}
        return {
            r["window_start"].isoformat(): r["n_events"]
            for r in spark.read.parquet(out).collect()
        }

    _stage([(1, "2024-01-01 00:05:00", "click", 1.0),
            (2, "2024-01-01 00:25:00", "click", 2.0),
            (3, "2024-01-01 02:05:00", "view", 3.0)], 1)
    assert _run() == {"2024-01-01T00:00:00": 2}  # closed by wm 01:35

    _stage([(4, "2024-01-01 00:40:00", "late", 9.0),   # window end 01:00 < wm → dropped
            (5, "2024-01-01 03:05:00", "click", 5.0)], 2)
    emitted = _run()
    assert emitted == {"2024-01-01T00:00:00": 2}  # unchanged: late row dropped

    _stage([(6, "2024-01-01 04:30:00", "view", 6.0)], 3)
    emitted = _run()
    assert emitted == {
        "2024-01-01T00:00:00": 2,
        "2024-01-01T02:00:00": 1,
        "2024-01-01T03:00:00": 1,
    }


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


def test_stream_dedup_across_microbatches(spark, tmp_path_factory):
    """Streaming exact dedup: first arrival of each key emits, duplicates
    are suppressed ACROSS micro-batch runs (checkpointed state), and keys
    older than the watermark horizon are evicted — a re-arrival after
    eviction emits again (the documented state bound, not a bug)."""
    import glob as _glob

    from hiss_cube_spark.streaming import stream_dedup
    from hiss_cube_spark.streaming.windows import stream_from_directory

    src = str(tmp_path_factory.mktemp("dd_src"))
    out = str(tmp_path_factory.mktemp("dd_out"))
    ckpt = str(tmp_path_factory.mktemp("dd_ckpt"))

    def _stage(rows):
        spark.createDataFrame(
            rows, "event_id long, ts_s string, doc_key string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").coalesce(
            1
        ).write.mode("append").parquet(src)

    def _run():
        stream = stream_from_directory(spark, src, spark.read.parquet(src).schema)
        dd = stream_dedup(stream, ["doc_key"], ts_col="ts", watermark="30 minutes")
        q = (
            dd.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if not _glob.glob(os.path.join(out, "*.parquet")):
            return []
        return sorted(r["event_id"] for r in spark.read.parquet(out).collect())

    _stage([(1, "2024-01-01 00:05:00", "A"),
            (2, "2024-01-01 00:06:00", "B"),
            (3, "2024-01-01 00:10:00", "A")])   # in-batch dup of A
    assert _run() == [1, 2]

    # run 2: dup of B inside the horizon → suppressed by checkpointed state;
    # C is new → emits
    _stage([(4, "2024-01-01 00:20:00", "B"),
            (5, "2024-01-01 00:21:00", "C")])
    assert _run() == [1, 2, 5]

    # run 3: advance event time far past the horizon (eviction applies the
    # PREVIOUS batch's watermark, so the advance and the re-arrival must be
    # separate runs)
    _stage([(6, "2024-01-01 06:00:00", "D")])
    assert _run() == [1, 2, 5, 6]

    # run 4: A's state was evicted at the 05:30 watermark → re-arrival emits
    # again (the documented state bound of within-watermark dedup)
    _stage([(7, "2024-01-01 06:01:00", "A")])
    assert _run() == [1, 2, 5, 6, 7]


def test_stream_crossmatch_matches_batch(spark, tmp_path_factory):
    """Stream-static link join: newly-landed probes cross-match against the
    static target catalog with EXACTLY the batch operator's semantics, and a
    second run processes only unseen probe files (checkpointed file log)."""
    import glob as _glob

    from hiss_cube_spark.operators.crossmatch import crossmatch
    from hiss_cube_spark.streaming.link import stream_crossmatch

    src = str(tmp_path_factory.mktemp("probe_landing"))
    out = str(tmp_path_factory.mktemp("link_out"))
    ckpt = str(tmp_path_factory.mktemp("link_ckpt"))

    targets = spark.createDataFrame(
        [(100, 10.0, 10.0), (101, 10.5, 10.0), (102, 50.0, -30.0)],
        "img_id long, ra double, dec double",
    )

    def _stage(rows):
        spark.createDataFrame(rows, "spec_id long, ra double, dec double").coalesce(
            1
        ).write.mode("append").parquet(src)

    def _run():
        matched = stream_crossmatch(
            spark,
            src,
            spark.read.parquet(src).schema,
            targets,
            radius_deg=1.0,
            broadcast_targets=True,
        )
        q = (
            matched.select("p_spec_id", "t_img_id", "match_dist")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if not _glob.glob(os.path.join(out, "*.parquet")):
            return []
        return sorted(
            (r["p_spec_id"], r["t_img_id"])
            for r in spark.read.parquet(out).collect()
        )

    # batch 1: one probe near targets 100/101, one probe matching nothing
    _stage([(1, 10.1, 10.05), (2, 120.0, 60.0)])
    got1 = _run()
    assert got1 == [(1, 100), (1, 101)]

    # batch 2: probe near 102 only; prior matches are NOT re-emitted
    _stage([(3, 50.2, -30.1)])
    got2 = _run()
    assert got2 == [(1, 100), (1, 101), (3, 102)]

    # parity: the accumulated streaming output equals one batch crossmatch
    batch = crossmatch(
        spark.read.parquet(src), targets, radius_deg=1.0, broadcast_targets=True
    )
    expected = sorted(
        (r["p_spec_id"], r["t_img_id"])
        for r in batch.select("p_spec_id", "t_img_id").collect()
    )
    assert got2 == expected


def test_interval_event_join_stream_stream(spark, tmp_path_factory):
    """Stream-stream interval join: purchases attribute to views of the same
    user within [0, 30 min] event time, across micro-batch boundaries, with
    batch parity. Both sides stream from the same landing dir (filtered two
    ways), so a view landing in run 1 joins a purchase landing in run 2 —
    the buffered-state case a batch join never exercises."""
    import glob as _glob

    from hiss_cube_spark.streaming.joins import interval_event_join

    src = str(tmp_path_factory.mktemp("events_landing"))
    out = str(tmp_path_factory.mktemp("ij_out"))
    ckpt = str(tmp_path_factory.mktemp("ij_ckpt"))

    def _stage(rows):
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

    def _run():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        views = stream.where("event_type = 'view'")
        buys = stream.where("event_type = 'purchase'")
        joined = interval_event_join(
            views, buys, on=["user_id"], lower="0 seconds",
            upper="30 minutes", watermark="2 hours",
        )
        q = (
            joined.select("l_event_id", "r_event_id")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if not _glob.glob(os.path.join(out, "*.parquet")):
            return []
        return sorted(
            (r["l_event_id"], r["r_event_id"])
            for r in spark.read.parquet(out).collect()
        )

    from datetime import datetime

    t = lambda m: datetime(2026, 1, 1, 12, m)  # noqa: E731
    # run 1: u1 view@12:00 + purchase@12:10 (joins); u2 view@12:00 alone
    _stage([
        (1, 1, "view", t(0)), (2, 1, "purchase", t(10)), (3, 2, "view", t(0)),
    ])
    got1 = _run()
    assert got1 == [(1, 2)]

    # run 2: u2's purchase arrives a micro-batch later but within the
    # interval — joins against the STATE-BUFFERED view from run 1. A
    # too-late purchase (> 30 min after u1's view) does not join.
    _stage([(4, 2, "purchase", t(20)), (5, 1, "purchase", t(45))])
    got2 = _run()
    assert got2 == [(1, 2), (3, 4)]

    # parity: accumulated streaming output == one batch run of the same plan
    allev = spark.read.parquet(src)
    batch = interval_event_join(
        allev.where("event_type = 'view'"),
        allev.where("event_type = 'purchase'"),
        on=["user_id"], lower="0 seconds", upper="30 minutes",
    )
    expected = sorted(
        (r["l_event_id"], r["r_event_id"])
        for r in batch.select("l_event_id", "r_event_id").collect()
    )
    assert got2 == expected


def test_stream_incremental_dedup_lands_unique_corpus(spark, tmp_path_factory):
    """Cross-batch dedup against the persisted index: batch 2's duplicate of
    a batch-1 document must not land; within-batch dupes keep the first."""
    import os

    from hiss_cube_spark.streaming.dedup_index import stream_incremental_dedup

    src = str(tmp_path_factory.mktemp("di_src"))
    corpus = str(tmp_path_factory.mktemp("di_corpus"))
    index = str(tmp_path_factory.mktemp("di_index")) + "/idx"
    ckpt = str(tmp_path_factory.mktemp("di_ckpt"))
    schema = "doc_id long, text string"
    spark.createDataFrame([], "fp string").write.parquet(index)

    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema  # 3 dups 1 in-batch
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(4, "alpha"), (5, "gamma")], schema  # 4 dups batch-1's alpha
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_incremental_dedup(stream, corpus, index, ckpt)
    q.awaitTermination(120)

    landed = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(os.path.join(corpus, "batch=*")).collect()
    }
    assert landed == {(1, "alpha"), (2, "beta"), (5, "gamma")}
    fps = spark.read.parquet(index).count()
    assert fps == 3  # alpha, beta, gamma


def test_stream_neardup_minhash_lands_neardeduped_corpus(spark, tmp_path_factory):
    """Fuzzy cross-batch dedup against the persisted signature index: batch
    2's near-duplicate (and exact duplicate) of batch-1 survivors must not
    land; within-batch near-dups keep the min doc_id."""
    import os

    from hiss_cube_spark.streaming.neardup import (
        init_neardup_index,
        stream_neardup_minhash,
    )

    src = str(tmp_path_factory.mktemp("nd_src"))
    corpus = str(tmp_path_factory.mktemp("nd_corpus"))
    index = str(tmp_path_factory.mktemp("nd_index")) + "/idx"
    ckpt = str(tmp_path_factory.mktemp("nd_ckpt"))
    schema = "doc_id long, text string"
    init_neardup_index(spark, index)

    spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "p q r s t u"),
            (3, "a b c d e f g x"),  # jaccard 5/7 vs doc 1 -> in-batch dup
        ],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [
            (4, "a b c d e f g h"),  # exact dup of indexed doc 1
            (5, "x y z w v q"),
            (6, "a b c d e f g q"),  # jaccard 5/7 vs indexed doc 1 -> dup
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_neardup_minhash(stream, corpus, index, ckpt, threshold=0.45)
    q.awaitTermination(120)

    landed = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(corpus, "batch=*")).collect()
    }
    assert landed == {1, 2, 5}
    idx = spark.read.parquet(index)
    assert idx.where(F.col("kind") == "sig").count() == 3
    assert idx.where(F.col("kind") == "band").count() == 3 * 32


def test_stream_ivf_refresh_builds_prunable_index(spark, tmp_path_factory, sf_dir):
    """Two embedding micro-batches land into the partitioned IVF index;
    assignments match the batch operator, a known vector finds itself at
    rank 1, and the probed-cell filter reaches the scan as a partition
    filter."""
    import os

    from hiss_cube_spark.streaming.ann_index import (
        assign_cells,
        query_ivf_index,
        stream_ivf_refresh,
        train_ivf_centroids,
    )

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(vecs, n_cells=8, sample_rows=256)

    src = str(tmp_path_factory.mktemp("ivf_src"))
    index = str(tmp_path_factory.mktemp("ivf_index")) + "/idx"
    ckpt = str(tmp_path_factory.mktemp("ivf_ckpt"))
    vecs.where(F.col("vec_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    vecs.where(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(vecs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_ivf_refresh(stream, index, cents, ckpt)
    q.awaitTermination(120)

    landed = spark.read.parquet(index)
    assert landed.count() == vecs.count()
    # streamed assignments == batch operator assignments
    want = {
        (r["vec_id"], r["cell"])
        for r in assign_cells(vecs, cents).select("vec_id", "cell").collect()
    }
    got = {(r["vec_id"], r["cell"]) for r in landed.select("vec_id", "cell").collect()}
    assert got == want

    queries = vecs.where(F.col("vec_id") % 97 == 0).limit(5)
    topk = query_ivf_index(spark, index, queries, k=3, centroids=cents, n_probe=2)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    rows = topk.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # every probed query returns k neighbors with descending cosine
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert rs[0]["cosine"] >= rs[1]["cosine"] >= rs[2]["cosine"]


def test_stream_drift_monitor_flags_shifted_batch(spark, tmp_path_factory):
    """Two micro-batches against a frozen reference: the same-distribution
    batch scores KS 0, the shifted batch scores 1; checkpoint replay does
    not duplicate monitor rows."""
    import os

    from pyspark.sql import functions as F

    from hiss_cube_spark.streaming.drift import stream_drift_monitor

    src = str(tmp_path_factory.mktemp("drift_src"))
    mon = str(tmp_path_factory.mktemp("drift_mon"))
    ckpt = str(tmp_path_factory.mktemp("drift_ckpt"))

    ref = spark.createDataFrame([(float(v),) for v in range(1, 101)], "v double")
    # batch files land in order: identical distribution, then fully shifted
    spark.createDataFrame([(float(v),) for v in range(1, 101)], "v double") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame([(float(v) + 500, ) for v in range(1, 101)], "v double") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("v double").option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_drift_monitor(stream, ref, mon, ckpt)
    q.awaitTermination(120)

    rows = {r["batch_id"]: r for r in spark.read.parquet(mon).collect()}
    stats = sorted(r["ks_stat"] for r in rows.values())
    assert stats == [0.0, 1.0], stats
    assert all(r["n_batch"] == 100 and r["n_ref"] == 100 for r in rows.values())

    # restart over the same checkpoint: no new batches -> monitor unchanged
    n_before = spark.read.parquet(mon).count()
    q2 = stream_drift_monitor(
        spark.readStream.schema("v double").option("maxFilesPerTrigger", 1).parquet(src),
        ref, mon, ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(mon).count() == n_before


def test_streaming_sessionizer_closes_on_gap_and_timeout(spark, tmp_path_factory):
    """Sessions close on an in-stream gap (batch 2 opens a new session for
    user 1) and trailing open sessions flush via the processing-time
    timeout on the final trigger."""
    import time

    from hiss_cube_spark.streaming.stateful import streaming_sessionizer

    src = str(tmp_path_factory.mktemp("sess_src"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))
    schema = "user_id long, ts_us long, value double"
    gap = 1_000_000  # 1s session gap
    # batch 1: user 1 session A (two events 0.1s apart)
    spark.createDataFrame(
        [(1, 100_000, 1.0), (1, 200_000, 2.0)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2: user 1 jumps 10s -> closes session A, opens B; user 2 starts
    spark.createDataFrame(
        [(1, 10_200_000, 4.0), (2, 50_000, 9.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_sessionizer(stream, gap_us=gap)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="2 seconds")
        .start()
    )
    # processingTime trigger keeps running empty batches, which is what
    # lets the ProcessingTimeTimeout fire for the trailing open sessions
    deadline = time.time() + 90
    want = 3  # session A + trailing B + user 2's trailing session
    while time.time() < deadline:
        if spark.sql("SELECT count(*) FROM sessions").first()[0] >= want:
            break
        time.sleep(2)
    q.stop()
    rows = spark.sql("SELECT * FROM sessions").collect()
    got = {(r["user_id"], r["session_start"]): r for r in rows}
    a = got[(1, 100_000)]
    assert a["session_end"] == 200_000 and a["n_events"] == 2 and a["sum_value"] == 3.0
    assert (1, 10_200_000) in got           # trailing session flushed by timeout
    assert got[(2, 50_000)]["sum_value"] == 9.0


def test_stream_incremental_dedup_recovers_from_crashed_swap(spark, tmp_path_factory):
    """Chaos: simulate a crash between the index-swap renames (index dir
    gone, backup left behind) — the restarted query must repair the index,
    replay the missed batch, and land exactly the unique corpus."""
    import os
    import shutil

    from hiss_cube_spark.streaming.dedup_index import stream_incremental_dedup

    src = str(tmp_path_factory.mktemp("ch_src"))
    corpus = str(tmp_path_factory.mktemp("ch_corpus"))
    index = str(tmp_path_factory.mktemp("ch_index")) + "/idx"
    ckpt = str(tmp_path_factory.mktemp("ch_ckpt"))
    schema = "doc_id long, text string"
    spark.createDataFrame([], "fp string").write.parquet(index)

    spark.createDataFrame([(1, "alpha"), (2, "beta")], schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    q = stream_incremental_dedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, index, ckpt,
    )
    q.awaitTermination(120)

    # crash simulation: swap died after rename(index -> backup): index dir
    # missing, backup present (the pre-batch state)
    backup = index.rstrip("/") + "._old"
    os.rename(index, backup)
    assert not os.path.exists(index)

    # new data arrives; a restarted query must first repair the index from
    # the backup, then process the new batch against the restored state
    spark.createDataFrame([(3, "alpha"), (4, "gamma")], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    q2 = stream_incremental_dedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, index, ckpt,
    )
    q2.awaitTermination(120)

    landed = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(os.path.join(corpus, "batch=*")).collect()
    }
    assert landed == {(1, "alpha"), (2, "beta"), (4, "gamma")}
    assert not os.path.exists(backup)          # recovery cleaned up
    assert spark.read.parquet(index).count() == 3
    shutil.rmtree(ckpt, ignore_errors=True)


def test_manifest_store_commit_protocol_and_crashes(spark, tmp_path_factory):
    """The pointer-flip commit: a stage without a commit is invisible and
    cleaned by recover(); commits retain exactly current + previous; a
    missing pointer with a complete stage (crash during init) is adopted."""
    import os

    from hiss_cube_spark.streaming.manifest import ManifestSnapshotStore

    root = str(tmp_path_factory.mktemp("mani")) + "/store"
    store = ManifestSnapshotStore(root)
    store.init(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert store.last_applied() == -1
    assert {(r["k"], r["v"]) for r in store.read(spark).collect()} == {(1, "a")}

    # crash BEFORE commit: stage batch 0, never flip the pointer
    store.stage(spark.createDataFrame([(2, "b")], "k long, v string"), 0)
    assert store.last_applied() == -1  # still the init snapshot
    store.recover()
    assert not os.path.exists(os.path.join(root, "snap_0"))  # stage dropped
    assert {r["k"] for r in store.read(spark).collect()} == {1}

    # normal commits: previous snapshot retained, older ones gc'd
    store.stage(spark.createDataFrame([(2, "b")], "k long, v string"), 0)
    store.commit(0)
    assert store.last_applied() == 0
    assert os.path.exists(os.path.join(root, "snap_-1"))  # previous kept
    store.stage(spark.createDataFrame([(3, "c")], "k long, v string"), 1)
    store.commit(1)
    assert not os.path.exists(os.path.join(root, "snap_-1"))  # gc'd
    assert os.path.exists(os.path.join(root, "snap_0"))
    assert {r["k"] for r in store.read(spark).collect()} == {3}

    # crash DURING init (pointer missing, complete stage present): adopt it
    root2 = str(tmp_path_factory.mktemp("mani2")) + "/store"
    s2 = ManifestSnapshotStore(root2)
    s2.stage(spark.createDataFrame([(9, "z")], "k long, v string"), -1)
    assert s2.current_name() is None
    s2.recover()
    assert s2.last_applied() == -1
    assert {r["k"] for r in s2.read(spark).collect()} == {9}

    # lost pointer AFTER compaction: only the c-suffixed version of the
    # batch survives — recovery must adopt it BY NAME (rebuilding
    # "snap_<id>" from the batch id would commit a dangling pointer and
    # then gc the surviving directory)
    root3 = str(tmp_path_factory.mktemp("mani3")) + "/store"
    s3 = ManifestSnapshotStore(root3)
    s3.init(spark.createDataFrame([(5, "e")], "k long, v string"))
    s3.stage(spark.createDataFrame([(6, "f"), (7, "g")], "k long, v string"), 0)
    s3.commit(0)
    s3.compact(spark, target_rows_per_file=1)   # snap_0c1, gc's snap_0
    s3.compact(spark, target_rows_per_file=10)  # snap_0c2, gc's snap_0c1
    assert not os.path.exists(os.path.join(root3, "snap_0"))
    os.remove(os.path.join(root3, "_current"))
    s3.recover()
    assert s3.current_name() == "snap_0c2"
    assert s3.last_applied() == 0
    assert {r["k"] for r in s3.read(spark).collect()} == {6, 7}


def test_stream_incremental_dedup_manifest_mode(spark, tmp_path_factory):
    """The dedup index maintained through the manifest-pointer commit:
    end-to-end dedup across batches, then a crash-before-commit (orphan
    staged snapshot) is repaired on restart and the replayed batch lands
    exactly once."""
    import os
    import shutil

    from hiss_cube_spark.streaming.dedup_index import stream_incremental_dedup
    from hiss_cube_spark.streaming.manifest import ManifestSnapshotStore

    src = str(tmp_path_factory.mktemp("mm_src"))
    corpus = str(tmp_path_factory.mktemp("mm_corpus"))
    index = str(tmp_path_factory.mktemp("mm_index")) + "/idx"
    ckpt = str(tmp_path_factory.mktemp("mm_ckpt"))
    schema = "doc_id long, text string"
    ManifestSnapshotStore(index).init(spark.createDataFrame([], "fp string"))

    spark.createDataFrame([(1, "alpha"), (2, "beta")], schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    q = stream_incremental_dedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, index, ckpt, commit="manifest",
    )
    q.awaitTermination(120)
    store = ManifestSnapshotStore(index)
    assert store.read(spark).count() == 2

    # crash simulation: a later batch staged snap_7 but died before the
    # pointer flip — the orphan must be dropped, not adopted
    store.stage(spark.createDataFrame([("bogus",)], "fp string"), 7)
    committed = store.last_applied()

    spark.createDataFrame([(3, "alpha"), (4, "gamma")], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    q2 = stream_incremental_dedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, index, ckpt, commit="manifest",
    )
    q2.awaitTermination(120)

    assert not os.path.exists(os.path.join(index, "snap_7"))
    assert ManifestSnapshotStore(index).last_applied() > committed
    landed = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(os.path.join(corpus, "batch=*")).collect()
    }
    assert landed == {(1, "alpha"), (2, "beta"), (4, "gamma")}
    assert ManifestSnapshotStore(index).read(spark).count() == 3
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_apply_changelog_manifest_mode(spark, tmp_path_factory):
    """CDC snapshot maintained through the manifest-pointer commit."""
    from hiss_cube_spark.streaming.cdc import stream_apply_changelog
    from hiss_cube_spark.streaming.manifest import ManifestSnapshotStore

    src = str(tmp_path_factory.mktemp("mc_src"))
    snap = str(tmp_path_factory.mktemp("mc_snap")) + "/state"
    ckpt = str(tmp_path_factory.mktemp("mc_ckpt"))
    schema = "seq long, op string, key long, val string"
    ManifestSnapshotStore(snap).init(
        spark.createDataFrame([], "key long, val string")
    )

    spark.createDataFrame(
        [(1, "I", 10, "a"), (2, "I", 20, "b")], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(3, "U", 10, "a2"), (4, "D", 20, "b")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    q = stream_apply_changelog(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        snap, ckpt, commit="manifest",
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["val"])
        for r in ManifestSnapshotStore(snap).read(spark).collect()
    }
    assert got == {(10, "a2")}


def test_manifest_store_compaction_preserves_stream_cursor(spark, tmp_path_factory):
    """Small-file maintenance through the pointer protocol: compaction
    commits a c-suffixed VERSION of the same batch state — fewer files,
    identical rows, last_applied unchanged — and the next stream batch
    still applies (its id is beyond the untouched cursor)."""
    import glob
    import os

    from hiss_cube_spark.streaming.dedup_index import stream_incremental_dedup
    from hiss_cube_spark.streaming.manifest import ManifestSnapshotStore

    src = str(tmp_path_factory.mktemp("cp_src"))
    corpus = str(tmp_path_factory.mktemp("cp_corpus"))
    index = str(tmp_path_factory.mktemp("cp_index")) + "/idx"
    ckpt = str(tmp_path_factory.mktemp("cp_ckpt"))
    schema = "doc_id long, text string"
    ManifestSnapshotStore(index).init(spark.createDataFrame([], "fp string"))

    spark.createDataFrame([(i, f"doc {i}") for i in range(20)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    stream_incremental_dedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, index, ckpt, commit="manifest",
    ).awaitTermination(120)

    store = ManifestSnapshotStore(index)
    before = store.last_applied()
    # fragment the current snapshot, then compact to 1 file
    frag = store.read(spark).repartition(8)
    store.stage(frag, before)  # rewrite same version fragmented
    store.commit(before)
    assert len(glob.glob(os.path.join(store.current_dir(), "*.parquet"))) == 8
    name = store.compact(spark, target_rows_per_file=1000)
    assert name.endswith("c1") and store.current_name() == name
    assert len(glob.glob(os.path.join(store.current_dir(), "*.parquet"))) == 1
    assert store.read(spark).count() == 20
    assert store.last_applied() == before  # stream cursor untouched

    # the stream continues over the compacted snapshot
    spark.createDataFrame([(100, "doc 0"), (101, "fresh")], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    stream_incremental_dedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        corpus, index, ckpt, commit="manifest",
    ).awaitTermination(120)
    assert ManifestSnapshotStore(index).read(spark).count() == 21  # only 'fresh'
    assert ManifestSnapshotStore(index).last_applied() > before
