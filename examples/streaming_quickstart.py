"""Streaming quickstart: the Structured-Streaming surface end to end, on a
file-source stream replayed deterministically (availableNow / two batches).

    windowed agg        tumbling counts with watermark
    stateful op         streaming_ewma (applyInPandasWithState, O(1) state)
    sessionizer         streaming_sessionizer (gap close + timeout flush)
    drift monitor       stream_drift_monitor (per-batch KS vs reference)
    incremental dedup   stream_incremental_dedup (persistent fp index)

Run:  python examples/streaming_quickstart.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("streaming-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_qs_")

    def d(name: str) -> str:
        p = os.path.join(root, name)
        os.makedirs(p, exist_ok=True)
        return p

    # ---- a two-batch event stream -------------------------------------
    src = d("src")
    schema = "user_id long, event_id long, value double, ts_us long"
    spark.createDataFrame(
        [(1, 1, 4.0, 1_000_000), (1, 2, 8.0, 2_000_000), (2, 3, 5.0, 1_500_000)],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(1, 4, 2.0, 3_000_000), (2, 5, 7.0, 60_000_000)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)

    # 1. tumbling window counts (event time + watermark)
    win = (
        stream()
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "2 seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        win.writeStream.outputMode("append").format("memory").queryName("win")
        .option("checkpointLocation", d("ck_win")).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    print("tumbling windows:", spark.sql("SELECT count(*) FROM win").first()[0], "closed")

    # 2. stateful EWMA folding across the two micro-batches
    from hiss_cube_spark.streaming.stateful import streaming_ewma

    q = (
        streaming_ewma(stream())
        .writeStream.outputMode("update").format("memory").queryName("ewma")
        .option("checkpointLocation", d("ck_ewma")).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ewma ORDER BY key, n_seen DESC").collect()
    print("ewma emissions:", [(r["key"], r["ewma"]) for r in rows][:4])

    # 3. per-batch KS drift vs a frozen reference
    from hiss_cube_spark.streaming.drift import stream_drift_monitor

    ref = spark.createDataFrame([(float(v),) for v in range(1, 11)], "v double")
    mon = d("mon")
    q = stream_drift_monitor(
        stream().select(F.col("value").alias("v")), ref, mon, d("ck_drift")
    )
    q.awaitTermination(120)
    for r in spark.read.parquet(mon).orderBy("batch_id").collect():
        print(f"drift batch {r['batch_id']}: ks={r['ks_stat']}")

    # 4. incremental dedup against a persistent fingerprint index
    from hiss_cube_spark.streaming.dedup_index import stream_incremental_dedup

    dsrc = d("docs")
    spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(dsrc)
    spark.createDataFrame([(3, "alpha"), (4, "gamma")], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(dsrc)
    idx = os.path.join(d("idx_parent"), "idx")
    spark.createDataFrame([], "fp string").write.parquet(idx)
    q = stream_incremental_dedup(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(dsrc),
        d("corpus"), idx, d("ck_dedup"),
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(os.path.join(d("corpus"), "batch=*")).count()
    print(f"incremental dedup landed {landed} unique docs (4 seen, 1 cross-batch dup)")

    spark.stop()


if __name__ == "__main__":
    main()
