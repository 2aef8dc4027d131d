"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for the big-cluster case (AQE on, skew-join handling,
zstd parquet, Arrow for the pandas-UDF kernels) while remaining correct on
``local[N]``. Tests and bench override ``shuffle_partitions`` to match the
local core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hiss-cube-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    On a real cluster ``master``/``shuffle_partitions`` come from the
    deployment; locally we default to ``local[$SPARK_GRAFT_CPUS]`` and one
    shuffle partition per core (AQE coalesces further at runtime).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if master.startswith("local") else 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # dynamic broadcast — essential at 100 TB, harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for the pandas-UDF numeric kernels.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Deterministic timestamps regardless of host TZ (oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Array-heavy rows (image tiles, spectra) are wide: keep split sizes
        # moderate so a scan partition stays executor-memory friendly.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def release_rdd_blocks(spark: SparkSession, blocking: bool = False) -> int:
    """Unpersist every persisted RDD and nudge the JVM GC.

    ``spark.catalog.clearCache()`` frees ``persist()``-ed *tables* but NOT
    ``localCheckpoint`` blocks — those live in the context's persistentRdds
    registry until the RDD is garbage-collected, so a long session (a full
    test run, a multi-hour driver) accumulates block-manager memory and
    scratch files. Call this at a point where no caller will reuse a
    checkpointed DataFrame (its lineage is truncated — recompute after
    release raises). Returns the number of RDDs released.
    """
    sc = spark.sparkContext
    try:
        jmap = sc._jsc.getPersistentRDDs()
        n = int(jmap.size())
        it = jmap.values().iterator()
        while it.hasNext():
            it.next().unpersist(blocking)
        # ContextCleaner reaps block files when the JVM-side RDD objects go
        # unreachable; give it a push so scratch shrinks promptly.
        sc._jvm.System.gc()
        return n
    except Exception:
        return 0
