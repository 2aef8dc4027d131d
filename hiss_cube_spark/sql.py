"""SQL surface: register the warehouse/testdata tables as views and run
ANSI SQL through Catalyst — the generic relational surface (joins, aggs,
windows, set ops, grouping sets) is first-class and oracle-validated.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(spark: SparkSession, directory: str, tables: list[str] | None = None) -> list[str]:
    """Create temp views for every parquet table in ``directory``."""
    # events.parquet carries TIMESTAMP(NANOS) — readable only as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    names = tables or [
        t for t in TESTDATA_TABLES if os.path.exists(os.path.join(directory, f"{t}.parquet"))
    ]
    if not names:  # warehouse layout: <dir>/<table>/part-*.parquet
        names = [t for t in os.listdir(directory) if os.path.isdir(os.path.join(directory, t))]
        for t in names:
            spark.read.parquet(os.path.join(directory, t)).createOrReplaceTempView(t)
        return names
    for t in names:
        spark.read.parquet(os.path.join(directory, f"{t}.parquet")).createOrReplaceTempView(t)
    return names


def sql(spark: SparkSession, query: str, directory: str | None = None) -> DataFrame:
    """Run SQL, optionally auto-registering ``directory``'s tables first."""
    if directory:
        register_tables(spark, directory)
    return spark.sql(query)
