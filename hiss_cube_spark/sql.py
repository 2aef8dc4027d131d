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


def register_functions(spark: SparkSession) -> list[str]:
    """Register the engine's scalar formulas as Spark 4 SQL UDFs (pure-SQL
    ``CREATE TEMPORARY FUNCTION … RETURN <expr>`` — Catalyst inlines the
    body, so they cost the same as the DataFrame-API versions and stay in
    whole-stage codegen; nothing crosses into Python).

    Gives ``spark.sql`` users the domain surface without the Python API:
    mag_to_flux / flux_to_flux_density (functions/photometry.py),
    ts_to_mjd / mjd_to_ts (functions/timeparse.py), and the linear
    magnitude-ratio helper. Bodies mirror the column functions exactly;
    the parity test pins SQL-call == DataFrame-call.
    """
    defs = {
        "mag_to_flux": """
            CREATE OR REPLACE TEMPORARY FUNCTION mag_to_flux(
                mag_ratio DOUBLE, wl_midpoint DOUBLE) RETURNS DOUBLE
            RETURN mag_ratio * (3.631e-6 * 2.99792458e-5)
                   / (wl_midpoint * wl_midpoint)
        """,
        "flux_to_flux_density": """
            CREATE OR REPLACE TEMPORARY FUNCTION flux_to_flux_density(
                flux DOUBLE, fiber_area DOUBLE, pixel_area DOUBLE) RETURNS DOUBLE
            RETURN flux * (pixel_area / fiber_area)
        """,
        "ts_to_mjd": """
            CREATE OR REPLACE TEMPORARY FUNCTION ts_to_mjd(ts TIMESTAMP)
            RETURNS DOUBLE
            RETURN CAST(unix_timestamp(ts) AS DOUBLE) / 86400.0 + 40587.0
        """,
        "mjd_to_ts": """
            CREATE OR REPLACE TEMPORARY FUNCTION mjd_to_ts(mjd DOUBLE)
            RETURNS TIMESTAMP
            RETURN timestamp_seconds((mjd - 40587.0) * 86400.0)
        """,
        "mag_ratio": """
            CREATE OR REPLACE TEMPORARY FUNCTION mag_ratio(mag DOUBLE)
            RETURNS DOUBLE
            RETURN pow(10.0, -0.4 * mag)
        """,
    }
    for ddl in defs.values():
        spark.sql(ddl)
    return list(defs)
