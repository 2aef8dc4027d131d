"""CSV-driven scans (SURVEY.md S2/S3): a CSV of identifiers → path patterns
joined against the file listing.

Reference: process_image_csv_row / process_spectra_csv_row
(processors/metadata.py:132-160): image rows (run, camcol, field) expand to
``<rerun>/<run>/<camcol>/*%04d.fits``; spectra rows (plate) to
``%04d/*.fits``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["image_paths_from_csv", "spectra_paths_from_csv", "match_listing"]


def image_paths_from_csv(spark: SparkSession, csv_path: str, rerun: int = 301) -> DataFrame:
    """(run, camcol, field, path_glob) from an image list CSV.

    Expansion matches the reference exactly (processors/metadata.py:
    139-147): directory ``<rerun>/<run>/<camcol>/`` (run NOT zero-padded —
    the CSV string is used as-is there), rglob pattern ``*<field:04d>.fits``
    — the field is the 4-digit suffix of SDSS frame names."""
    df = spark.read.option("header", "true").csv(csv_path)
    return df.select(
        F.col("run").cast("int"),
        F.col("camcol").cast("int"),
        F.col("field").cast("int"),
        F.format_string(
            f"{rerun}/%d/%d/*%04d.fits",
            F.col("run").cast("int"),
            F.col("camcol").cast("int"),
            F.col("field").cast("int"),
        ).alias("path_glob"),
    )


def spectra_paths_from_csv(spark: SparkSession, csv_path: str) -> DataFrame:
    """(plate, path_glob) from a spectra list CSV."""
    df = spark.read.option("header", "true").csv(csv_path)
    return df.select(
        F.col("plate").cast("int"),
        F.format_string("%04d/*.fits", F.col("plate").cast("int")).alias("path_glob"),
    )


def match_listing(listing: DataFrame, path_globs: DataFrame) -> DataFrame:
    """Join a file listing against glob patterns (glob → regex, broadcast
    the small pattern side)."""
    pat = path_globs.withColumn(
        "_re",
        F.concat(
            F.lit(".*"),
            F.regexp_replace(
                F.regexp_replace(F.col("path_glob"), r"\.", r"\\."), r"\*", ".*"
            ),
            F.lit("$"),
        ),
    )
    return listing.join(F.broadcast(pat), F.expr("path rlike _re")).drop("_re")
