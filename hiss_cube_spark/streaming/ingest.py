"""Streaming observation ingest (SURVEY.md §2.9 extension).

Spark's binaryFile source is batch-only, so the streaming path uses the
landing-zone pattern: a collector stages raw FITS bytes as parquet rows
(path, content) — from object-store notifications, Kafka, or a batch
`binaryFile` copy job — and Structured Streaming incrementally runs the SAME
mapInPandas ingest kernels used by the batch path, appending to the bronze
tables. Semantics are identical batch vs streaming by construction (one
kernel, two drivers).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from hiss_cube_spark.sources.ingest import _IMG_SCHEMA, image_rows_from_fits

__all__ = ["stage_binary_files", "stream_ingest_images"]

LANDING_SCHEMA = StructType(
    [StructField("path", StringType()), StructField("content", BinaryType())]
)


def stage_binary_files(spark: SparkSession, src_dir: str, landing_dir: str, pattern: str = "*.fits*") -> None:
    """Batch helper: copy raw files into the parquet landing zone."""
    (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(src_dir)
        .select("path", "content")
        .write.mode("append")
        .parquet(landing_dir)
    )


def stream_ingest_images(spark: SparkSession, landing_dir: str, zooms: int = 5) -> DataFrame:
    """Streaming DataFrame of bronze image rows from the landing zone.

    Attach ``.writeStream.partitionBy("zoom").format("parquet")…`` to append
    into the same bronze table the batch pipeline writes.
    """
    stream = spark.readStream.schema(LANDING_SCHEMA).parquet(landing_dir)

    cols = [
        "path", "run", "camcol", "band", "wl", "tai_time", "ra", "dec",
        "healpix", "zoom", "naxis1", "naxis2", "wcs", "header", "data", "errors",
    ]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(image_rows_from_fits(bytes(content), path, zooms))
                except Exception:
                    continue
            yield pd.DataFrame(out, columns=cols)

    return stream.mapInPandas(_parse, schema=_IMG_SCHEMA).withColumn(
        "image_id", F.xxhash64("path")
    )
