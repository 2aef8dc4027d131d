"""JSONL corpus source/sink — the interchange format LLM training corpora
actually ship in (one JSON document per line: The Pile, RedPajama, Dolma,
FineWeb all distribute this way).

Spark's native JSON reader/writer does the heavy lifting (distributed,
splittable with line-delimited JSON, pushdown-friendly after projection);
this module pins the two decisions that matter at 100 TB:

* **Never infer the schema.** Inference is a full extra pass over the
  corpus and silently widens types on dirty rows. `read_jsonl_corpus`
  requires an explicit schema (defaulting to the canonical documents
  shape) and lands malformed lines in a `_corrupt` column instead of
  failing the scan (PERMISSIVE with a named corrupt-record column — the
  only sane setting for web-scale crawl dumps).
* **Compression-agnostic scan.** gzip/bz2/zstd `.jsonl.{gz,bz2,zst}`
  shards decompress transparently through the Hadoop codec chain; plain
  `.jsonl` stays splittable (compressed shards are one split each — shard
  small on write, the way public corpora do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["DOCUMENTS_SCHEMA", "read_jsonl_corpus", "write_jsonl_corpus"]

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Read a JSONL document corpus with a PINNED schema (no inference
    pass) and malformed lines captured in ``corrupt_col`` rather than
    poisoning the scan."""
    schema = schema or DOCUMENTS_SCHEMA
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl_corpus(
    df: DataFrame, path: str, compression: str | None = None, shards: int | None = None
) -> None:
    """Write a corpus as line-delimited JSON shards (`part-*.json[.gz]`).
    ``shards`` repartitions to bound shard count/size — compressed JSONL
    is non-splittable, so shard size IS the read parallelism unit."""
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
