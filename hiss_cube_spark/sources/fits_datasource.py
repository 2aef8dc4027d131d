"""FITS as a first-class Spark data source: ``spark.read.format("fits")``.

Spark 4's Python DataSource API lets the engine's pure-python FITS parser
(`sources/fits.py`) register as a real format — one file per input
partition, so a directory of FITS files scans with file-grain parallelism
and the familiar reader surface (schema, ``.load(path)``, options) instead
of the binaryFile+mapInPandas composition the S1–S7 operators use
internally. Both paths share the same parser, so results agree by
construction (pinned by test).

Options:
  ``pattern``  glob for file names (default ``*.fits*`` — covers .fits, .fits.bz2, .fits.gz)
  ``mode``     ``headers`` (default: path/n_bytes/header-JSON rows, the S4
               cache shape) or ``image`` (adds naxis1/naxis2 and the flat
               float pixel array of HDU 0, the tiled-raster shape)

Corrupt files yield an ``_error`` header row — same contract as
`scan_fits_headers` (a 100 TB scan must not die on one bad file).

Scale shape: planning lists files on the driver (cheap metadata walk, the
same thing binaryFile's InMemoryFileIndex does); each task opens exactly
its own file — no shuffle, no driver data movement. For many-small-file
layouts pair with `plans/maintenance.compact_table` downstream.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["FitsDataSource", "register_fits_source"]

_HEADERS_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("n_bytes", LongType()),
        StructField("header", StringType()),
    ]
)
_IMAGE_SCHEMA = StructType(
    _HEADERS_SCHEMA.fields
    + [
        StructField("naxis1", IntegerType()),
        StructField("naxis2", IntegerType()),
        StructField("data", ArrayType(FloatType())),
    ]
)


class _FitsFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _FitsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("fits source requires a path: .load('<dir>')")
        self.pattern = options.get("pattern", "*.fits*")
        self.mode = options.get("mode", "headers")

    def partitions(self):
        root = self.root
        if root.startswith("file://"):
            root = root[len("file://") :]
        if os.path.isfile(root):
            files = [root]
        else:
            files = sorted(
                _glob.glob(os.path.join(root, "**", self.pattern), recursive=True)
            )
        return [_FitsFilePartition(p) for p in files]

    def read(self, partition: _FitsFilePartition):
        # imports inside read(): this method runs on executors, where the
        # module arrives by-value via the cloudpickle registration
        from hiss_cube_spark.sources.fits import parse_fits_header, parse_fits_image

        path = partition.path
        with open(path, "rb") as fh:
            content = fh.read()
        try:
            hdr = json.dumps(parse_fits_header(content), default=str)
            err = None
        except Exception as exc:
            hdr, err = json.dumps({"_error": str(exc)}), exc
        if self.mode == "headers":
            yield (path, len(content), hdr)
            return
        if err is not None:
            yield (path, len(content), hdr, None, None, None)
            return
        try:
            _, img = parse_fits_image(content)
            if img is None:
                yield (path, len(content), hdr, None, None, None)
                return
            h, w = img.shape
            yield (path, len(content), hdr, int(w), int(h),
                   [float(v) for v in img.reshape(-1)])
        except Exception as exc:
            yield (path, len(content), json.dumps({"_error": str(exc)}),
                   None, None, None)


class FitsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fits"

    def schema(self):
        if self.options.get("mode", "headers") == "image":
            return _IMAGE_SCHEMA
        return _HEADERS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _FitsReader(dict(self.options))


def register_fits_source(spark) -> None:
    """Idempotently register ``format("fits")`` on this session."""
    spark.dataSource.register(FitsDataSource)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
