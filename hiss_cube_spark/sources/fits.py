"""FITS source (SURVEY.md S1, S4–S6): binaryFile scan + pure-python parsing.

The FITS format is simple enough to parse without astropy (which is absent
here): headers are 2880-byte blocks of 80-char cards; image data is
big-endian typed by BITPIX with optional BSCALE/BZERO. This mirrors the
reference's own fast raw-byte header parser (utils/fitstools.py:23-65).

Externally-compressed files (``.fits.bz2`` — the SDSS frame distribution
format — and ``.fits.gz``) decompress transparently by magic-byte detection
(:func:`maybe_decompress`). Internal RICE/tile-compressed HDUs are not
supported — plug astropy/fitsio through ``decode_fn`` on a cluster that has
them.

Scan shape: ``spark.read.format("binaryFile")`` with pathGlobFilter (P1) and
limit (P2), then mapInPandas parses per Arrow batch — file bytes never
become JVM rows.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = [
    "parse_fits_header",
    "parse_fits_image",
    "scan_fits_headers",
    "read_fits_bytes_header",
    "maybe_decompress",
]

_BLOCK = 2880


def maybe_decompress(data: bytes) -> bytes:
    """Transparent bz2/gzip decompression keyed on magic bytes.

    SDSS distributes frame images as ``frame-*.fits.bz2`` and astropy
    decompresses them transparently (the reference's fixtures are bz2:
    hisscube/tests/test_cube_utils.py:24); spectra ship ``.fits.gz`` in
    some releases. Magic-byte detection (``BZh`` / ``1f 8b``) rather than
    path suffix, so renamed or suffix-less blobs still parse. Plain FITS
    (``SIMPLE``) passes through untouched.
    """
    if data[:3] == b"BZh":
        import bz2

        return bz2.decompress(data)
    if data[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(data)
    return data


def read_fits_bytes_header(data: bytes, offset: int = 0) -> tuple[dict, int]:
    """Parse one HDU header starting at ``offset``; returns (header dict,
    offset of the data section)."""
    header: dict = {}
    pos = offset
    done = False
    while not done:
        block = data[pos : pos + _BLOCK]
        if len(block) < _BLOCK:
            raise ValueError("truncated FITS header")
        for i in range(0, _BLOCK, 80):
            card = block[i : i + 80]
            key = card[:8].strip().decode("ascii", "replace")
            if key == "END":
                done = True
                break
            if not key or key in ("COMMENT", "HISTORY"):
                continue
            if card[8:10] != b"= ":
                continue
            raw = card[10:].split(b" /")[0].strip()
            header[key] = _parse_value(raw)
        pos += _BLOCK
    return header, pos


def _parse_value(raw: bytes):
    s = raw.decode("ascii", "replace").strip()
    if s.startswith("'"):
        return s.strip("'").strip()
    if s in ("T", "F"):
        return s == "T"
    try:
        if re.fullmatch(r"[+-]?\d+", s):
            return int(s)
        return float(s)
    except ValueError:
        return s


def parse_fits_header(data: bytes) -> dict:
    """Primary-HDU header of a (possibly bz2/gzip-compressed) FITS byte
    string."""
    return read_fits_bytes_header(maybe_decompress(data), 0)[0]


_BITPIX_DTYPE = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def parse_fits_image(data: bytes) -> tuple[dict, np.ndarray | None]:
    """(primary header, 2-D data array) — BITPIX/BSCALE/BZERO honored;
    bz2/gzip payloads (SDSS ``frame-*.fits.bz2``) decompress transparently."""
    data = maybe_decompress(data)
    header, pos = read_fits_bytes_header(data, 0)
    naxis = int(header.get("NAXIS", 0))
    if naxis < 2:
        return header, None
    w, h = int(header["NAXIS1"]), int(header["NAXIS2"])
    dt = np.dtype(_BITPIX_DTYPE[int(header["BITPIX"])])
    n = w * h * dt.itemsize
    arr = np.frombuffer(data[pos : pos + n], dtype=dt).reshape(h, w).astype(np.float32)
    scale, zero = float(header.get("BSCALE", 1.0)), float(header.get("BZERO", 0.0))
    if scale != 1.0 or zero != 0.0:
        arr = arr * scale + zero
    return header, arr


_HEADER_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("n_bytes", LongType()),
        StructField("header", StringType()),
    ]
)


def scan_fits_headers(
    spark: SparkSession,
    directory: str,
    pattern: str = "*.fits*",
    limit: int | None = None,
) -> DataFrame:
    """FITS header cache table (S4; ref MetadataCacheBuilder,
    processors/metadata.py:120-130): (path, n_bytes, header JSON).

    binaryFile pushes the glob to the file listing (P1); ``limit`` prunes at
    scan (P2). Headers parse per Arrow batch in mapInPandas.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(directory)
    )
    if limit is not None:
        df = df.limit(limit)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "n_bytes": [], "header": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                out["path"].append(path)
                out["n_bytes"].append(len(content))
                try:
                    hdr = parse_fits_header(bytes(content))
                    out["header"].append(json.dumps(hdr, default=str))
                except Exception as exc:  # corrupt file → record, don't fail scan
                    out["header"].append(json.dumps({"_error": str(exc)}))
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(_parse, schema=_HEADER_SCHEMA)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)


# --------------------------------------------------------------------------
# BINTABLE reader (spectrum HDUs are binary tables: loglam/flux/ivar columns)
# --------------------------------------------------------------------------

_TFORM_DTYPE = {"L": "?", "B": "u1", "I": ">i2", "J": ">i4", "K": ">i8", "E": ">f4", "D": ">f8"}


def parse_fits_bintable(data: bytes, hdu_index: int = 1) -> dict[str, np.ndarray]:
    """Read a BINTABLE HDU into {column name: array} (pure python/numpy).

    Supports scalar columns of types L/B/I/J/K/E/D and fixed-width strings
    (rA) — the subset SDSS spec files and our own exporter use. Walks HDUs
    from the primary header to ``hdu_index``. bz2/gzip payloads (SDSS
    ``spec-*.fits.gz``) decompress transparently.
    """
    data = maybe_decompress(data)
    pos = 0
    header: dict = {}
    for _ in range(hdu_index + 1):
        header, pos = read_fits_bytes_header(data, pos)
        if header.get("XTENSION") == "BINTABLE" or "TFIELDS" not in header:
            if header.get("NAXIS", 0) and "TFIELDS" not in header:
                # skip a data section of a non-table HDU
                size = abs(int(header.get("BITPIX", 8))) // 8
                for ax in range(1, int(header["NAXIS"]) + 1):
                    size *= int(header[f"NAXIS{ax}"])
                pos += size + ((-size) % _BLOCK)
        if header.get("XTENSION") == "BINTABLE":
            break
    if header.get("XTENSION") != "BINTABLE":
        raise ValueError("no BINTABLE HDU found")

    nfields = int(header["TFIELDS"])
    row_bytes = int(header["NAXIS1"])
    nrows = int(header["NAXIS2"])
    dtype, names = [], []
    for i in range(1, nfields + 1):
        name = str(header.get(f"TTYPE{i}", f"col{i}")).strip()
        form = str(header[f"TFORM{i}"]).strip()
        if form.endswith("A"):
            width = int(form[:-1] or 1)
            dtype.append((name, f"S{width}"))
        else:
            # forms like '1E', 'E', '4620E' (repeat counts → array cells)
            rep = int(form[:-1]) if form[:-1] else 1
            base = _TFORM_DTYPE[form[-1]]
            dtype.append((name, base, (rep,)) if rep > 1 else (name, base))
        names.append(name)
    rec = np.frombuffer(data[pos : pos + row_bytes * nrows], dtype=np.dtype(dtype))
    return {n: np.array(rec[n]) for n in names}
