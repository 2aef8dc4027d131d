"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata; decode /
feature-extract / resize / frame-sample are ``mapInPandas`` kernels so the
heavy bytes stay in Arrow batches and never explode into JVM rows.

The actual codecs (Pillow/libav/opencv) are NOT in this container — the
decode step is stubbed: ``decode_fn`` defaults to a clearly-marked
deterministic fake (and raises ``NotImplementedError`` when
``require_real_codec=True``). Everything Spark-side — schema, batch shape,
partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["attach_binary_payload", "decode_metadata", "frame_sample", "extract_features"]


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo helper: materialize an opaque binary column (UTF-8 payload) with
    typed metadata, the storage shape real image/audio columns use."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decoder (no codecs in env)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": (n % 64) + 1,
        "height": (n % 48) + 1,
        "checksum": int(np.frombuffer(payload, dtype=np.uint8).astype(np.int64).sum()),
    }


def decode_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], dict] | None = None,
    require_real_codec: bool = False,
) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas.

    Arrow moves each partition's payload column once; the decode loop is
    per-batch numpy. Plug a real codec through ``decode_fn``.
    """
    if require_real_codec:
        raise NotImplementedError(
            "No image/audio codec available in this environment; pass decode_fn "
            "wrapping your codec (PIL.Image.open, av.open, ...) on a real cluster."
        )
    decode = decode_fn or _fake_decode

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=_DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_stride: int = 64,
) -> DataFrame:
    """Sample "frames" every ``frame_stride`` bytes: (doc_id, frame_id, byte_offset).

    The video analog: one row per sampled frame, native explode(sequence) —
    the payload itself is not shuffled, only offsets."""
    n = F.octet_length(F.col(payload_col))
    n_frames = F.greatest((n / F.lit(frame_stride)).cast("long"), F.lit(1))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_id"),
    ).withColumn("byte_offset", F.col("frame_id") * F.lit(frame_stride))


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
) -> DataFrame:
    """Deterministic fake feature extractor (byte-histogram projection) with
    the real pipeline shape: mapInPandas → array<float> feature column ready
    for the similarity operators."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                b = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm > 0 else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].to_numpy(), "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(_extract, schema=_FEATURE_SCHEMA)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
