"""Streaming link phase: continuously-arriving probes (spectra) spatially
cross-matched against a static target catalog (the image index).

The reference's link phase (builders.py:221-230, the J2 join) runs as one
batch pass after ingest; here the same operator —
`operators.crossmatch.crossmatch`, unchanged — runs over a file-source
stream: each micro-batch of newly-landed probes explodes its disc cover and
inner-joins the static side. Stream-static inner joins are stateless in
Structured Streaming (no watermark, no state store): every new probe is
matched exactly once, matches append immediately, and a restart resumes
from the checkpoint's file log. The static side is re-scanned per
micro-batch — at 100 TB keep it a pruned, spatially-sorted bronze table (or
pass ``broadcast_targets=True`` when the catalog fits executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hiss_cube_spark.operators.crossmatch import crossmatch
from hiss_cube_spark.streaming.windows import stream_from_directory

__all__ = ["stream_crossmatch"]


def stream_crossmatch(
    spark,
    landing_path: str,
    probe_schema,
    targets: DataFrame,
    radius_deg: float,
    fmt: str = "parquet",
    **crossmatch_kwargs,
) -> DataFrame:
    """File-source probe stream ⋈ static targets via the batch `crossmatch`
    operator (identical semantics — the batch/streaming dual-mode plan)."""
    probes = stream_from_directory(spark, landing_path, probe_schema, fmt=fmt)
    return crossmatch(probes, targets, radius_deg, **crossmatch_kwargs)
