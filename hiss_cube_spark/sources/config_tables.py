"""Config-table loaders (SURVEY.md S8, J1).

* CCD gain / dark-variance TSVs whose ``run`` cells are PREDICATE STRINGS
  ("<1100", ">1100") that the reference evals at lookup time
  (photometry.py:352-357). Here they parse once into (run_lo, run_hi] bounds
  — a broadcast range join replaces the eval (never re-implement eval).
* Transmission curves (band, wl, ratio) with the max-merge aggregate (A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["load_ccd_table", "lookup_ccd_value", "load_transmission_curves", "merge_transmission_curves_max"]

_LONG_MAX = (1 << 63) - 1


def load_ccd_table(spark: SparkSession, tsv_path: str) -> DataFrame:
    """Parse a ccd config TSV (camcol, run-predicate, u g r i z) into
    (camcol, run_lo, run_hi, band, value) long-form rows with explicit
    bounds; exactly one row matches any (camcol, run, band)."""
    raw = spark.read.option("header", "true").option("sep", "\t").csv(tsv_path)
    runp = F.col("run")
    lo = F.when(runp.startswith(">"), F.expr("substring(run, 2)").cast("long")).otherwise(
        F.lit(-_LONG_MAX)
    )
    hi = F.when(runp.startswith("<"), F.expr("substring(run, 2)").cast("long")).otherwise(
        F.lit(_LONG_MAX)
    )
    wide = raw.select(
        F.col("camcol").cast("int"), lo.alias("run_lo"), hi.alias("run_hi"), "u", "g", "r", "i", "z"
    )
    stack = F.expr(
        "stack(5, 'u', u, 'g', g, 'r', r, 'i', i, 'z', z) as (band, value)"
    )
    return wide.select("camcol", "run_lo", "run_hi", stack).withColumn(
        "value", F.col("value").cast("double")
    )


def lookup_ccd_value(df: DataFrame, ccd: DataFrame, run="run", camcol="camcol", band="band") -> DataFrame:
    """Broadcast theta-join: equi (camcol, band) + run range (J1)."""
    return df.join(
        F.broadcast(ccd),
        (df[camcol] == ccd["camcol"])
        & (df[band] == ccd["band"])
        & (df[run] > ccd["run_lo"])
        & (df[run] < ccd["run_hi"]),
    ).drop(ccd["camcol"]).drop(ccd["band"])


def load_transmission_curves(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    """Union per-band .dat curves into (band, wl, ratio)."""
    out = None
    for band, p in paths.items():
        df = (
            spark.read.option("sep", " ").schema("wl double, ratio double").csv(p)
            .withColumn("band", F.lit(band))
        )
        out = df if out is None else out.unionByName(df)
    return out


def merge_transmission_curves_max(curves: DataFrame) -> DataFrame:
    """Max-merge overlapping curves (A6; ref photometry.py:323-341):
    per wl keep the max ratio and its band."""
    return curves.groupBy("wl").agg(
        F.max("ratio").alias("ratio"), F.max_by("band", "ratio").alias("band")
    )
