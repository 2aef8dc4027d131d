"""Skew-mitigation joins (100 TB hygiene).

AQE's skew-join splitting (enabled in the session factory) handles most
cases; :func:`salted_join` is the explicit fallback for pathological keys —
the probe side explodes each row into one of ``salt`` sub-keys and the build
side replicates across all sub-keys, turning one hot partition into
``salt`` even ones. Result is identical to the plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is pathological.

    ``skewed`` gets a random-but-deterministic salt from its own row content
    (xxhash64 of all columns — no RNG, replayable); ``other`` is exploded
    ``salt``× so every (key, salt) bucket finds its match.

    Only join types where the ``other`` side never emits unmatched rows are
    allowed (inner/left*): in right/full joins the replicated side would
    surface ``salt`` copies of each unmatched row.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    o = other.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return s.join(o, on + ["_salt"], how).drop("_salt")
