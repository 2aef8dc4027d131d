"""Range (point-in-interval) join with bucket blocking.

Extension beyond the reference (SURVEY.md §2.3: the reference has no range
joins; its only theta predicate is the tiny broadcast CCD lookup, J1).

A plain ``lo <= x AND x <= hi`` join gives Spark no equi-key, so Catalyst
falls back to BroadcastNestedLoopJoin — quadratic work at scale. The
scalable shape: quantize the domain into buckets of width ``w``; an interval
registers in every bucket it touches (``explode(sequence(lo/w, hi/w))``), a
point lives in exactly ONE bucket — so the bucket equi-join meets every
qualifying (point, interval) pair exactly once (no dedup needed) and the
exact BETWEEN post-filter drops bucket-mates outside the interval.

Pick ``bucket_width`` near the median interval length: the interval side
then explodes into O(1) rows each, and bucket selectivity does the pruning
a nested loop cannot. Degenerate intervals spanning the whole domain explode
into many buckets — cap with a coarser width or split the handful of giant
intervals out to a broadcast nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join", "interval_overlap_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: tuple[str, ...] | list[str] = (),
    bucket_width: int = 1,
) -> DataFrame:
    """Inner join of points to the intervals containing them (inclusive
    bounds), optionally also on equality keys ``by``. Output has all columns
    from both sides (minus the helper bucket).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(int(bucket_width))
    pb = points.withColumn("_b", F.floor(F.col(point_col) / w).cast("long"))
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    cond = [pb["_b"] == ib["_b"]] + [pb[c] == ib[c] for c in by]
    joined = pb.join(ib, cond).where(
        (pb[point_col] >= ib[lo_col]) & (pb[point_col] <= ib[hi_col])
    )
    drop = [pb["_b"], ib["_b"]] + [ib[c] for c in by]
    return joined.drop(*drop)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lo_left: str,
    hi_left: str,
    lo_right: str,
    hi_right: str,
    by: tuple[str, ...] | list[str] = (),
    bucket_width: int = 1,
) -> DataFrame:
    """Inner join of overlapping intervals (inclusive bounds:
    ``lo_left <= hi_right AND lo_right <= hi_left``), optionally also on
    equality keys ``by``.

    Same bucket blocking as :func:`range_join`, with one twist: two
    overlapping intervals can share MANY buckets, which would duplicate the
    pair. Instead of a distinct, each pair is kept only in the bucket
    containing the overlap's start, ``max(lo_left, lo_right)`` — a bucket
    both sides are guaranteed to touch — so every qualifying pair emerges
    exactly once with no dedup shuffle. Explode factor per side =
    interval length / bucket width, as for ``range_join``.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(int(bucket_width))
    lb = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_left) / w).cast("long"),
                F.floor(F.col(hi_left) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_right) / w).cast("long"),
                F.floor(F.col(hi_right) / w).cast("long"),
            )
        ),
    )
    cond = [lb["_b"] == rb["_b"]] + [lb[c] == rb[c] for c in by]
    start_bucket = F.floor(F.greatest(lb[lo_left], rb[lo_right]) / w).cast("long")
    joined = lb.join(rb, cond).where(
        (lb[lo_left] <= rb[hi_right])
        & (rb[lo_right] <= lb[hi_left])
        & (lb["_b"] == start_bucket)
    )
    drop = [lb["_b"], rb["_b"]] + [rb[c] for c in by]
    return joined.drop(*drop)


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
