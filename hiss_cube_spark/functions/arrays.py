"""Array column helpers (SURVEY.md F15, A5, J5 slicing) — native expressions.

All of these compile to Catalyst higher-order functions (zip_with, aggregate,
transform, slice) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "array_dot",
    "array_l1",
    "array_l2_norm",
    "cosine_similarity",
    "slice_2d",
    "sanitize_nonfinite",
]


def array_dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (in-order accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def array_l1(a: Column, b: Column) -> Column:
    """L1 distance between two arrays (ref target_distance,
    metadata_strategy_cube_ml.py:40-48)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def array_l2_norm(a: Column) -> Column:
    """Euclidean norm of an array."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two arrays; null-safe on zero norms."""
    denom = array_l2_norm(a) * array_l2_norm(b)
    return F.when(denom > 0, array_dot(a, b) / denom)


def slice_2d(matrix: Column, y_min: Column, y_max: Column, x_min: Column, x_max: Column) -> Column:
    """Slice a 2-D array<array<T>> to rows [y_min, y_max) × cols [x_min, x_max).

    This is the Spark-native cutout dereference (ref
    SerialDatasetIOStrategy.dereference_region_ref, io_strategy.py:80-91:
    ``ds[idx, x0:x1, y0:y1]``): a relational join carries the bounds; slicing
    stays a pure expression. Bounds are 0-based half-open like numpy.
    """
    return F.transform(
        F.slice(matrix, y_min + 1, y_max - y_min),
        lambda row: F.slice(row, x_min + 1, x_max - x_min),
    )


def sanitize_nonfinite(x: Column) -> Column:
    """±Inf/NaN → null (ref P3 Inf→NaN sanitization,
    metadata_strategy_dataset.py:173-174; null gives nansum semantics)."""
    finite = (~F.isnan(x)) & (F.abs(x) != F.lit(float("inf")))
    return F.when(finite, x)
