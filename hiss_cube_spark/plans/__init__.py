"""Pipeline plans: the bronze→silver→gold build director, plus the
bucketed-warehouse layout helpers (pay-once-shuffle co-located joins)."""

from hiss_cube_spark.plans.bucketing import (
    colocated_join,
    join_exchange_count,
    write_bucketed,
)
from hiss_cube_spark.plans.pipeline import CubePipeline

__all__ = [
    "CubePipeline",
    "write_bucketed",
    "colocated_join",
    "join_exchange_count",
]
