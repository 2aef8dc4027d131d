"""Query operators (SURVEY.md §2.2–2.7 + training-data-pipeline extensions)."""

from hiss_cube_spark.operators.ivw import ivw_aggregate, ivw_aggregate_arrays
from hiss_cube_spark.operators.crossmatch import crossmatch

__all__ = ["ivw_aggregate", "ivw_aggregate_arrays", "crossmatch"]
