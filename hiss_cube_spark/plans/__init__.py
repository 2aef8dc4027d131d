"""Pipeline plans: the bronze→silver→gold build director."""

from hiss_cube_spark.plans.pipeline import CubePipeline

__all__ = ["CubePipeline"]
