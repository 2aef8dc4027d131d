"""Scalar/array function library (SURVEY.md §2.8, F1–F18).

Native Column expressions wherever possible (whole-stage codegen), pure-numpy
pandas UDFs only for HEALPix math and FITS-domain kernels.
"""

from hiss_cube_spark.functions.spatial import (
    grid_cell,
    grid_disc_cells,
    sphere_dist_deg,
    healpix_ang2pix_nest,
    healpix_disc_cover,
)
from hiss_cube_spark.functions.photometry import (
    mag_to_flux,
    flux_to_flux_density,
    ivw_components,
    FILTER_MIDPOINTS,
)
from hiss_cube_spark.functions.arrays import (
    array_dot,
    array_l1,
    array_l2_norm,
    cosine_similarity,
    slice_2d,
    sanitize_nonfinite,
)
from hiss_cube_spark.functions.timeparse import ts_to_mjd, mjd_to_ts
from hiss_cube_spark.functions.compress import float_compress

__all__ = [
    "grid_cell",
    "grid_disc_cells",
    "sphere_dist_deg",
    "healpix_ang2pix_nest",
    "healpix_disc_cover",
    "mag_to_flux",
    "flux_to_flux_density",
    "ivw_components",
    "FILTER_MIDPOINTS",
    "array_dot",
    "array_l1",
    "array_l2_norm",
    "cosine_similarity",
    "slice_2d",
    "sanitize_nonfinite",
    "ts_to_mjd",
    "mjd_to_ts",
    "float_compress",
]
