"""Linear WCS transforms (SURVEY.md F3/F4) — native column expressions.

The reference builds an astropy TAN WCS then uses only its linear part for
cutout bounds (utils/astrometry.py:39-125). For small fields the TAN
projection is locally affine, so world↔pixel is a 2×2 matrix op on the WCS
struct columns — pure Catalyst expressions, no Python.

WCS struct fields (FIXTURES.md §1): crpix1 crpix2 cd1_1 cd1_2 cd2_1 cd2_2
crval1 crval2 ctype1 ctype2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["world_to_pixel", "pixel_to_world", "rescale_wcs_for_zoom"]


def _det(wcs: Column) -> Column:
    return wcs["cd1_1"] * wcs["cd2_2"] - wcs["cd1_2"] * wcs["cd2_1"]


def world_to_pixel(wcs: Column, ra: Column, dec: Column) -> tuple[Column, Column]:
    """(x, y) 0-based pixel coordinates of a world position.

    Inverts the linear system [dra, ddec] = CD @ [x - crpix1, y - crpix2]
    (crpix here 0-based)."""
    dra = ra - wcs["crval1"]
    ddec = dec - wcs["crval2"]
    det = _det(wcs)
    dx = (wcs["cd2_2"] * dra - wcs["cd1_2"] * ddec) / det
    dy = (wcs["cd1_1"] * ddec - wcs["cd2_1"] * dra) / det
    return wcs["crpix1"] + dx, wcs["crpix2"] + dy


def pixel_to_world(wcs: Column, x: Column, y: Column) -> tuple[Column, Column]:
    """(ra, dec) of a 0-based pixel coordinate (linear forward transform)."""
    dx = x - wcs["crpix1"]
    dy = y - wcs["crpix2"]
    ra = wcs["crval1"] + wcs["cd1_1"] * dx + wcs["cd1_2"] * dy
    dec = wcs["crval2"] + wcs["cd2_1"] * dx + wcs["cd2_2"] * dy
    return ra, dec


def rescale_wcs_for_zoom(wcs: Column, zoom: int) -> Column:
    """Zoom-z WCS: crpix /= 2^z, cd *= 2^z (ref astrometry.py:185-208)."""
    s = float(1 << zoom)
    return F.struct(
        (wcs["crpix1"] / s).alias("crpix1"),
        (wcs["crpix2"] / s).alias("crpix2"),
        (wcs["cd1_1"] * s).alias("cd1_1"),
        (wcs["cd1_2"] * s).alias("cd1_2"),
        (wcs["cd2_1"] * s).alias("cd2_1"),
        (wcs["cd2_2"] * s).alias("cd2_2"),
        wcs["crval1"].alias("crval1"),
        wcs["crval2"].alias("crval2"),
        wcs["ctype1"].alias("ctype1"),
        wcs["ctype2"].alias("ctype2"),
    )
