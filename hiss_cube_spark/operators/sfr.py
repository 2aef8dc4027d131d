"""SFR external-catalog join (SURVEY.md J4).

Reference: SFRProcessor (processors/sfr.py:18-48): horizontally concatenate
gal_info and gal_sfr (same row order), then LEFT-join spectrum metadata on
(PLATEID, MJD, FIBERID) — unmatched spectra keep NaN SFR columns
(tests/test_sfr.py pins 4 NaNs of 11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["concat_by_position", "spectra_with_sfr"]


def concat_by_position(a: DataFrame, b: DataFrame, row_col: str = "row_id") -> DataFrame:
    """Positional horizontal concat (ref sfr.py:30 pd.concat(axis=1)) —
    in a distributed engine an explicit row-id equi-join; both catalog files
    carry the same row order, so ``row_id`` is part of the source schema."""
    dup = [c for c in b.columns if c in a.columns and c != row_col]
    return a.join(b.drop(*dup), row_col)


def spectra_with_sfr(
    spectrum_meta: DataFrame, gal_info: DataFrame, gal_sfr: DataFrame
) -> DataFrame:
    """Left equi-join of spectrum metadata with the concatenated SFR catalog
    on (PLATEID, MJD, FIBERID) (ref sfr.py:43-48)."""
    cat = concat_by_position(gal_info, gal_sfr)
    keys = ["PLATEID", "MJD", "FIBERID"]
    # The catalog can carry duplicate keys; the reference's pandas merge
    # keeps them all — so do we (plain left join, no dedup).
    return spectrum_meta.join(cat, keys, "left")
