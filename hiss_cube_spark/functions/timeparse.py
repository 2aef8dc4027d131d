"""Time conversions (SURVEY.md F5) — native expressions.

MJD = unix_seconds/86400 + 40587 (ref utils/io.py:426-432 converts DATE-OBS
ISOT → MJD with a %d/%m/%y fallback).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MJD_UNIX_EPOCH = 40587.0  # MJD of 1970-01-01


def ts_to_mjd(ts: Column) -> Column:
    """Timestamp column → Modified Julian Date (double)."""
    return F.unix_timestamp(ts).cast("double") / F.lit(86400.0) + F.lit(_MJD_UNIX_EPOCH)


def mjd_to_ts(mjd: Column) -> Column:
    """Modified Julian Date → timestamp."""
    return F.timestamp_seconds((mjd - F.lit(_MJD_UNIX_EPOCH)) * F.lit(86400.0))


def parse_obs_time(date_obs: Column) -> Column:
    """Parse an observation date string: ISO-8601 first, then %d/%m/%y.

    Mirrors the reference fallback chain (utils/io.py:426-432); returns MJD.
    """
    ts = F.coalesce(
        F.try_to_timestamp(date_obs),
        F.try_to_timestamp(date_obs, F.lit("dd/MM/yy")),
    )
    return ts_to_mjd(ts)
