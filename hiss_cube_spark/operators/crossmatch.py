"""Spatial cross-match join (SURVEY.md J2) — cell-explode equi-join.

The reference's link phase matches each spectrum to all images whose footprint
overlaps it: healpix query_disc → binary-search probe of a sorted image index
→ WCS cutout bounds → wholeness post-filter, capped at MAX_CUTOUT_REFS=200
(metadata_strategy_spectrum.py:440-477,727-734; astrometry.py:71-182).

Spark-first formulation — no custom join strategy needed:

    probes.withColumn("cell", explode(disc_cells(ra, dec)))
          .join(targets, "cell")            # shuffle/broadcast equi-join
          .where(exact_distance <= radius)  # superset-cover post-filter

* The disc cover is a superset, so the equi-join is a candidate generator and
  the distance predicate restores exactness.
* Catalyst picks broadcast vs sort-merge; at 100 TB both sides partition by
  `cell`, so the shuffle is key-local and AQE handles skewed cells (dense sky
  regions).
* A candidate can match through several cover cells → dedupe on the pair key
  before the post-filter (cheap: same shuffle key).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hiss_cube_spark.functions.spatial import grid_cell, grid_disc_cells, sphere_dist_deg

__all__ = [
    "crossmatch", "cap_matches_per_probe", "cone_search", "knn_crossmatch",
    "healpix_order_for_radius",
]


def healpix_order_for_radius(radius_deg: float) -> int:
    """Deepest HEALPix order whose pixels still cover a disc of
    ``radius_deg`` with a small constant cell count (pixel circumradius
    ≥ radius ⇒ ≤ ~9 cover cells, the 3×3 analog of the grid family).
    58.6323°/nside bounds the nested pixel circumradius (same constant the
    inclusive-cover padding uses, functions/spatial.py)."""
    import math as _math

    order = int(_math.floor(_math.log2(58.6323 / max(radius_deg, 1e-12))))
    return max(0, min(order, 29))


def crossmatch(
    probes: DataFrame,
    targets: DataFrame,
    radius_deg: float,
    cell_deg: float | None = None,
    probe_ra: str = "ra",
    probe_dec: str = "dec",
    target_ra: str = "ra",
    target_dec: str = "dec",
    disc_cells_fn: Callable[[Column, Column], Column] | None = None,
    cell_fn: Callable[[Column, Column], Column] | None = None,
    broadcast_targets: bool = False,
    index: str = "grid",
    healpix_order: int | None = None,
) -> DataFrame:
    """All (probe, target) pairs within ``radius_deg``.

    Probe columns are prefixed ``p_`` and target columns ``t_`` in the output,
    plus a ``match_dist`` column. The spatial index family is pluggable:
    ``index="grid"`` (default here; equatorial/oracle-parity family —
    equiangular cells with ``cell_deg = radius_deg``, 3×3 covers, pole
    caveat documented at functions/spatial.py:71-74) or
    ``index="healpix"`` (the reference's family, astrometry.py:158-182 —
    pole-correct, equal-area; the PIPELINE default, plans/pipeline.py).
    Both are superset covers + exact post-filter, so the MATCH SET is
    identical wherever the grid cover is valid; near the poles only
    healpix is correct. Explicit ``disc_cells_fn``/``cell_fn`` override
    either family.
    """
    if cell_deg is None:
        cell_deg = radius_deg
    if index not in ("grid", "healpix"):
        raise ValueError(f"index must be grid|healpix, got {index!r}")
    if index == "healpix" and disc_cells_fn is None and cell_fn is None:
        from hiss_cube_spark.functions.spatial import (
            healpix_ang2pix_nest,
            healpix_disc_cover,
        )

        order = (
            healpix_order_for_radius(radius_deg)
            if healpix_order is None else healpix_order
        )
        disc_cells_fn = lambda ra, dec: healpix_disc_cover(
            ra, dec, radius_deg, order
        )
        cell_fn = lambda ra, dec: healpix_ang2pix_nest(ra, dec, order)
    if disc_cells_fn is None:
        disc_cells_fn = lambda ra, dec: grid_disc_cells(ra, dec, radius_deg, cell_deg)
    if cell_fn is None:
        cell_fn = lambda ra, dec: grid_cell(ra, dec, cell_deg)

    p = probes.select(
        *[F.col(c).alias(f"p_{c}") for c in probes.columns],
        F.explode(disc_cells_fn(F.col(probe_ra), F.col(probe_dec))).alias("_cell"),
    )
    t = targets.select(
        *[F.col(c).alias(f"t_{c}") for c in targets.columns],
        cell_fn(F.col(target_ra), F.col(target_dec)).alias("_cell"),
    )
    if broadcast_targets:
        t = F.broadcast(t)

    dist = sphere_dist_deg(
        F.col(f"p_{probe_ra}"),
        F.col(f"p_{probe_dec}"),
        F.col(f"t_{target_ra}"),
        F.col(f"t_{target_dec}"),
    )
    # No pair-dedup needed: disc covers are distinct-cell arrays and each
    # target owns exactly one cell, so a pair joins through at most one cell.
    return (
        p.join(t, "_cell")
        .drop("_cell")
        .withColumn("match_dist", dist)
        .where(F.col("match_dist") <= F.lit(float(radius_deg)))
    )


def cap_matches_per_probe(
    matches: DataFrame,
    probe_key: str,
    order_col: str,
    max_refs: int = 200,
) -> DataFrame:
    """Keep at most ``max_refs`` matches per probe, deterministically.

    Mirrors MAX_CUTOUT_REFS=200 (config.ini:36, metadata_strategy_spectrum.py:690).
    Uses row_number over (probe, order) — a single window on the join's
    existing partitioning.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(probe_key).orderBy(F.col(order_col).asc())
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_refs)
        .drop("_rn")
    )


def cone_search(
    df,
    ra0: float,
    dec0: float,
    radius_deg: float,
    ra_col: str = "ra",
    dec_col: str = "dec",
    cell_deg: float | None = None,
):
    """Cone search: rows within ``radius_deg`` of a fixed (ra0, dec0), with
    the exact separation attached as ``dist_deg``.

    The disc's cell cover is built from LITERALS, so Catalyst constant-folds
    it to a literal array and the prefilter is a plain IN-list on the row's
    cell id — with the bronze layout sorted by the spatial key this prunes
    parquet row groups via min/max stats before the exact distance test runs.
    The standard single-object lookup the reference serves via its spatial
    tree walk (astrometry.py:140-155).
    """
    if cell_deg is None:
        cell_deg = max(float(radius_deg), 0.1)
    cells = grid_disc_cells(
        F.lit(float(ra0)), F.lit(float(dec0)), float(radius_deg), float(cell_deg)
    )
    pre = F.array_contains(cells, grid_cell(F.col(ra_col), F.col(dec_col), float(cell_deg)))
    dist = sphere_dist_deg(
        F.col(ra_col), F.col(dec_col), F.lit(float(ra0)), F.lit(float(dec0))
    )
    return (
        df.where(pre)
        .withColumn("dist_deg", dist)
        .where(F.col("dist_deg") <= F.lit(float(radius_deg)))
    )


def knn_crossmatch(
    probes: DataFrame,
    targets: DataFrame,
    k: int,
    radius_deg: float,
    probe_id: str = "spec_id",
    target_id: str = "img_id",
    **kwargs,
) -> DataFrame:
    """k-nearest-neighbor cross-match: each probe's ``k`` closest targets
    within ``radius_deg`` — the counterpart-selection query astronomers
    run after a radius match (nearest-neighbor association, ref's link
    phase picks ALL within radius; kNN picks the best k). Probes with
    fewer than k targets inside the radius emit what exists — widen the
    radius (candidate cost grows with its square) rather than expecting
    escalation here.

    Same candidate plan as `crossmatch` (disc-cover cell equi-join, exact
    distance predicate) plus one per-probe rank window with a target-id
    tie-break — `match_dist` is built from correctly-rounded IEEE ops, so
    the ranking is bit-deterministic in any engine.
    """
    from pyspark.sql.window import Window

    m = crossmatch(probes, targets, radius_deg, **kwargs)
    w = Window.partitionBy(f"p_{probe_id}").orderBy(
        F.col("match_dist").asc(), F.col(f"t_{target_id}").asc()
    )
    return (
        m.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
