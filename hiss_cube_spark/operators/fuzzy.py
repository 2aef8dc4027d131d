"""Blocked fuzzy string matching (entity resolution).

Nearest-candidate-by-Levenshtein without a cross join: Levenshtein(a, b) >=
|len(a) - len(b)|, so candidates outside a length band of width B cannot
beat an in-band best distance d* <= B (their distance is strictly > B).
Each round therefore:

1. explodes the probe side over offsets -B..B and equi-joins
   ``len(probe) + offset == len(candidate)`` — a hash join Catalyst can
   broadcast or shuffle, never a cartesian;
2. keeps probes whose in-band best distance d* <= B (globally optimal by
   the bound above, including the tie order: any out-of-band candidate is
   strictly worse);
3. doubles B for the remaining probes.

B reaching the longest string on either side puts every pair in band, so
the loop always terminates with the exact all-pairs answer — the driver
loop runs O(log max_len) rounds. Escalation rounds run on the (typically
tiny) unresolved remainder only, so the common cost is round 1: a blocked
equi-join with ~(2B+1)-fold probe amplification instead of |probes| ×
|candidates| pairs. Mirrors the reference's nearest-neighbour lookups being
bounded by spatial blocking rather than all-pairs scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["best_fuzzy_match"]


def best_fuzzy_match(
    probes: DataFrame,
    candidates: DataFrame,
    probe_col: str,
    cand_col: str,
    initial_band: int = 4,
) -> DataFrame:
    """For each distinct probe string, the candidate with the smallest
    Levenshtein distance (ties broken by candidate string ascending).

    Returns columns ``(probe_col, best_match, dist)``.
    """
    p = probes.select(F.col(probe_col).cast("string")).where(
        F.col(probe_col).isNotNull()
    ).distinct()
    c = candidates.select(F.col(cand_col).cast("string")).where(
        F.col(cand_col).isNotNull()
    ).distinct().withColumn("_clen", F.length(cand_col))

    # one driver round-trip for both scalar maxima: union the two 1-row
    # aggregates into a single job instead of two separate collects
    cap_row = (
        p.agg(F.max(F.length(probe_col)).alias("m"))
        .unionAll(candidates.agg(F.max(F.length(cand_col)).alias("m")))
        .agg(F.max("m").alias("m"))
        .collect()[0]
    )
    cap = cap_row["m"] or 0  # B >= cap puts every pair in band

    results: list[DataFrame] = []
    remaining = p
    band = max(1, initial_band)
    while True:
        banded = (
            remaining.withColumn(
                "_off", F.explode(F.sequence(F.lit(-band), F.lit(band)))
            )
            .withColumn("_key", F.length(probe_col) + F.col("_off"))
            .join(c, F.col("_key") == F.col("_clen"))
            .withColumn("dist", F.levenshtein(F.col(probe_col), F.col(cand_col)))
        )
        w = Window.partitionBy(probe_col).orderBy("dist", cand_col)
        best = (
            banded.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(probe_col, F.col(cand_col).alias("best_match"), "dist")
        )
        if band >= cap:
            results.append(best)  # full band: best is global for all rows
            break
        proven = best.where(F.col("dist") <= band)
        results.append(proven)
        remaining = remaining.join(proven, [probe_col], "left_anti")
        if remaining.isEmpty():
            break
        band *= 2

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
