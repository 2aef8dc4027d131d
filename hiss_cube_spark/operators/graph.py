"""Fixed-iteration PageRank over an edge DataFrame.

Companion to the min-label connected components in ``clusters.py`` — the
second classic iterative-graph workload, expressed as a short driver loop of
DataFrame joins so Catalyst plans every iteration (no RDDs, no GraphX
dependency). The reference engine has no graph surface; this extends the
repo's curation toolkit (e.g. ranking interlinked web domains before
sampling a training mix).

Cross-engine exactness: per-iteration contributions are quantized to 9
decimals *before* the per-destination sum, and the sum runs in DECIMAL —
exact and order-independent — so a SQL oracle that unrolls the same number
of iterations reproduces the ranks bit-for-bit (same discipline as the
decimal-quantized IVW sums).

Scale shape: each iteration is one equi-join of the edge table against the
current rank vector (broadcast when the node set is small, shuffle-hash on
``src`` otherwise) plus one aggregation by ``dst`` — the textbook
distributed PageRank data flow. The driver loop only grows the *plan*
linearly in ``iterations``; for long chains, checkpoint every ~10 rounds
(same guidance as ``connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 9,
) -> DataFrame:
    """Rank nodes of the directed graph ``edges`` (``iterations`` rounds).

    Nodes are everything appearing as a source or destination. Ranks start
    uniform at ``1/N`` and update as

        rank'(v) = (1-d)/N + d · Σ_{u→v} round(rank(u)/outdeg(u), scale)

    (the simple variant: dangling-node mass is not redistributed, matching
    the unrolled SQL oracle). Returns ``(node, rank)`` with ``rank``
    rounded to ``scale`` decimals.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # bounded: one scalar, needed for the base term
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (1.0 - damping) / n_nodes

    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / n_nodes, scale).alias("rank")
    )
    qdec = f"decimal(30,{scale})"
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("outdeg"), scale)
                .cast(qdec)
                .alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.round(
                F.lit(base)
                + F.lit(damping)
                * F.coalesce(F.col("mass").cast("double"), F.lit(0.0)),
                scale,
            ).alias("rank"),
        )
    return ranks
