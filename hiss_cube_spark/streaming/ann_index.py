"""Streaming IVF index refresh: an embedding stream keeps a partitioned
approximate-nearest-neighbor index current without ever retraining or
re-scanning the indexed corpus — the "windowed ANN refresh" shape a
continuously-ingesting retrieval corpus needs.

Design for 100 TB:

* **Centroids are a frozen model**, trained ONCE on a bounded deterministic
  sample (`train_ivf_centroids`, the PQ-codebook discipline) and embedded in
  the assignment expression as literals — no broadcast state to manage, no
  per-batch training cost, and every batch (and every replay) assigns
  identically. Re-training is a rebuild, not a refresh: swap in a new index
  directory, exactly like a table-format compaction.
* **Append-only epoch-keyed layout**: each micro-batch writes its vectors to
  ``index_dir/batch=<epoch>/cell=<k>/`` with overwrite — a replayed epoch
  rewrites its own directory, so exactly-once needs no marker/rename dance
  (contrast the merge-style CDC snapshot, which must swap). Both layers are
  partition columns: queries prune to ``n_probe`` cells across all batches,
  readers of a time window prune on ``batch``.
* **Queries probe, never scan**: assignment + probing reuse the same
  native-expression distance array (`operators/similarity.ivf_topk`), the
  probed-cell filter hits the parquet PartitionFilters, and the exact
  cosine rerank runs only inside probed cells.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hiss_cube_spark.operators.similarity import _kmeans_np, cosine_expr

__all__ = ["train_ivf_centroids", "stream_ivf_refresh", "query_ivf_index", "assign_cells"]


def train_ivf_centroids(
    vecs: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
    max_iter: int = 10,
) -> list[list[float]]:
    """Deterministic Lloyd centroids from a bounded hash-ordered sample
    (driver-side; the collect is capped by construction). Ordering by
    ``xxhash64(id)`` rather than the raw id gives a pseudo-random slice —
    low-id prefixes are often temporally or source-correlated and would
    bias the centroids."""
    sample = (
        vecs.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_i")), F.col("_i"))
        .limit(sample_rows)
        .collect()
    )
    X = np.array([r["_v"] for r in sample], dtype=np.float64)
    return [list(map(float, c)) for c in _kmeans_np(X, n_cells, max_iter)]


def _dist_array(v: Column, centroids: list[list[float]]) -> Column:
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )


def assign_cells(
    vecs: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Input columns + ``cell`` (nearest centroid, int). Pure codegen map."""
    return (
        vecs.withColumn("_d", _dist_array(F.col(vec_col), centroids))
        .withColumn("cell", F.expr("array_position(_d, array_min(_d)) - 1").cast("int"))
        .drop("_d")
    )


def stream_ivf_refresh(
    vecs: DataFrame,
    index_dir: str,
    centroids: list[list[float]],
    checkpoint_dir: str,
    vec_col: str = "embedding",
):
    """Start a streaming query folding embeddings into the IVF index.

    Returns the started ``StreamingQuery``. The index directory is created
    on first land; see module docstring for the layout and idempotence
    argument.
    """
    import os

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        assign_cells(batch_df, centroids, vec_col).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(os.path.join(index_dir, f"batch={batch_id}"))

    return (
        vecs.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    centroids: list[list[float]] | None = None,
    n_probe: int = 2,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` cosine neighbors from the landed index, probing
    ``n_probe`` cells per query.

    The probed-cell set is at most ``len(centroids)`` values, so it rides
    into the scan as an IN-list partition filter — the physical plan shows
    ``PartitionFilters: [cell IN (...)]`` and untouched cells' files are
    never opened.

    ``centroids`` must be the list the index was built with
    (`train_ivf_centroids` output) — there is no usable default.
    """
    if not centroids:
        raise ValueError(
            "query_ivf_index requires the centroids the index was built with "
            "(pass train_ivf_centroids(...) output)"
        )
    probes = F.expr(
        "slice(transform(array_sort(transform(sequence(0, size(_d)-1), "
        "i -> struct(_d[i] AS d, i AS idx))), s -> s.idx), 1, "
        f"{n_probe})"
    )
    q = (
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"))
        .withColumn("_d", _dist_array(F.col("_qv"), centroids))
        .select("query_id", "_qv", F.explode(probes).alias("cell"))
        .withColumn("cell", F.col("cell").cast("int"))
    )
    probe_cells = sorted(
        {r["cell"] for r in q.select("cell").distinct().collect()}
    )  # bounded by n_cells, by construction
    idx = spark.read.parquet(index_dir).where(F.col("cell").isin(probe_cells))
    sim = (
        idx.select(F.col(query_id).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "cell")
        .join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
