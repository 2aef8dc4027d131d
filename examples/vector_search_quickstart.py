"""Vector-search quickstart: the embedding-pipeline surface end to end.

Walks the ANN family on the synthetic `embeddings` table:

    exact top-k        cosine_topk      (brute force — the recall baseline)
    SQ8                sq_topk          (int8 codes, 4× less IO, value-exact)
    IVF                ivf_topk         (KMeans cells, probe a few)
    IVF-PQ             ivf_pq_topk      (cells + product-quantized residuals)
    whitening          whiten           (ZCA — decorrelate before indexing)
    hard negatives     hard_negatives   (contrastive mining, label-aware)
    dim reduction      random_projection (JL ±1 hash matrix, integer-exact)
    semantic dedup     semantic_dedup   (SemDeDup: cluster-then-compare)

Run:  python examples/vector_search_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("vector-search-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hiss_cube_spark.operators.similarity import (
        cosine_topk,
        hard_negatives,
        ivf_pq_topk,
        ivf_topk,
        random_projection,
        semantic_dedup,
        sq_topk,
        whiten,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = e.where(F.col("vec_id") < 5)
    n = e.count()
    print(f"corpus: {n} vectors of dim 64")

    exact = cosine_topk(queries, e, k=3)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    print(f"exact top-3: {len(exact_set)} pairs (baseline)")

    for name, df in [
        ("ivf ", ivf_topk(queries, e, k=3, n_cells=8, n_probe=4)),
        ("ivfpq", ivf_pq_topk(queries, e, k=3, n_cells=8, n_probe=4, m=16, n_centroids=32)),
    ]:
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        print(f"{name} recall vs exact: {len(got & exact_set) / len(exact_set):.2f}")

    # SQ8 scores by DOT PRODUCT (its contract; normalize inputs first if you
    # want cosine) — so its recall baseline is the exact-dot top-k
    from pyspark.sql.window import Window

    from hiss_cube_spark.functions.arrays import array_dot

    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv"))
    dots = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).withColumn(
        "dot", array_dot(F.col("_qv"), F.col("_cv"))
    )
    wd = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    exact_dot = {
        (r["query_id"], r["neighbor_id"])
        for r in dots.withColumn("rn", F.row_number().over(wd)).where("rn <= 3").collect()
    }
    sq = {(r["query_id"], r["neighbor_id"]) for r in sq_topk(queries, e, k=3, dim=64).collect()}
    print(f"sq8  recall vs exact-dot: {len(sq & exact_dot) / len(exact_dot):.2f}")

    w = whiten(e, dim=64)
    print(f"whitened: {w.count()} vectors (ZCA — covariance → identity)")

    hn = hard_negatives(queries, e, k=2)
    print(f"hard negatives (label-aware): {hn.count()} rows")

    proj = random_projection(e.limit(100), out_dim=16, in_dim=64)
    print(f"JL projection 64→16: {proj.count()} vectors, integer-exact")

    kept = semantic_dedup(e, threshold=0.95, n_cells=8)
    print(f"semantic dedup keeps {kept.count()}/{n}")

    # spherical k-means + per-cluster prototypicality (SemDeDup curation:
    # prune the prototypes, keep the outliers) — bit-deterministic
    from hiss_cube_spark.operators.similarity import (
        cluster_prototypes,
        kmeans_cosine,
    )

    km = kmeans_cosine(e, k=8, rounds=2)
    sizes = sorted(r["count"] for r in km.groupBy("cluster").count().collect())
    print(f"k-means (cosine, k=8) cluster sizes: {sizes}")
    proto = cluster_prototypes(e, k=8, rounds=2)
    print(f"prototype/outlier picks: {proto.count()} rows (4 per cluster)")

    spark.stop()


if __name__ == "__main__":
    main()
