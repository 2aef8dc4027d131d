"""applyInPandasWithState custom stateful operator + IVF ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_stateful_running_totals_streaming(spark, tmp_path_factory):
    from hiss_cube_spark.streaming.stateful import running_totals

    src = str(tmp_path_factory.mktemp("st_src"))
    ckpt = str(tmp_path_factory.mktemp("st_ckpt"))
    schema = "user_id long, value double, ts_us long"
    # two separate files → with maxFilesPerTrigger=1 the query runs two
    # micro-batches, so the totals must FOLD ACROSS batch boundaries
    spark.createDataFrame(
        [(1, 10.0, 100), (1, 20.0, 200), (2, 5.0, 150)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame([(1, 30.0, 300)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM running_totals").collect()
    # update mode re-emits a key per batch; the final (max n_events) row per
    # key carries the accumulated state
    final = {}
    for r in emitted:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
            final[r["user_id"]] = r
    assert final[1]["n_events"] == 3
    assert final[1]["sum_value"] == pytest.approx(60.0)
    assert final[1]["last_ts_us"] == 300
    assert final[2]["n_events"] == 1
    # state genuinely crossed batches: user 1 was emitted more than once
    assert sum(1 for r in emitted if r["user_id"] == 1) >= 2


def test_ivf_topk_recall(spark, sf_dir):
    from hiss_cube_spark.operators.similarity import cosine_topk, ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(q, e, k=3).collect()
    }
    approx = ivf_topk(q, e, k=3, n_cells=8, n_probe=4)
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(got) == 5 * 3  # every query answered with k results
    # recall against exact top-3 (random embeddings + 4/8 probes: expect most)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.4, recall


def test_pq_topk_recall_and_compression_shape(spark, sf_dir):
    from hiss_cube_spark.operators.similarity import cosine_topk, pq_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(q, e, k=3).collect()
    }
    approx = pq_topk(q, e, k=3, m=16, n_centroids=64, rerank_factor=4)
    rows = approx.collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(got) == 5 * 3  # every query answered with k results
    # exact rerank over 4x candidates: expect high overlap with true top-3
    # (measured 0.93 at these settings on the sf0.001 vectors)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall
    # reranked scores are true cosines: bounded and descending per query
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
        assert -1.0001 <= r["cosine"] <= 1.0001
    for ranked in by_q.values():
        ranked.sort()
        assert all(a[1] >= b[1] for a, b in zip(ranked, ranked[1:]))


def test_streaming_topk_folds_across_microbatches(spark, tmp_path_factory):
    from hiss_cube_spark.streaming.stateful import streaming_topk

    src = str(tmp_path_factory.mktemp("tk_src"))
    ckpt = str(tmp_path_factory.mktemp("tk_ckpt"))
    schema = "user_id long, event_id long, value double"
    # batch 1: user 1 has scores 50, 10, 30
    spark.createDataFrame(
        [(1, 100, 50.0), (1, 101, 10.0), (1, 102, 30.0), (2, 200, 1.0)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2: a 40 displaces the 10; a 5 changes nothing
    spark.createDataFrame([(1, 103, 40.0), (1, 104, 5.0)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_topk(stream, k=2)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_topk")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM stream_topk").collect()
    # the LAST emission for user 1 must be the cross-batch top-2: 50, 40
    per_user1 = [
        (r["rank"], r["oid"], r["v"]) for r in emitted if r["key"] == 1
    ]
    assert (1, 100, 50.0) in per_user1 and (2, 103, 40.0) in per_user1
    # batch-1 state (50, 30) was emitted too — proves two emissions folded
    assert (2, 102, 30.0) in per_user1
    assert [(r["rank"], r["oid"]) for r in emitted if r["key"] == 2] == [(1, 200)]


def test_ivf_pq_topk_recall_and_cell_pruning(spark, sf_dir):
    """The combined IVF-PQ index: every query answered with k exact-cosine
    reranked rows; recall vs the exact top-k stays useful at 4/8 probes
    (both prunings stacked); probing ALL cells with a generous rerank
    recovers near-full recall (the pruning, not the math, costs recall)."""
    from hiss_cube_spark.operators.similarity import cosine_topk, ivf_pq_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(q, e, k=3).collect()}

    approx = ivf_pq_topk(q, e, k=3, n_cells=8, n_probe=4, m=16, n_centroids=32)
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(got) == 5 * 3
    assert len(got & exact) / len(exact) >= 0.4

    full = ivf_pq_topk(
        q, e, k=3, n_cells=4, n_probe=4, m=16, n_centroids=64, rerank_factor=16
    )
    got_full = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert len(got_full & exact) / len(exact) >= 0.8


def test_streaming_ewma_folds_across_microbatches(spark, tmp_path_factory):
    from hiss_cube_spark.streaming.stateful import streaming_ewma

    src = str(tmp_path_factory.mktemp("ew_src"))
    ckpt = str(tmp_path_factory.mktemp("ew_ckpt"))
    schema = "user_id long, event_id long, value double, ts_us long"
    # batch 1: 4 → 8 gives ewma 6; batch 2: 2 → (2+6)/2 = 4, then a LATE
    # row (ts 150 < last 300) that must be counted, not folded
    spark.createDataFrame(
        [(1, 1, 4.0, 100), (1, 2, 8.0, 200)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(1, 3, 2.0, 300), (1, 4, 99.0, 150)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_ewma(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_ewma")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM stream_ewma ORDER BY n_seen").collect()
    assert [r["ewma"] for r in emitted] == [6.0, 4.0]  # folded across batches
    assert emitted[-1]["n_late"] == 1
    assert emitted[-1]["last_ts_us"] == 300


def test_semantic_dedup_drops_planted_neardups(spark):
    import numpy as np

    from hiss_cube_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # a planted near-dup of every even vector: tiny perturbation
        if i % 2 == 0:
            w = v + rng.standard_normal(16).astype("float32") * 0.01
            rows.append((100 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = {r["vec_id"] for r in semantic_dedup(df, threshold=0.95, n_cells=4).collect()}
    # every planted dup loses to its (smaller-id) original; some may survive
    # only if the kmeans boundary split the pair — allow at most 2 strays
    survivors = [i for i in kept if i >= 100]
    assert len(survivors) <= 2, survivors
    assert set(range(20)) <= kept  # originals all keep (min id per cluster)


def test_hard_negatives_excludes_same_label(spark):
    from hiss_cube_spark.operators.similarity import cosine_topk, hard_negatives

    # two tight clusters per label: nearest overall neighbor shares the
    # label, so hard_negatives must skip it and surface the cross-label one
    rows = [
        (0, "a", [1.0, 0.0, 0.0]),
        (1, "a", [0.99, 0.01, 0.0]),   # same-label near-dup of 0
        (2, "b", [0.9, 0.1, 0.0]),     # closest cross-label vector to 0
        (3, "b", [0.0, 1.0, 0.0]),
        (4, "c", [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    q = df.where(F.col("vec_id") == 0)
    out = hard_negatives(q, df, k=2).collect()
    assert [r["neighbor_id"] for r in out] == [2, 3]
    assert all(r["neg_label"] != "a" for r in out)
    # sanity: plain cosine_topk would have ranked the same-label vec 1 first
    plain = cosine_topk(q, df.where(F.col("vec_id") != 0), k=1).collect()
    assert plain[0]["neighbor_id"] == 1


def test_sq_quantize_bounds_and_topk_finds_planted_neighbor(spark):
    import numpy as np

    from hiss_cube_spark.operators.similarity import sq_quantize, sq_topk

    rng = np.random.default_rng(11)
    dim = 16
    base = rng.standard_normal((30, dim)).astype("float32")
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # planted near-copy of vector 0 → its quantized dot with 0 should win
    rows.append((99, [float(x * 0.999) for x in base[0]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    coded = sq_quantize(df, dim).collect()
    for r in coded:
        assert len(r["code"]) == dim
        assert all(-127 <= c <= 127 for c in r["code"])
    # the max-|v| element attains an endpoint of the symmetric grid
    flat = [c for r in coded for c in r["code"]]
    assert min(flat) == -127 or max(flat) == 127

    out = sq_topk(df.where(F.col("vec_id") == 0), df, k=3, dim=dim).collect()
    assert out[0]["neighbor_id"] == 99
    assert out[0]["rank"] == 1
    assert out[0]["dot_q"] > 0


def test_random_projection_preserves_relative_distance(spark):
    import numpy as np

    from hiss_cube_spark.operators.similarity import random_projection

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 64)).astype("float32")
    base[1] = base[0] + rng.standard_normal(64).astype("float32") * 0.01  # near-dup pair
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(base)],
        "vec_id long, embedding array<float>",
    )
    rows = random_projection(df, out_dim=16, in_dim=64).collect()
    proj = {r["vec_id"]: np.array(r["proj_q"], dtype=np.float64) / 1e6 for r in rows}
    assert all(len(v) == 16 for v in proj.values())
    # JL contract (loose): the planted near-dup stays each other's nearest
    d01 = np.linalg.norm(proj[0] - proj[1])
    others = [np.linalg.norm(proj[0] - proj[k]) for k in proj if k not in (0, 1)]
    assert d01 < min(others), (d01, min(others))
    # deterministic: same input -> identical integer projections
    again = {r["vec_id"]: list(r["proj_q"]) for r in random_projection(df, 16, 64).collect()}
    r2 = {r["vec_id"]: list(r["proj_q"]) for r in random_projection(df, 16, 64).collect()}
    assert again == r2


def test_whiten_produces_identity_covariance(spark):
    import numpy as np

    from hiss_cube_spark.operators.similarity import whiten

    rng = np.random.default_rng(5)
    dim = 8
    # strongly anisotropic: correlated dims with very different variances
    a = rng.standard_normal((400, dim)) * np.array([10, 5, 2, 1, 1, 0.5, 0.2, 0.1])
    a[:, 1] += 0.8 * a[:, 0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(a)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    out = whiten(df, dim=dim).collect()
    m = np.asarray([r["whitened"] for r in sorted(out, key=lambda r: r["vec_id"])])
    cov = np.cov(m, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(dim), atol=0.05), np.abs(cov - np.eye(dim)).max()
    assert np.allclose(m.mean(axis=0), 0, atol=0.01)
