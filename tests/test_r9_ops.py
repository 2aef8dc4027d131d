"""Round-9 operators: log-bucket quantile sketch, CUPED A/B readout,
trigram stupid-backoff LM, cross-modal dedup composition."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- sketch

def test_logbucket_sketch_bucket_math(spark):
    """bucket = 16e + (16c >> e) - 16; every value lands in exactly one
    bucket whose [lo, lo + 2^e/16) range contains it."""
    from hiss_cube_spark.operators.quality_checks import logbucket_sketch

    vals = [1, 2, 3, 15, 16, 17, 100, 1000, 65535, 10**9, 3 * 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    out = logbucket_sketch(df, "c").collect()
    assert sum(r["n"] for r in out) == len(vals)
    for v in vals:
        e = v.bit_length() - 1
        bucket = 16 * e + (16 * v >> e) - 16
        lo = ((16 + bucket % 16) << e) >> 4
        assert lo <= v, (v, bucket, lo)
        assert 16 * (v - lo) < (1 << e) or e < 4  # sub-16 values: 1-wide


def test_logbucket_sketch_mergeable(spark):
    """THE sketch law: per-slice sketches summed == whole-data sketch,
    exactly (integer counts, associative merge)."""
    from hiss_cube_spark.operators.quality_checks import logbucket_sketch

    rows = [(i % 977 + 1,) for i in range(5000)]
    df = spark.createDataFrame(rows, "c long")
    whole = {r["bucket"]: r["n"] for r in logbucket_sketch(df, "c").collect()}
    s1 = logbucket_sketch(df.where("c % 3 = 0"), "c")
    s2 = logbucket_sketch(df.where("c % 3 != 0"), "c")
    merged = {
        r["bucket"]: r["n"]
        for r in s1.unionByName(s2)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert merged == whole


def test_logbucket_quantile_report_bound_holds(spark):
    """est ≤ exact < est + 2^e/16 for every percentile — the within_bound
    companion must be True, and the relative error ≤ 1/16."""
    from hiss_cube_spark.operators.quality_checks import (
        logbucket_quantile_report,
    )

    rows = [((i * 37) % 10_000 + 1,) for i in range(20_000)]
    df = spark.createDataFrame(rows, "c long")
    out = logbucket_quantile_report(df, "c").collect()
    assert len(out) == 5
    for r in out:
        assert r["within_bound"] is True, r
        assert r["est"] <= r["exact"]
        assert (r["exact"] - r["est"]) / r["exact"] <= 1 / 16 + 1e-12


# ----------------------------------------------------------------- CUPED

def test_ab_cuped_hand_computed(spark):
    """4 users, 2 per arm, exact hand-replay of the integer formulation."""
    from hiss_cube_spark.operators.experiments import ab_cuped

    # user u: pre event (ts 0) value xu, post event (ts 10) value yu
    data = {0: (10.0, 20.0), 1: (20.0, 30.0), 2: (30.0, 50.0), 3: (40.0, 60.0)}
    rows = []
    for u, (x, y) in data.items():
        rows.append((u, 0, x))
        rows.append((u, 10_000_000, y))
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    out = {r["arm"]: r for r in ab_cuped(df, split_us=5_000_000).collect()}

    xs = {u: int(round(x * 100)) for u, (x, _) in data.items()}
    ys = {u: int(round(y * 100)) for u, (_, y) in data.items()}
    mx = sum(xs.values()) // 4
    my = sum(ys.values()) // 4
    dx = {u: xs[u] - mx for u in xs}
    dy = {u: ys[u] - my for u in ys}
    sxy = sum(dx[u] * dy[u] for u in dx)
    sxx = sum(dx[u] * dx[u] for u in dx)
    theta_q = (sxy * 10**6) // sxx
    adj = {u: 10**6 * dy[u] - theta_q * dx[u] for u in dx}
    arms = {u: (u * 2654435761) % 2 for u in dx}
    for a in (0, 1):
        us = [u for u in arms if arms[u] == a]
        assert out[a]["n_users"] == len(us)
        assert out[a]["theta_q"] == theta_q
        assert out[a]["mean_y_cents"] == sum(ys[u] for u in us) // len(us)
        sa = sum(adj[u] for u in us)
        assert out[a]["mean_adj_q"] == (
            (sa - ((sa % len(us) + len(us)) % len(us))) // len(us)
        )


def test_ab_cuped_variance_reduction(spark):
    """When Y is strongly predicted by X, the adjusted between-user spread
    must shrink — the point of CUPED."""
    from hiss_cube_spark.operators.experiments import ab_cuped

    rows = []
    for u in range(40):
        x = 100.0 + (u % 10) * 50.0          # pre-period spend
        y = 2.0 * x + 5.0 + (u % 3)          # post strongly follows pre
        rows.append((u, 0, x))
        rows.append((u, 10_000_000, y))
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    out = ab_cuped(df, split_us=5_000_000).collect()
    # theta ≈ 2e6 (slope 2 quantized at 1e-6)
    assert all(abs(r["theta_q"] - 2_000_000) < 50_000 for r in out)
    # adjusted means are near zero deviation (1e-6-cents units), raw are not
    assert all(abs(r["mean_adj_q"]) < 10**9 for r in out)


# ------------------------------------------------------------ trigram LM

def test_trigram_lm_backoff_rungs(spark):
    """Each backoff rung hand-checked: seen trigram → c123/c12; unseen
    trigram but seen (w2,w3) → 0.4·c23/c2; unseen both but seen w3 →
    0.16·c3/N; totally unseen → 0."""
    from hiss_cube_spark.operators.text_analysis import trigram_lm_score

    # train doc (id 0): "a b c a b c" → trigrams: abc, bca, cab, abc
    # scored docs exercise each rung with a single trigram each
    docs = [
        (0, "a b c a b c"),
        (1, "a b c"),    # seen trigram: c123(abc)=2, c12(ab)=2 → 1.0
        (2, "x b c"),    # (b,c) seen via abc: 0.4 * c23(bc)=2 / c2(b)=2 → 0.4
        (3, "x y c"),    # only w3=c seen: 0.16 * c3(c)=2 / N=4 → 0.08
        (4, "x y q"),    # q never trigram-final → 0.0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in trigram_lm_score(
            df, train_pred=F.col("doc_id") == 0
        ).collect()
    }
    assert out[1]["lm3_score"] == pytest.approx(1.0)
    assert out[2]["lm3_score"] == pytest.approx(round(0.4 * 2 / 2, 6))
    assert out[3]["lm3_score"] == pytest.approx(round(0.4 * 0.4 * 2 / 4, 6))
    assert out[4]["lm3_score"] == 0.0
    # train doc scores itself: (1.0 [abc] + bca 1/1 + cab 1/1 + abc 1.0)/4
    assert out[0]["n_trigrams"] == 4
    assert out[0]["lm3_score"] == pytest.approx(1.0)


# ------------------------------------------------------------- count-min

def test_cm_sketch_mergeable_and_overestimates(spark):
    from hiss_cube_spark.operators.quality_checks import (
        cm_heavy_hitters_report,
        cm_sketch,
    )

    rows = [(i % 37,) for i in range(3000)] + [(999,)] * 500
    df = spark.createDataFrame(rows, "k long")
    # merge law: per-slice sketches summed == whole sketch (linear)
    whole = {(r["row"], r["bucket"]): r["n"]
             for r in cm_sketch(df, "k").collect()}
    s1 = cm_sketch(df.where("k % 2 = 0"), "k")
    s2 = cm_sketch(df.where("k % 2 != 0"), "k")
    merged = {(r["row"], r["bucket"]): r["n"]
              for r in s1.unionByName(s2).groupBy("row", "bucket")
              .agg(F.sum("n").alias("n")).collect()}
    assert merged == whole
    # report: the planted heavy hitter leads, estimates never underestimate
    rep = {r["key"]: r for r in
           cm_heavy_hitters_report(df, "k", top_k=5).collect()}
    assert rep[999]["exact_n"] == 500
    assert all(r["overestimates"] for r in rep.values())
    assert all(r["cm_n"] >= r["exact_n"] for r in rep.values())


# --------------------------------------------------------- streaming sketch

def test_stream_quantile_sketch_equals_batch_sketch(spark, tmp_path_factory):
    """The streamed cumulative sketch after two micro-batches equals the
    batch sketch over all data BIT-FOR-BIT (the mergeable-sketch law in
    streaming form), and quantile estimates read identically off both."""
    from hiss_cube_spark.operators.quality_checks import (
        logbucket_estimate,
        logbucket_sketch,
    )
    from hiss_cube_spark.streaming.sketch import stream_quantile_sketch

    src = str(tmp_path_factory.mktemp("sk_src"))
    out = str(tmp_path_factory.mktemp("sk_out"))
    ckpt = str(tmp_path_factory.mktemp("sk_ckpt"))

    b1 = [(int(v),) for v in range(1, 2001)]
    b2 = [((v * 37) % 9000 + 100,) for v in range(3000)]
    spark.createDataFrame(b1, "v long").coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2, "v long").coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema("v long") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_quantile_sketch(stream, out, ckpt)
    q.awaitTermination(180)

    streamed = {r["bucket"]: r["n"]
                for r in spark.read.parquet(f"{out}/latest").collect()}
    whole = spark.createDataFrame(b1 + b2, "v long")
    batch = {r["bucket"]: r["n"]
             for r in logbucket_sketch(whole, "v").collect()}
    assert streamed == batch

    est_s = {r["pct"]: r["est"] for r in logbucket_estimate(
        spark.read.parquet(f"{out}/latest")).collect()}
    est_b = {r["pct"]: r["est"] for r in logbucket_estimate(
        logbucket_sketch(whole, "v")).collect()}
    assert est_s == est_b and set(est_s) == {25, 50, 75, 90, 99}

    # replay over the same checkpoint: snapshot unchanged
    q2 = stream_quantile_sketch(
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 1).parquet(src),
        out, ckpt,
    )
    q2.awaitTermination(180)
    again = {r["bucket"]: r["n"]
             for r in spark.read.parquet(f"{out}/latest").collect()}
    assert again == batch


def test_ab_cuped_zero_variance_guard(spark):
    """All users with identical pre-period X: theta is undefined — the
    operator must define it as 0 (no adjustment), not divide by zero
    (which ANSI mode turns into a hard error)."""
    from hiss_cube_spark.operators.experiments import ab_cuped

    rows = []
    for u in range(6):
        rows.append((u, 0, 50.0))                 # identical X
        rows.append((u, 10_000_000, 10.0 * (u + 1)))
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = ab_cuped(df, split_us=5_000_000).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    assert all(r["theta_q"] == 0 for r in out)
    # with theta 0, adjusted mean is just the centered-Y floor-mean * 1e6
    assert {r["arm"] for r in out} == {0, 1}


def test_cm_sketch_negative_and_huge_keys(spark):
    """pmod keeps buckets in range for the whole BIGINT key domain —
    including negatives and keys past the r9 overflow point (8.4e9)."""
    from hiss_cube_spark.operators.quality_checks import (
        cm_heavy_hitters_report,
        cm_sketch,
    )

    keys = [-5, -2**40, 2**62, 9_000_000_000, 3]
    rows = [(k,) for k in keys for _ in range(10)]
    df = spark.createDataFrame(rows, "k long")
    cells = cm_sketch(df, "k").collect()
    assert all(0 <= r["bucket"] < 512 and 0 <= r["row"] < 4 for r in cells)
    assert sum(r["n"] for r in cells) == 4 * len(rows)
    rep = {r["key"]: r for r in cm_heavy_hitters_report(df, "k", 5).collect()}
    assert set(rep) == set(keys)
    assert all(r["cm_n"] >= r["exact_n"] == 10 for r in rep.values())


def test_logbucket_grouped_quantiles_per_key_bound(spark):
    from hiss_cube_spark.operators.quality_checks import (
        logbucket_grouped_quantiles,
    )

    rows = [("a", v) for v in range(1, 1001)]
    rows += [("b", v * 100) for v in range(1, 501)]
    df = spark.createDataFrame(rows, "g string, c long")
    out = {(r["g"], r["pct"]): r["est"]
           for r in logbucket_grouped_quantiles(df, "g", "c", (50, 99)).collect()}
    import math
    for g, vals in (("a", list(range(1, 1001))), ("b", [v * 100 for v in range(1, 501)])):
        vals.sort()
        for pct in (50, 99):
            exact = vals[math.ceil(pct * len(vals) / 100) - 1]
            est = out[(g, pct)]
            assert est <= exact and (exact - est) / exact <= 1 / 16 + 1e-12


def test_logbucket_sketch_weighted(spark):
    """Weighted sketch: n = Σ weight per bucket; quantiles answer the
    weight-percentile question (a heavy value dominates)."""
    from hiss_cube_spark.operators.quality_checks import (
        logbucket_estimate,
        logbucket_sketch,
    )

    # value 100 carries 90% of the weight; value 10000 the rest
    df = spark.createDataFrame(
        [(100, 900), (10_000, 100)], "c long, w long"
    )
    sk = {r["bucket"]: r["n"]
          for r in logbucket_sketch(df, "c", weight_col="w").collect()}
    assert sum(sk.values()) == 1000
    est = {r["pct"]: r["est"]
           for r in logbucket_estimate(
               logbucket_sketch(df, "c", weight_col="w")).collect()}
    # p50 of WEIGHT sits in value-100's bucket; p99 in value-10000's
    assert est[50] <= 100 and 16 * (100 - est[50]) < (1 << 6)
    assert est[99] <= 10_000 and 10_000 < 2 * est[99] + (1 << 13)
