"""Round-10 operator tests: anchor-envelope DTW banding, its caps, and
the high-bit A/B arm hash."""

from __future__ import annotations

from pyspark.sql import functions as F


def _shape_cluster_series(spark, n=40, n_clusters=4):
    """Series whose LB_Kim aggregates (first/last/max/min) are IDENTICAL
    for every key — pos 1 = +1e9, pos 16 = -1e9 — while positions 4..13
    carry a per-cluster shift of 4x the threshold plus ±15-unit jitter.
    Only per-position signatures can tell the clusters apart."""
    rows = []
    for k in range(n):
        c = k % n_clusters
        v = []
        for pos in range(1, 17):
            if pos == 1:
                val = 10**9
            elif pos == 16:
                val = -(10**9)
            else:
                val = 100_000 + (c * 120_000 if 4 <= pos <= 13 else 0)
                val += ((k * 2_654_435_761 + pos * 40_503) % 3_000) - 1_500
            v.append(val)
        rows.append((k, v))
    return spark.createDataFrame(rows, "key long, v array<bigint>")


def test_anchor_banding_containment_and_pruning(spark):
    from hiss_cube_spark.operators.timeseries import dtw_banded_pairs

    n, C, thr = 40, 4, 30_000
    df = _shape_cluster_series(spark, n, C)

    base = dtw_banded_pairs(df, thr)
    anc = dtw_banded_pairs(df, thr, radius=2, anchors=(6, 11))
    n_base, got = base.count(), {(r.key_a, r.key_b) for r in anc.collect()}

    # LB_Kim alone prunes NOTHING here (all aggregates identical)
    assert n_base == n * (n - 1) // 2
    # anchors separate the shape clusters: strictly fewer candidates ...
    assert len(got) < n_base
    # ... zero cross-cluster survivors (shift covers both dilated
    # windows, 4x threshold apart) ...
    assert not [p for p in got if p[0] % C != p[1] % C]
    # ... and CONTAINMENT: every within-cluster pair survives
    want = {
        (a, b) for a in range(n) for b in range(a + 1, n) if a % C == b % C
    }
    assert want <= got


def test_anchor_banding_true_pair_parity(spark):
    """End-to-end: banded + anchored miner returns EXACTLY the
    brute-force threshold-true pairs (containment theorem)."""
    from hiss_cube_spark.operators.timeseries import (
        dtw_banded_pairs,
        dtw_distance,
    )

    thr = 30_000
    df = _shape_cluster_series(spark, 24, 3)
    series = df.select("key", "v")

    def run(pair_source):
        e = df.select(
            "key", F.posexplode("v").alias("pos", "cents")
        ).select(
            F.col("key").alias("user_id"),
            ((F.col("pos") + 1) * 3_600_000_000).alias("ts_us"),
            (F.col("cents") / 100.0).alias("value"),
        )
        return dtw_distance(
            e, n=16, radius=2, pair_source=pair_source
        ).where(F.col("dtw_q") <= thr)

    brute = run(
        lambda s: s.alias("x")
        .select(F.col("key").alias("key_a"))
        .crossJoin(s.select(F.col("key").alias("key_b")))
        .where(F.col("key_a") < F.col("key_b"))
    )
    banded = run(
        lambda s: dtw_banded_pairs(s, thr, radius=2, anchors=(6, 11))
    )
    assert sorted(map(tuple, brute.collect())) == sorted(
        map(tuple, banded.collect())
    )


def test_banding_caps_deterministic(spark):
    from hiss_cube_spark.operators.timeseries import dtw_banded_pairs

    thr = 30_000
    df = _shape_cluster_series(spark, 40, 4)
    mp = dtw_banded_pairs(df, thr, radius=2, anchors=(6, 11), max_pairs=7)
    got1 = sorted(map(tuple, mp.collect()))
    got2 = sorted(map(tuple, mp.collect()))
    assert len(got1) == 7 and got1 == got2
    # max_pairs keeps the lexicographically smallest pairs
    full = sorted(
        map(
            tuple,
            dtw_banded_pairs(
                df, thr, radius=2, anchors=(6, 11)
            ).collect(),
        )
    )
    assert got1 == full[:7]

    mb = dtw_banded_pairs(df, thr, radius=2, anchors=(6, 11), max_bucket=3)
    got_mb = {tuple(r) for r in mb.collect()}
    full_set = set(map(tuple, full))
    # per-bucket cap yields a SUBSET of the uncapped candidates, and
    # every kept pair's build key is among that bucket's 3 lowest — we
    # check the subset property plus determinism
    assert got_mb <= full_set
    assert got_mb == {tuple(r) for r in mb.collect()}


def test_anchors_require_radius(spark):
    import pytest

    from hiss_cube_spark.operators.timeseries import dtw_banded_pairs

    df = _shape_cluster_series(spark, 6, 2)
    with pytest.raises(ValueError):
        dtw_banded_pairs(df, 1000, anchors=(6,))


def test_ab_cuped_arm_hash_mixes_parity(spark):
    """The r10 arm hash (bit 31 of u·odd) must NOT degenerate to user
    parity: an all-even id population has to land in both arms."""
    from hiss_cube_spark.operators.experiments import ab_cuped

    rows = []
    for u in range(0, 400, 2):  # even ids only — parity-structured
        rows.append((u, 1_000_000, 10.0))
        rows.append((u, 3_000_000, 12.0))
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    out = ab_cuped(df, split_us=2_000_000).collect()
    arms = {r.arm: r.n_users for r in out}
    assert set(arms) == {0, 1}
    # roughly balanced (multiplicative high-bit mixing): no arm < 25%
    assert min(arms.values()) >= 50


# ---------------------------------------------------------------- sketches


def _skewed_tokens(spark, n=4000):
    """Deterministic Zipf-ish key stream: key j appears ~n/2^j times."""
    rows = []
    i = 0
    while i < n:
        j = 0
        x = i
        while x % 2 == 1 and j < 10:
            j += 1
            x //= 2
        rows.append((i, f"key{j}"))
        i += 1
    return spark.createDataFrame(rows, "rid long, k string")


def test_kmv_merge_law(spark):
    """Bottom-k sketch mergeability is a THEOREM: the k smallest hashes
    of A ∪ B are contained in (k smallest of A) ∪ (k smallest of B), so
    merging samples == rebuilding from scratch."""
    from hiss_cube_spark.operators.quality_checks import kmv_samples

    rows = [(f"g{i % 2}", f"item{i}") for i in range(700)] + [
        ("g0", f"shared{i}") for i in range(150)
    ] + [("g1", f"shared{i}") for i in range(150)]
    df = spark.createDataFrame(rows, "g string, key string")
    k = 64

    per = kmv_samples(df, "g", "key", k=k).collect()
    whole = kmv_samples(
        df.withColumn("g", F.lit("all")), "g", "key", k=k
    ).collect()

    # driver-side merge of the two samples (k smallest of the union)
    hs = sorted({r.h for r in per})[:k]
    want = sorted(r.h for r in whole)
    assert hs == want
    # merged theta = k-th smallest of the union (both groups were in
    # estimation mode here)
    assert max(hs) == max(r.theta for r in whole if r.theta)


def test_kmv_exact_mode_small_group(spark):
    from hiss_cube_spark.operators.quality_checks import _KMV_U, kmv_samples

    rows = [("tiny", f"x{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "g string, key string")
    out = kmv_samples(df, "g", "key", k=64).collect()
    assert len(out) == 10
    assert all(r.theta == _KMV_U and r.nd == 10 for r in out)


def test_spacesaving_guarantees_any_partitioning(spark):
    """The three report booleans are theorems for ANY partitioning: run
    the same data through 1, 3 and 11 partitions and assert the report
    is IDENTICAL (deterministic heavy-key set + all-true booleans)."""
    from hiss_cube_spark.operators.quality_checks import spacesaving_report

    df = _skewed_tokens(spark)
    outs = []
    for p in (1, 3, 11):
        rep = spacesaving_report(df.repartition(p, "rid"), "k", k=4)
        outs.append(sorted(map(tuple, rep.collect())))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) >= 1
    for key, exact_n, found, over, within in outs[0]:
        assert found and over and within


def test_spacesaving_merge_is_overestimate(spark):
    """Merged est ≥ exact for EVERY candidate (not only heavy ones) and
    the discovery threshold keeps every truly-heavy key."""
    from hiss_cube_spark.operators.quality_checks import (
        spacesaving_merge,
        spacesaving_summaries,
    )

    df = _skewed_tokens(spark).repartition(5, "rid")
    k = 4
    cand = {
        r.k: r.est
        for r in spacesaving_merge(
            spacesaving_summaries(df, "k", k=k), k=k
        ).collect()
    }
    exact = {r.k: r.n for r in df.groupBy("k").count()
             .withColumnRenamed("count", "n").collect()}
    n_total = sum(exact.values())
    for key, est in cand.items():
        assert est >= exact.get(key, 0)
    for key, n in exact.items():
        if n > n_total // k:
            assert key in cand


def test_streaming_spacesaving(spark, tmp_path_factory):
    """Streaming SpaceSaving: counters persist across micro-batch runs
    (checkpointed state), guarantees hold over the TOTAL stream seen."""
    import os as _os

    from hiss_cube_spark.streaming.stateful import streaming_spacesaving
    from hiss_cube_spark.streaming.windows import stream_from_directory

    src = str(tmp_path_factory.mktemp("ss_src"))
    ckpt = str(tmp_path_factory.mktemp("ss_ckpt"))
    snap = str(tmp_path_factory.mktemp("ss_snap"))

    def _stage(rows):
        spark.createDataFrame(rows, "rid long, k string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def _run():
        stream = stream_from_directory(
            spark, src, spark.read.parquet(src).schema
        )
        agg = streaming_spacesaving(stream, key_col="k", k=4, shards=2)

        def _emit(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                _os.path.join(snap, "latest")
            )

        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(_emit)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.key: (r.est, r.n_shard)
            for r in spark.read.parquet(
                _os.path.join(snap, "latest")
            ).collect()
        }

    batch1 = [(i, f"key{i % 7}") for i in range(70)] + [
        (1000 + i, "hot") for i in range(40)
    ]
    _stage(batch1)
    first = _run()
    assert "hot" in first and first["hot"][0] >= 40

    # run 2: more of the hot key + new noise; state carries over
    batch2 = [(2000 + i, "hot") for i in range(30)] + [
        (3000 + i, f"noise{i % 5}") for i in range(20)
    ]
    _stage(batch2)
    second = _run()
    exact = {}
    for _, key in batch1 + batch2:
        exact[key] = exact.get(key, 0) + 1
    n_total = sum(exact.values())
    # overestimate + discovery for the global heavy key
    assert second["hot"][0] >= exact["hot"]
    assert second["hot"][0] - exact["hot"] <= n_total // 4


def test_kmv_distinct_count_modes(spark):
    """Exact mode returns the true distinct count; estimation mode on a
    5k-distinct group lands within the k=256 error regime (~1/sqrt(k))."""
    from hiss_cube_spark.operators.quality_checks import kmv_distinct_count

    rows = [("big", f"item{i}") for i in range(5000)] + [
        ("small", f"s{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, key string")
    out = {r.g: r.est_distinct for r in
           kmv_distinct_count(df, "g", "key", k=256).collect()}
    assert out["small"] == 40
    assert abs(out["big"] - 5000) / 5000 < 0.25


def test_k_anonymity_ladder_levels(spark):
    """Ladder picks the SMALLEST level whose group reaches k; l-diversity
    is evaluated at the chosen level."""
    from hiss_cube_spark.operators.privacy import k_anonymity_ladder

    rows = (
        # (a=1, b='x'): 5 rows, sensitive homogeneous -> level 0, l_div 1
        [(i, 1, "x", 0) for i in range(5)]
        # (a=1, b='y'): 2 rows -> generalizes to a=1 (n=7), mixed sens
        + [(10, 1, "y", 0), (11, 1, "y", 1)]
        # (a=2, b='x'): 1 row -> a=2 has n=1 -> global (n=8)
        + [(20, 2, "x", 1)]
    )
    df = spark.createDataFrame(rows, "id long, a long, b string, s int")
    out = {
        r.id: (r.anon_level, r.group_n, r.l_div, r.l_ok)
        for r in k_anonymity_ladder(df, ["a", "b"], "s", k=4, l=2).collect()
    }
    assert len(out) == 8
    assert out[0] == (0, 5, 1, False)  # big cell, but sens-homogeneous
    assert out[10] == (1, 7, 2, True)  # small cell -> level 1 group
    assert out[11] == (1, 7, 2, True)
    assert out[20] == (2, 8, 2, True)  # nothing below global reaches k


def test_ab_srm_detects_biased_assignment(spark):
    """A segment missing one arm's users entirely must flag SRM; a
    balanced segment must not."""
    from hiss_cube_spark.operators.experiments import ab_srm

    arm = lambda u: ((u * 2654435761) >> 31) & 1
    users = list(range(1, 201))
    rows = [(u, "ok") for u in users] + [
        (u, "biased") for u in users if arm(u) == 0
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r.segment: r for r in ab_srm(df).collect()}
    n0 = sum(1 for u in users if arm(u) == 0)
    assert (out["ok"].n_a, out["ok"].n_b) == (n0, 200 - n0)
    assert not out["ok"].srm
    assert out["biased"].n_b == 0 and out["biased"].srm
    # chi2_q for the one-armed segment is exactly n_a * 1e6
    assert out["biased"].chi2_q == n0 * 1_000_000


def test_golden_record_survivorship(spark):
    """Canonical = longest member (tie -> min id); categorical fields fuse
    by mode with lexicographic tie-break; singletons are not emitted."""
    from hiss_cube_spark.operators.clusters import golden_records

    docs = spark.createDataFrame(
        [
            (1, "en", "cc", 100),
            (2, "en", "wiki", 300),
            (3, "de", "wiki", 300),   # ties 2 on length -> min id wins
            (9, "fr", "books", 50),   # singleton: no pair, not emitted
        ],
        "doc_id long, lang string, source string, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    out = golden_records(
        docs, pairs, canon_col="n_chars",
        mode_cols=("lang", "source"), max_cols=("n_chars",),
    ).collect()
    assert len(out) == 1
    g = out[0]
    assert g.cluster_id == 1 and g.canonical_doc_id == 2
    assert g.lang == "en"            # 2-1 majority
    assert g.source == "wiki"        # 2-1 majority
    assert g.max_n_chars == 300 and g.n_members == 3


def test_bounded_contribution_clips_both_axes(spark):
    from hiss_cube_spark.operators.privacy import bounded_contribution

    rows = (
        [(1, "g", 10.0)] * 6        # user 1: 6 events (count-clipped), $60
        + [(2, "g", 400.0)] * 2     # user 2: 2 events, $800 (value-clipped)
        + [(3, "g", -700.0)]        # user 3: negative, clipped at -$500
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    r = bounded_contribution(
        df, "user_id", "event_type", count_cap=4,
        value_col="value", value_cap_cents=50_000,
    ).collect()[0]
    assert (r.raw_count, r.clipped_count) == (9, 7)       # 6->4, 2, 1
    assert (r.n_users, r.n_count_clipped) == (3, 1)
    assert r.raw_cents == 6_000 + 80_000 - 70_000
    assert r.clipped_cents == 6_000 + 50_000 - 50_000
    assert r.n_value_clipped == 2
    assert (r.count_sensitivity, r.value_sensitivity) == (4, 50_000)


def test_label_propagation_finer_than_cc(spark):
    """Barbell graph (two triangles + one bridge): connected components
    merge everything; 2-round synchronous LPA keeps the far triangle out
    of the near one's community. Exact labels pin determinism."""
    from hiss_cube_spark.operators.clusters import connected_components
    from hiss_cube_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "doc_a long, doc_b long",
    )
    cc = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert set(cc.values()) == {1}
    lp = {
        r.node: r.community
        for r in label_propagation(
            pairs, src_col="doc_a", dst_col="doc_b"
        ).collect()
    }
    # near triangle resolves to community 1; the far one never joins it
    assert lp[1] == lp[2] == lp[3] == 1
    assert lp[4] != 1 and lp[5] != 1 and lp[6] != 1


def test_k_anonymity_ladder_random_vs_bruteforce(spark):
    """Seeded random tables vs a pandas brute-force reference: level
    choice, group size and l-diversity must match on every record."""
    import random

    from hiss_cube_spark.operators.privacy import k_anonymity_ladder

    for seed in (7, 99, 2026):
        rng = random.Random(seed)
        rows = [
            (i, rng.randrange(3), "ab"[rng.randrange(2)], rng.randrange(4),
             rng.randrange(2))
            for i in range(60)
        ]
        k = rng.choice((2, 5, 9))
        df = spark.createDataFrame(
            rows, "id long, h1 long, h2 string, h3 long, s int"
        )
        got = {
            r.id: (r.anon_level, r.group_n, r.l_div)
            for r in k_anonymity_ladder(
                df, ["h1", "h2", "h3"], "s", k=k, l=2
            ).collect()
        }
        # brute force: group sizes / distinct-sensitive at each level
        for rid, h1, h2, h3, s in rows:
            keys = [(h1, h2, h3), (h1, h2), (h1,), ()]
            for lvl, key in enumerate(keys):
                grp = [r for r in rows if tuple(r[1:1 + len(key)]) == key]
                if len(grp) >= k or lvl == 3:
                    want = (lvl, len(grp), len({r[4] for r in grp}))
                    break
            assert got[rid] == want, (seed, rid, got[rid], want)


def test_golden_records_random_vs_bruteforce(spark):
    """Seeded random graphs + tables vs a union-find + python fusion
    reference."""
    import random

    from hiss_cube_spark.operators.clusters import golden_records

    for seed in (3, 41):
        rng = random.Random(seed)
        n = 30
        docs = [
            (i, "abcd"[rng.randrange(4)], f"s{rng.randrange(3)}",
             rng.randrange(1, 500))
            for i in range(n)
        ]
        pairs = sorted(
            {(min(a, b), max(a, b))
             for a, b in ((rng.randrange(n), rng.randrange(n))
                          for _ in range(20)) if a != b}
        )
        df = spark.createDataFrame(
            docs, "doc_id long, lang string, source string, n_chars long"
        )
        pf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {
            r.cluster_id: (r.canonical_doc_id, r.lang, r.source,
                           r.max_n_chars, r.n_members)
            for r in golden_records(
                df, pf, canon_col="n_chars",
                mode_cols=("lang", "source"), max_cols=("n_chars",),
            ).collect()
        }
        # union-find reference
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps = {}
        for node in {x for p in pairs for x in p}:
            comps.setdefault(find(node), []).append(node)
        want = {}
        for members in comps.values():
            cid = min(members)
            rows = [docs[m] for m in members]
            canon = min(rows, key=lambda r: (-r[3], r[0]))[0]

            def mode(idx):
                vals = [r[idx] for r in rows]
                return min(set(vals), key=lambda v: (-vals.count(v), v))

            want[cid] = (canon, mode(1), mode(2),
                         max(r[3] for r in rows), len(rows))
        assert got == want, seed


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """Same-bucketed external tables join with ZERO Exchange in the plan
    (the pay-once-shuffle warehouse layout); a plain parquet merge join
    of the same data shuffles both sides. Values identical."""
    from hiss_cube_spark.plans.bucketing import (
        colocated_join,
        join_exchange_count,
        write_bucketed,
    )

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(
        li, "t_li_b", str(tmp_path / "li"), ["l_orderkey"], n_buckets=8
    )
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_o_b", str(tmp_path / "o"), ["l_orderkey"], n_buckets=8,
    )
    try:
        b = colocated_join(spark, "t_li_b", "t_o_b", ["l_orderkey"])
        plain = li.hint("merge").join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        )
        assert join_exchange_count(b) == 0
        assert join_exchange_count(plain) >= 2  # both sides shuffle
        got = sorted(map(tuple, b.collect()))
        want = sorted(map(tuple, plain.collect()))
        assert got == want and len(got) > 0
        # bucket pruning: a key-equality scan touches 1 bucket of 8.
        # autoBucketedScan must be off — with it on, the planner replaces
        # the bucketed scan with a plain one for join-free queries, and
        # pruning silently disappears (documented in plans/bucketing.py).
        import contextlib
        import io

        k = got[0][0]
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        try:
            pruned = spark.table("t_li_b").where(F.col("l_orderkey") == k)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                pruned.explain(mode="formatted")
            assert "SelectedBucketsCount: 1 out of 8" in buf.getvalue()
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_spacesaving_null_keys_excluded_consistently(spark):
    """NULL keys are excluded from BOTH the sketch pass and the exact
    companion, so the theorem booleans stay true even when nulls
    dominate the column (review finding: value_counts drops NaN but a
    naive exact count would not)."""
    from hiss_cube_spark.operators.quality_checks import spacesaving_report

    rows = [(None,)] * 60 + [("hot",)] * 30 + [(f"x{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string").repartition(3)
    out = {r.key: r for r in spacesaving_report(df, "k", k=4).collect()}
    assert None not in out
    assert out["hot"].exact_n == 30  # threshold from the 40 non-null rows
    r = out["hot"]
    assert r.ss_found and r.overestimates and r.within_bound


def test_dtw_anchors_raise_on_short_series(spark):
    """Anchors beyond a series' length raise loudly instead of silently
    excluding the key from every candidate pair."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from hiss_cube_spark.operators.timeseries import dtw_banded_pairs

    df = spark.createDataFrame(
        [(1, list(range(16))), (2, list(range(8)))],  # key 2 too short
        "key long, v array<bigint>",
    )
    with pytest.raises(SparkRuntimeException, match="shorter than anchor"):
        dtw_banded_pairs(df, 10, radius=2, anchors=(6, 11)).collect()
