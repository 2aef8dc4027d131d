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
