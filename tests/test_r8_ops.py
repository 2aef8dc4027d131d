"""Round-8 operators: PSI drift, spherical k-means + prototypes, DTW."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_psi_drift_hand_computed(spark):
    from hiss_cube_spark.operators.quality_checks import psi_drift

    # 2 bins over [0, 20): base = 6 lows + 2 highs, cur = 2 lows + 6 highs
    rows = [(1.0, True)] * 6 + [(15.0, True)] * 2
    rows += [(1.0, False)] * 2 + [(15.0, False)] * 6
    df = spark.createDataFrame(rows, "x double, is_base boolean")
    out = {
        r["bucket"]: r
        for r in psi_drift(df, "x", F.col("is_base"), 0.0, 20.0, 2).collect()
    }
    assert out[0]["n_base"] == 6 and out[0]["n_cur"] == 2
    term0 = (2 / 8 - 6 / 8) * math.log((2 / 8) / (6 / 8))
    assert out[0]["psi_term_q"] == math.floor(term0 * 1e9)
    term1 = (6 / 8 - 2 / 8) * math.log((6 / 8) / (2 / 8))
    assert out[1]["psi_term_q"] == math.floor(term1 * 1e9)
    # symmetric shift: both terms positive, total PSI ≈ 0.549
    total = (out[0]["psi_term_q"] + out[1]["psi_term_q"]) / 1e9
    assert total == pytest.approx(2 * term1, rel=1e-6)


def test_psi_drift_empty_side_is_null(spark):
    from hiss_cube_spark.operators.quality_checks import psi_drift

    rows = [(1.0, True)] * 4 + [(15.0, False)] * 4
    df = spark.createDataFrame(rows, "x double, is_base boolean")
    out = {
        r["bucket"]: r["psi_term_q"]
        for r in psi_drift(df, "x", F.col("is_base"), 0.0, 20.0, 2).collect()
    }
    assert out[0] is None and out[1] is None  # reported, never smoothed


def _cluster_fixture(spark, spread=0.01):
    """Three well-separated direction clusters of 5 vectors each, dim 8."""
    rng = np.random.default_rng(42)
    dirs = np.eye(8)[:3]
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(5):
            v = dirs[c] + rng.normal(0, spread, 8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_cosine_separated_clusters(spark):
    from hiss_cube_spark.operators.similarity import kmeans_cosine

    df = _cluster_fixture(spark)
    out = kmeans_cosine(df, k=3, dim=8, rounds=2).collect()
    assert len(out) == 15
    by_true = {}
    for r in out:
        by_true.setdefault(r["vec_id"] // 5, set()).add(r["cluster"])
    # each planted cluster maps to exactly one k-means cluster, all distinct
    assert all(len(s) == 1 for s in by_true.values())
    assert len(set.union(*by_true.values())) == 3


def test_kmeans_cosine_deterministic(spark):
    from hiss_cube_spark.operators.similarity import kmeans_cosine

    df = _cluster_fixture(spark)
    a = sorted(map(tuple, kmeans_cosine(df, k=3, dim=8, rounds=2).collect()))
    b = sorted(map(tuple, kmeans_cosine(df, k=3, dim=8, rounds=2).collect()))
    assert a == b


def test_cluster_prototypes_planted_outlier(spark):
    from hiss_cube_spark.operators.similarity import cluster_prototypes

    rng = np.random.default_rng(7)
    rows = []
    # one tight cluster along e0 ... with vec 9 bent halfway toward e1
    for i in range(9):
        v = np.eye(8)[0] + rng.normal(0, 0.005, 8)
        rows.append((i, [float(x) for x in v]))
    bent = (np.eye(8)[0] + 0.9 * np.eye(8)[1])
    rows.append((9, [float(x) for x in bent]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_prototypes(df, k=1, rounds=1, n_proto=2, n_outlier=2, dim=8)
    rows_out = out.collect()
    outliers = [r["vec_id"] for r in rows_out if r["role"] == "outlier"]
    protos = [r["vec_id"] for r in rows_out if r["role"] == "proto"]
    assert 9 in outliers  # the bent vector is least prototypical
    assert 9 not in protos
    assert len(protos) == 2


def _dtw_ref(a, b):
    n, m = len(a), len(b)
    D = [[10**15] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i][j] = c
            elif i == 0:
                D[i][j] = c + D[i][j - 1]
            elif j == 0:
                D[i][j] = c + D[i - 1][j]
            else:
                D[i][j] = c + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    return D[n - 1][m - 1]


def test_dtw_distance_matches_reference_dp(spark):
    from hiss_cube_spark.operators.timeseries import dtw_distance

    # 3 users × 16 hourly buckets, one event per bucket, exact cent values
    rng = np.random.default_rng(3)
    series = {u: rng.integers(0, 5000, 16).tolist() for u in (1, 2, 3)}
    rows = []
    eid = 0
    for u, vals in series.items():
        for t, cents in enumerate(vals):
            rows.append((eid, u, t * 3_600_000_000, cents / 100.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = {
        (r["key_a"], r["key_b"]): r["dtw_q"]
        for r in dtw_distance(df, n=16, max_keys=3).collect()
    }
    assert len(out) == 3
    for (ua, ub), got in out.items():
        assert got == _dtw_ref(series[ua], series[ub]), (ua, ub)


def test_dtw_identical_series_is_zero(spark):
    from hiss_cube_spark.operators.timeseries import dtw_distance

    rows = []
    for u in (1, 2):
        for t in range(16):
            rows.append((u * 100 + t, u, t * 3_600_000_000, float(t)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = dtw_distance(df, n=16, max_keys=2).collect()
    assert len(out) == 1 and out[0]["dtw_q"] == 0

    # warped copy: same shape shifted by one bucket still aligns cheaply —
    # DTW cost is bounded by the two boundary mismatches, not n×shift
    rows2 = [(t, 1, t * 3_600_000_000, float(min(t, 14))) for t in range(16)]
    rows2 += [(100 + t, 2, t * 3_600_000_000, float(max(0, t - 1))) for t in range(16)]
    df2 = spark.createDataFrame(
        rows2, "event_id long, user_id long, ts_us long, value double"
    )
    lockstep = sum(abs(min(t, 14) - max(0, t - 1)) for t in range(16)) * 100
    dtw = dtw_distance(df2, n=16, max_keys=2).collect()[0]["dtw_q"]
    assert dtw < lockstep  # elastic alignment beats lock-step comparison


def test_mattr_hand_computed(spark):
    from hiss_cube_spark.operators.text_analysis import mattr

    # doc 1: 75 tokens = 50 distinct then 25 repeats of 'x'
    toks = [f"w{i}" for i in range(50)] + ["x"] * 25
    # windows: s=0 -> w0..w49 distinct=50; s=25 -> w25..w49 + 25x = 26
    doc1 = " ".join(toks)
    # doc 2: 40 tokens — too short, excluded
    doc2 = " ".join(["a"] * 40)
    df = spark.createDataFrame([(1, doc1), (2, doc2)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in mattr(df).collect()}
    assert 2 not in out
    r = out[1]
    assert r["n_windows"] == 2
    assert r["sum_distinct"] == 50 + 26
    assert r["mattr"] == round(76 / 100.0, 6)


def test_rolling_distinct_contribution_form(spark):
    # WAU(d) over the contribution form == brute-force set union
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "se", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = {
        r["day"]: (r["dau"], r["wau"])
        for r in m._QUERIES["w_rolling_distinct"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    e = m._events(spark, "/root/testdata/sf0.001")
    ad = {
        (r["user_id"], r["day"])
        for r in e.selectExpr(
            "user_id", "ts_us DIV 86400000000 AS day"
        ).distinct().collect()
    }
    days = sorted({d for _, d in ad})
    for d in range(days[0], days[-1] + 1):
        dau = len({u for u, dd in ad if dd == d})
        wau = len({u for u, dd in ad if d - 6 <= dd <= d})
        assert out[d] == (dau, wau), d


def test_periodogram_pure_tone(spark):
    from hiss_cube_spark.operators.timeseries import periodogram

    import math

    # user 1: pure cosine at k=2 over 16 hourly buckets -> power peaks at k=2
    rows = []
    for t in range(16):
        v = 100.0 * math.cos(2 * math.pi * 2 * t / 16)
        rows.append((t, 1, t * 3_600_000_000, v))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double"
    )
    out = {r["k"]: r["power"] for r in periodogram(df, n=16, k_max=8).collect()}
    assert len(out) == 8
    peak = max(out, key=out.get)
    assert peak == 2
    # a pure tone's off-harmonic leakage is tiny vs the peak
    assert out[2] > 100 * max(v for k, v in out.items() if k != 2)
