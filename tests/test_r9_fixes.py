"""Round-9 ADVICE/VERDICT fixes: psi NULL hygiene, PLIO truncation,
k-means exactness-bound validation, file:// CLI path normalization."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_psi_drift_drops_null_values_and_null_predicates(spark):
    """A NULL value must not bucket as least(n-1, NULL)=n-1 (top-bin
    drift fabrication), and a NULL predicate row must not count as
    'current' (ADVICE r8)."""
    from hiss_cube_spark.operators.quality_checks import psi_drift

    rows = [(1.0, True)] * 4 + [(15.0, True)] * 4
    rows += [(1.0, False)] * 4 + [(15.0, False)] * 4
    # poison: NULL values on both slices + a NULL-predicate row
    rows += [(None, True), (None, False), (15.0, None)]
    df = spark.createDataFrame(rows, "x double, is_base boolean")
    out = {
        r["bucket"]: r
        for r in psi_drift(df, "x", F.col("is_base"), 0.0, 20.0, 2).collect()
    }
    # identical distributions: every count 4, every term exactly 0
    assert out[0]["n_base"] == 4 and out[0]["n_cur"] == 4
    assert out[1]["n_base"] == 4 and out[1]["n_cur"] == 4
    assert out[0]["psi_term_q"] == 0 and out[1]["psi_term_q"] == 0


def test_numeric_histogram_drops_nulls(spark):
    from hiss_cube_spark.operators.quality_checks import numeric_histogram

    df = spark.createDataFrame(
        [(5.0,), (None,), (95.0,), (None,)], "x double"
    )
    out = {r["bucket"]: r["n"] for r in
           numeric_histogram(df, "x", 0.0, 100.0, 10).collect()}
    assert out == {0: 1, 9: 1}  # NULLs in neither the top bin nor anywhere


def test_plio_foreign_truncated_stream_raises():
    """Clamping lllen to the buffer turned missing tail instructions into
    silent zeros (ADVICE r8) — must now fail loudly."""
    from hiss_cube_spark.sources.plio_foreign import (
        iraf_plio_decode,
        iraf_plio_encode,
    )

    px = np.array([0, 0, 7, 7, 7, 0, 3, 0], dtype=np.int64)
    buf = iraf_plio_encode(px)
    assert np.array_equal(iraf_plio_decode(buf, px.size), px)
    with pytest.raises(ValueError, match="truncated"):
        iraf_plio_decode(buf[:-2], px.size)  # drop the last int16 word


def test_plio_foreign_zero_length_run_raises():
    """PN with data==0 steps pos backward and overwrites the previous
    pixel — corrupt streams must be rejected, not mis-decoded."""
    from hiss_cube_spark.sources.plio_foreign import iraf_plio_decode

    hdr = [0, 7, -100, 9, 0, 0, 0]
    # IS +5 (writes pixel 0), then PN with data==0 (corrupt)
    instr = [(6 << 12) | 5, (5 << 12) | 0]
    buf = np.asarray(hdr + instr, dtype=">i2").tobytes()
    with pytest.raises(ValueError, match="zero-length"):
        iraf_plio_decode(buf, 4)


def test_kmeans_rejects_vectors_beyond_exactness_bound(spark):
    """dim·(quant·max|x|)² ≥ 2^53 breaks the exact-int64 contract; the
    quantizer must refuse rather than silently overflow (ADVICE r8)."""
    from hiss_cube_spark.operators.similarity import kmeans_cosine

    # dim=4, quant=1e6 → bound is sqrt(2^53/4) ≈ 4.7e7 → |x| ≈ 47.4
    rows = [(i, [float(i + 1), 0.0, 0.0, 0.0]) for i in range(3)]
    rows.append((3, [100.0, 0.0, 0.0, 0.0]))  # 1e8 > 4.7e7: over bound
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="exactness bound"):
        kmeans_cosine(df, k=2, dim=4, rounds=1).collect()
    # in-bound magnitudes (even > 1) still work
    ok = kmeans_cosine(df.filter("vec_id < 3"), k=2, dim=4, rounds=1)
    assert ok.count() == 3


def test_cli_file_uri_normalized(spark, tmp_path):
    """file:// output paths must hit the SAME directory for Spark writes
    and the local-fs truncate (ADVICE r8): before the fix, _truncate on
    'file:///x' was a silent no-op (os.path.isdir is False on a URI)."""
    import os

    from hiss_cube_spark.__main__ import main

    wh = tmp_path / "wh"
    (wh / "stale_table").mkdir(parents=True)
    (wh / "stale_table" / "part-0.parquet").write_bytes(b"x")
    rc = main([str(tmp_path), f"file://{wh}", "--truncate", "update"])
    assert rc in (0, None)
    assert not os.path.exists(wh / "stale_table")


def test_cli_remote_uri_still_rejected(tmp_path, capsys):
    from hiss_cube_spark.__main__ import main

    rc = main([str(tmp_path), "s3://bucket/wh", "--truncate", "update"])
    assert rc == 2
    assert "local path" in capsys.readouterr().err


def _dtw_events(spark, seriess):
    """One event per (key, hour): bucket cents == round(value*100)."""
    hour = 3_600_000_000
    rows = []
    for k, vals in seriess.items():
        for t, v in enumerate(vals):
            rows.append((k, t * hour, float(v)))
    return spark.createDataFrame(rows, "user_id long, ts_us long, value double")


def test_dtw_banded_pairs_contain_all_threshold_true_pairs(spark):
    """VERDICT r8: the banded pair source must be a provable superset of
    the threshold-true pairs (LB_Kim containment), with the same exact
    DP distances on the surviving pairs."""
    from hiss_cube_spark.operators.timeseries import (
        dtw_banded_pairs,
        dtw_distance,
    )

    n = 8
    base = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 12.0, 11.0]
    seriess = {}
    # three tight clusters of three (pairwise DTW well under threshold)
    for c, shift in enumerate([0.0, 40.0, 80.0]):
        for j in range(3):
            seriess[c * 3 + j] = [v + shift + 0.01 * j for v in base]
    # three loners, far from everything
    for j, shift in enumerate([200.0, 400.0, 800.0]):
        seriess[9 + j] = [v + shift for v in base]
    df = _dtw_events(spark, seriess)

    exact = {
        (r["key_a"], r["key_b"]): r["dtw_q"]
        for r in dtw_distance(df, n=n, max_keys=12).collect()
    }
    assert len(exact) == 66  # C(12,2): the cap-bounded all-pairs baseline

    threshold_q = 500  # cents: within-cluster DTW ~ tens of cents
    banded = {
        (r["key_a"], r["key_b"]): r["dtw_q"]
        for r in dtw_distance(
            df, n=n,
            pair_source=lambda s: dtw_banded_pairs(s, threshold_q),
        ).collect()
    }
    true_pairs = {p for p, d in exact.items() if d <= threshold_q}
    assert len(true_pairs) == 9  # 3 clusters x C(3,2)
    # containment: every threshold-true pair is a candidate...
    assert true_pairs <= set(banded)
    # ...with the identical exact distance
    assert all(banded[p] == exact[p] for p in true_pairs)
    # and the banding actually pruned (no all-pairs explosion)
    assert len(banded) < 66


def _np_dtw(a, b, r=None):
    import numpy as np

    n = len(a)
    D = np.full((n + 1, n + 1), float("inf"))
    D[0, 0] = 0
    for i in range(1, n + 1):
        lo = 1 if r is None else max(1, i - r)
        hi = n if r is None else min(n, i + r)
        for j in range(lo, hi + 1):
            c = abs(a[i - 1] - b[j - 1])
            D[i, j] = c + min(D[i - 1, j], D[i - 1, j - 1], D[i, j - 1])
    return int(D[n, n])


def test_constrained_dtw_matches_reference(spark):
    """Sakoe-Chiba DP (radius 1/2/3) and the unconstrained fold both
    match an independent numpy DP on random integer series."""
    import numpy as np

    from hiss_cube_spark.operators.timeseries import dtw_distance

    rng = np.random.default_rng(7)
    n, hour = 16, 3_600_000_000
    series, rows = {}, []
    for k in range(6):
        v = rng.integers(0, 5000, n)
        series[k] = v
        rows += [(k, t * hour, float(x) / 100.0) for t, x in enumerate(v)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    for r in (1, 2, None):
        out = {
            (q["key_a"], q["key_b"]): q["dtw_q"]
            for q in dtw_distance(df, n=n, max_keys=6, radius=r).collect()
        }
        for a in range(6):
            for b in range(a + 1, 6):
                assert out[(a, b)] == _np_dtw(series[a], series[b], r)


def test_constrained_banded_lb_keogh_exact_vs_bruteforce(spark):
    """banded source + LB_Keogh prefilter + constrained DP == brute-force
    constrained all-pairs, filtered at the same threshold (every stage
    is a sound superset, so no true pair is lost)."""
    from hiss_cube_spark.operators.timeseries import (
        dtw_banded_pairs,
        dtw_distance,
    )

    n = 8
    base = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0, 12.0, 11.0]
    seriess = {}
    for c, shift in enumerate([0.0, 40.0, 80.0]):
        for j in range(3):
            seriess[c * 3 + j] = [v + shift + 0.01 * j for v in base]
    for j, shift in enumerate([200.0, 400.0, 800.0]):
        seriess[9 + j] = [v + shift for v in base]
    df = _dtw_events(spark, seriess)
    thr = 500
    brute = {
        (r["key_a"], r["key_b"]): r["dtw_q"]
        for r in dtw_distance(df, n=n, max_keys=12, radius=2).collect()
        if r["dtw_q"] <= thr
    }
    banded = {
        (r["key_a"], r["key_b"]): r["dtw_q"]
        for r in dtw_distance(
            df, n=n, radius=2, lb_prune_q=thr,
            pair_source=lambda s: dtw_banded_pairs(s, thr),
        ).collect()
        if r["dtw_q"] <= thr
    }
    assert banded == brute and len(brute) == 9
