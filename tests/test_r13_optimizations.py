"""Round-13 optimization pins: every rewrite here must be bit-identical to
the formulation it replaced.

1. `_dtw_q_kernel` (numpy banded DP, pandas UDF) ≡ the retired Catalyst
   aggregate/transform prefix-scan fold, full and banded, on random
   integer series (the fold is re-created verbatim below as the oracle).
2. `query_disc_nest_many_np` (batched ring walk) ≡ scalar
   `query_disc_nest_np` per probe, polar + random + degenerate probes.
3. `golden_records` struct-min fusion: non-numeric canon_col now raises.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _fold_expr(n: int, radius: int | None, INF: int = 10**15) -> str:
    """The pre-r13 Catalyst DP fold (verbatim), kept as the test oracle."""

    def _s(upto: str) -> str:
        return (
            f"aggregate(transform(slice(bv, 1, {upto}), "
            f"y -> abs(element_at(av, i) - y)), "
            f"CAST(0 AS BIGINT), (s, x) -> s + x)"
        )

    if radius is None:
        return (
            f"aggregate(sequence(1, {n}), CAST(array() AS ARRAY<BIGINT>), "
            f"(prev, i) -> transform(sequence(1, {n}), j -> "
            f"{_s('j')} + array_min(transform(sequence(1, j), k -> "
            f"(CASE WHEN size(prev) = 0 THEN "
            f"CASE WHEN k = 1 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST({INF} AS BIGINT) END "
            f"ELSE least(element_at(prev, k), "
            f"CASE WHEN k > 1 THEN element_at(prev, k - 1) "
            f"ELSE CAST({INF} AS BIGINT) END) END) "
            f"- CASE WHEN k > 1 THEN {_s('k - 1')} "
            f"ELSE CAST(0 AS BIGINT) END))), "
            f"acc -> element_at(acc, {n}))"
        )
    r = int(radius)
    return (
        f"aggregate(sequence(1, {n}), CAST(array() AS ARRAY<BIGINT>), "
        f"(prev, i) -> transform(sequence(1, {n}), j -> "
        f"CASE WHEN j < i - {r} OR j > i + {r} "
        f"THEN CAST({INF} AS BIGINT) "
        f"ELSE {_s('j')} + array_min(transform("
        f"sequence(greatest(1, i - {r}), j), k -> "
        f"(CASE WHEN size(prev) = 0 THEN "
        f"CASE WHEN k = 1 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST({INF} AS BIGINT) END "
        f"ELSE least(element_at(prev, k), "
        f"CASE WHEN k > 1 THEN element_at(prev, k - 1) "
        f"ELSE CAST({INF} AS BIGINT) END) END) "
        f"- CASE WHEN k > 1 THEN {_s('k - 1')} "
        f"ELSE CAST(0 AS BIGINT) END)) END), "
        f"acc -> element_at(acc, {n}))"
    )


@pytest.mark.parametrize("radius", [None, 1, 2, 5])
def test_dtw_kernel_matches_expression_fold(spark, radius):
    from hiss_cube_spark.operators.timeseries import _dtw_q_kernel

    n = 16
    rng = np.random.default_rng(13)
    rows = [
        (
            int(i),
            [int(x) for x in rng.integers(-50_000, 50_000, n)],
            [int(x) for x in rng.integers(-50_000, 50_000, n)],
        )
        for i in range(60)
    ]
    # degenerate shapes: identical series (dtw 0 on the diagonal), constants
    rows.append((60, [7] * n, [7] * n))
    rows.append((61, [0] * n, [100] * n))
    df = spark.createDataFrame(
        rows, "pair_id long, av array<bigint>, bv array<bigint>"
    )
    got = (
        df.select(
            "pair_id", _dtw_q_kernel(n, radius)("av", "bv").alias("dtw_q")
        )
        .orderBy("pair_id")
        .collect()
    )
    want = (
        df.select(
            "pair_id", F.expr(_fold_expr(n, radius)).alias("dtw_q")
        )
        .orderBy("pair_id")
        .collect()
    )
    assert [r.dtw_q for r in got] == [r.dtw_q for r in want]
    # sanity: identical series at full band → 0
    by_id = {r.pair_id: r.dtw_q for r in got}
    if radius is None:
        assert by_id[60] == 0


def test_batched_disc_cover_matches_scalar():
    from hiss_cube_spark.functions.spatial import (
        query_disc_nest_many_np,
        query_disc_nest_np,
    )

    rng = np.random.default_rng(7)
    ras = np.concatenate(
        [
            (np.arange(300) * 11.317) % 360.0,
            rng.uniform(0, 360, 200),
            [0.0, 359.999, 180.0, 0.0],
        ]
    )
    decs = np.concatenate(
        [
            (85.0 + (np.arange(300) * 0.261) % 4.9)
            * np.where(np.arange(300) % 2 == 0, 1, -1),
            rng.uniform(-90, 90, 200),
            [90.0, -90.0, 0.0, -89.95],
        ]
    )
    for nside, radius in ((8, 1.5), (32, 1.5), (1024, 0.01)):
        batch = query_disc_nest_many_np(ras, decs, radius, nside)
        assert len(batch) == len(ras)
        for i, (r, d) in enumerate(zip(ras, decs)):
            ref = query_disc_nest_np(r, d, radius, nside)
            assert np.array_equal(ref, batch[i]), (nside, radius, i, r, d)
    # empty input
    assert query_disc_nest_many_np(np.array([]), np.array([]), 1.0, 8) == []


def test_golden_records_rejects_non_numeric_canon(spark):
    from hiss_cube_spark.operators.clusters import golden_records

    docs = spark.createDataFrame(
        [(1, "b"), (2, "a")], "doc_id long, name string"
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(TypeError, match="must be numeric"):
        golden_records(docs, pairs, canon_col="name")
