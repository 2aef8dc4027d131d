"""Round-13 optimization pins: every rewrite here must be bit-identical to
the formulation it replaced.

1. `_dtw_q_kernel` (numpy banded DP, pandas UDF) ≡ the retired Catalyst
   aggregate/transform prefix-scan fold, full and banded, on random
   integer series (the fold is re-created verbatim below as the oracle).
2. `query_disc_nest_many_np` (batched ring walk) ≡ scalar
   `query_disc_nest_np` per probe, polar + random + degenerate probes.
3. `golden_records` struct-min fusion: non-numeric canon_col now raises.
4. `connected_components` flags: ``symmetric=True`` on a both-directions
   list and ``edges_materialized=True`` ≡ the default result.
5. KMV chain ``assume_distinct=True`` on a distinct cell table ≡ default.
6. `remove_duplicated_spans` array rebuild: token-exact pins (all-cut,
   mid-doc cut, duplicate-free, sub-n docs).
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


def test_cc_symmetric_and_materialized_flags_identical(spark):
    """connected_components: symmetric=True on a both-directions list and
    edges_materialized=True must return exactly the default result."""
    from hiss_cube_spark.operators.clusters import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (5, 5)],
        "doc_a long, doc_b long",
    )
    want = sorted(
        (r.node, r.cluster_id) for r in connected_components(pairs).collect()
    )
    sym = pairs.union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    got_sym = sorted(
        (r.node, r.cluster_id)
        for r in connected_components(sym, symmetric=True).collect()
    )
    got_mat = sorted(
        (r.node, r.cluster_id)
        for r in connected_components(
            pairs.localCheckpoint(eager=True), edges_materialized=True
        ).collect()
    )
    assert got_sym == want
    assert got_mat == want


def test_kmv_assume_distinct_identical(spark):
    """kmv_samples/kmv_distinct_* with assume_distinct=True on an
    already-distinct cell table must be row-identical to the default."""
    from hiss_cube_spark.operators.quality_checks import (
        kmv_distinct_count,
        kmv_distinct_intersect,
        kmv_hash,
    )

    rows = [("a", f"t{i}") for i in range(400)] + [
        ("b", f"t{i}") for i in range(150, 500)
    ]
    cells = (
        spark.createDataFrame(rows, "g string, key string")
        .select("g", kmv_hash("key").alias("h"))
        .distinct()
    )
    for fn in (kmv_distinct_count, kmv_distinct_intersect):
        want = sorted(
            tuple(r) for r in fn(cells, "g", "h", k=64, pre_hashed=True).collect()
        )
        got = sorted(
            tuple(r)
            for r in fn(
                cells, "g", "h", k=64, pre_hashed=True, assume_distinct=True
            ).collect()
        )
        assert got == want


def test_span_removal_array_rebuild_pins(spark):
    """remove_duplicated_spans after the array-rebuild rewrite: token-exact
    clean text, all-cut docs rebuild to '', duplicate-free docs unchanged."""
    from hiss_cube_spark.operators.dedup import remove_duplicated_spans

    base = "one two three four five"          # 5-gram duplicated across docs
    docs = [
        (0, base),                             # first occurrence -> kept
        (1, base),                             # exact dup -> fully cut
        (2, f"intro {base} outro"),            # overlapping windows cut mid-doc
        (3, "alpha beta gamma delta epsilon"), # no duplicated gram -> unchanged
        (4, "tiny doc"),                       # < n tokens -> unchanged
    ]
    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(
            spark.createDataFrame(docs, "doc_id long, text string"),
            n=5,
            min_count=2,
        ).collect()
    }
    assert out[0].clean_text == base and out[0].n_removed == 0
    assert out[1].clean_text == "" and out[1].n_removed == 5
    assert out[2].clean_text == "intro outro" and out[2].n_removed == 5
    assert out[3].clean_text == docs[3][1] and out[3].n_removed == 0
    assert out[4].clean_text == "tiny doc" and out[4].n_removed == 0
    assert all(out[i].n_tokens == len(docs[i][1].split()) for i in out)


def test_sketch_merge_grouping_sets_single_scan(spark, sf_dir):
    """dq_sketch_merge grouping-sets rewrite: (a) values identical to the
    retired two-scan formulation (per-source sketch + independent whole
    build), (b) the final plan reads the fact table at most once — the
    whole-corpus slice must come from the shared Expand, not a second
    scan."""
    import contextlib
    import io

    import __spark_entry__ as entry
    from hiss_cube_spark.operators.quality_checks import logbucket_sketch

    df = entry.queries()["dq_sketch_merge"](spark, sf_dir)

    # (a) equivalence vs the pre-r13 two-scan build, row for row
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_returnflag").alias("src"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    bucket = (
        F.lit(16) * (F.length(F.bin(F.col("cents"))) - F.lit(1))
        + F.expr(
            "(16 * cents) DIV shiftleft(1L, "
            "cast(length(bin(cents)) - 1 AS INT))"
        )
        - F.lit(16)
    )
    per = (
        li.where(F.col("cents") > 0)
        .select("src", bucket.cast("long").alias("bucket"))
        .groupBy("src", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    old = (
        per.groupBy("bucket")
        .agg(F.sum("n").alias("merged_n"))
        .join(
            logbucket_sketch(li.select("cents"), "cents").withColumnRenamed(
                "n", "whole_n"
            ),
            "bucket",
        )
        .select(
            "bucket",
            F.col("merged_n").cast("long").alias("merged_n"),
            F.col("whole_n").cast("long").alias("whole_n"),
            (F.col("merged_n") == F.col("whole_n")).alias("merge_exact"),
        )
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, old.collect()))
    assert got == want and len(got) > 0

    # (b) plan shape: at most one parquet scan (the checkpointed grouping
    # sets subtree; 0 visible when the explain renders the checkpoint RDD)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entry.queries()["dq_sketch_merge"](spark, sf_dir).explain("formatted")
    n_scans = buf.getvalue().count("Location:")
    assert n_scans <= 1, f"expected <=1 parquet scan, saw {n_scans}"

    # (c) the one-scan claim checked DIRECTLY (ADVICE r13): the final
    # explain above hides the scan inside the checkpoint RDD lineage, so
    # (b) alone cannot see a regression to two scans BELOW the pin.
    # Explain the pre-checkpoint grouping-sets frame (same construction,
    # no localCheckpoint) and require exactly one scan + one Expand.
    gs_pre = (
        li.where(F.col("cents") > 0)
        .select("src", bucket.cast("long").alias("bucket"))
        .groupingSets([["src", "bucket"], ["bucket"]], "src", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("_gid"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gs_pre.explain("formatted")
    pre_plan = buf.getvalue()
    n_scans_pre = pre_plan.count("Location:")
    n_expand_pre = pre_plan.count("Expand")
    assert n_scans_pre == 1, f"grouping-sets frame: {n_scans_pre} scans"
    assert n_expand_pre >= 1, "grouping-sets frame lost its Expand"
