"""Round-11 regression pins: the four ADVICE-r10 fixes.

1. golden_records: NULLs excluded from the mode candidate set (Spark's
   ASC NULLS FIRST vs ANSI NULLS LAST divergence), all-NULL cluster
   fuses to NULL instead of dropping the row.
2. ab_cuped/ab_srm arm hash: 31-bit pre-mask makes the assignment exact
   int64 (no wrap) for EVERY int64 user id, including negative.
3. bounded_contribution: value_col XOR value_cap_cents is a hard error.
4. join_exchange_count counts only shuffle Exchanges (BroadcastExchange
   and ReusedExchange excluded).
"""

import pytest
from pyspark.sql import functions as F


def test_golden_records_null_mode_votes_excluded(spark):
    """A NULL plurality must not beat a real value, and the NULL tie-break
    must not pick NULL over a value (Spark ASC = NULLS FIRST would)."""
    from hiss_cube_spark.operators.clusters import golden_records

    docs = spark.createDataFrame(
        [
            # cluster {1,2,3}: lang NULL,NULL,'en' -> mode must be 'en'
            (1, None, "cc", 10),
            (2, None, "cc", 20),
            (3, "en", "cc", 30),
            # cluster {7,8}: source all NULL -> row kept, source fuses NULL
            (7, "de", None, 10),
            (8, "fr", None, 40),
        ],
        "doc_id long, lang string, source string, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    out = {
        r.cluster_id: r
        for r in golden_records(
            docs, pairs, canon_col="n_chars",
            mode_cols=("lang", "source"), max_cols=("n_chars",),
        ).collect()
    }
    assert out[1].lang == "en"          # 2 NULL votes discarded
    assert out[1].source == "cc"
    assert 7 in out                      # all-NULL cluster still emitted
    assert out[7].source is None         # ... and fuses to NULL
    assert out[7].lang == "de"           # 1-1 tie -> lexicographic min
    assert out[7].n_members == 2


def test_arm_hash_exact_for_full_int64_domain(spark):
    """The 31-bit pre-mask keeps u·mult inside int64: Spark's non-ANSI
    silent wrap and trunc-vs-floor division can no longer diverge from an
    unwrapped engine. Pin against the Python big-int reference."""
    from hiss_cube_spark.operators.experiments import _ARM_HASH_SQL

    mult = 2_654_435_761
    ids = [0, 1, 3, 2**31 - 1, 2**31, 2**33 + 7, 2**62, -1, -5, -(2**40)]

    def ref(u):
        return (((u & 0x7FFFFFFF) * mult) >> 31) % 2

    df = spark.createDataFrame([(u,) for u in ids], "u long").select(
        "u", F.expr(_ARM_HASH_SQL.format(u="u", m=mult)).alias("arm")
    )
    got = {r.u: r.arm for r in df.collect()}
    assert got == {u: ref(u) for u in ids}
    # both arms are populated over small sequential ids (mixing sanity)
    seq = spark.range(0, 64).select(
        F.expr(_ARM_HASH_SQL.format(u="id", m=mult)).alias("arm")
    )
    arms = {r.arm for r in seq.distinct().collect()}
    assert arms == {0, 1}


def test_ab_srm_and_cuped_share_assignment(spark):
    """SRM guards the SAME assignment the CUPED readout uses: per-user arm
    derived through ab_srm's distinct path equals ab_cuped's arm grouping
    for ids beyond 2^31 (where the old unmasked form wrapped)."""
    from hiss_cube_spark.operators.experiments import ab_cuped, ab_srm

    big = [2**31 + k for k in range(8)] + [-(2**35) - k for k in range(8)]
    rows = [(u, "g", 100_000 + u % 7, float(1 + u % 3)) for u in big]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long, value double"
    )
    srm = ab_srm(df).collect()[0]
    cuped = ab_cuped(df, split_us=100_003).collect()
    n_by_arm = {r.arm: r.n_users for r in cuped}
    assert srm.n_a == n_by_arm.get(0, 0)
    assert srm.n_b == n_by_arm.get(1, 0)
    assert srm.n_a + srm.n_b == len(big)


def test_bounded_contribution_rejects_half_specified_value_axis(spark):
    from hiss_cube_spark.operators.privacy import bounded_contribution

    df = spark.createDataFrame(
        [(1, "g", 1.0)], "user_id long, event_type string, value double"
    )
    with pytest.raises(ValueError, match="value_cap_cents"):
        bounded_contribution(df, "user_id", "event_type", value_col="value")
    with pytest.raises(ValueError, match="value_col"):
        bounded_contribution(
            df, "user_id", "event_type", value_cap_cents=100
        )


def test_join_exchange_count_ignores_broadcast_exchange(spark):
    """A broadcast hash join has a BroadcastExchange but ZERO shuffle
    Exchanges — the counter must say 0 (the substring tally said 1+)."""
    from hiss_cube_spark.plans.bucketing import join_exchange_count

    left = spark.range(0, 1000).withColumnRenamed("id", "k")
    right = spark.range(0, 10).withColumnRenamed("id", "k")
    j = left.join(F.broadcast(right), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert join_exchange_count(j) == 0
    # and a plain shuffle join still counts its exchanges
    shuffled = left.hint("merge").join(
        spark.range(0, 2000).withColumnRenamed("id", "k").hint("merge"), "k"
    )
    assert join_exchange_count(shuffled) >= 2


def test_bucketed_query_plans_zero_shuffle(spark, sf_dir):
    """The registered j_bucketed_colocated query — join AND per-order
    aggregate — must plan with ZERO shuffle Exchanges end-to-end: the
    bucketed layout provides the join distribution, and the groupBy keys
    contain the bucket key so the same partitioning satisfies the
    aggregate too."""
    import __spark_entry__ as entrymod
    from hiss_cube_spark.plans.bucketing import join_exchange_count

    try:
        df = entrymod.queries()["j_bucketed_colocated"](spark, sf_dir)
        assert join_exchange_count(df) == 0
        rows = df.collect()
        assert len(rows) > 0
        assert all(r.n_items >= 1 for r in rows)
    finally:
        spark.sql("DROP TABLE IF EXISTS hc_bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS hc_bkt_orders")


def test_learn_bpe_merges_matches_reference_loop(spark):
    """The distributed learner's fold/argmax must reproduce the canonical
    Sennrich loop (train_bpe's python reference, minus the </w> marker)
    on a randomized corpus — counts, pairs, order and tie-breaks."""
    import random
    from collections import Counter

    from hiss_cube_spark.operators.tokenizer import (
        learn_bpe_merges,
        word_frequency_table,
    )

    rng = random.Random(7)
    vocab = ["aa", "aaa", "abab", "banana", "bandana", "ana", "naan",
             "abc", "cab", "aabb", "x"]
    words = [vocab[rng.randrange(len(vocab))] for _ in range(400)]
    df = spark.createDataFrame([(" ".join(words[i:i + 8]),)
                                for i in range(0, 400, 8)], "text string")

    got = [
        (r["round"], r.left_sym, r.right_sym, r.pair_count)
        for r in learn_bpe_merges(
            word_frequency_table(df, min_freq=1), n_merges=5
        ).orderBy("round").collect()
    ]

    # python reference: canonical left-to-right merges, no end marker
    freqs = Counter(words)
    table = {tuple(w): c for w, c in freqs.items()}
    want = []
    for k in range(1, 6):
        pc = Counter()
        for sym, c in table.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        top = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == top)
        want.append((k, a, b, top))
        nxt = {}
        for sym, c in table.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        table = nxt
    assert got == want


def test_word_frequency_table_pattern_and_cap(spark):
    from hiss_cube_spark.operators.tokenizer import word_frequency_table

    df = spark.createDataFrame(
        [("the cat the Cat c4t |pipe| the",)], "text string"
    )
    rows = {r.word: r.f for r in word_frequency_table(df).collect()}
    assert rows == {"the": 3, "cat": 1}          # pattern drops Cat/c4t/|pipe|
    capped = {r.word: r.f
              for r in word_frequency_table(df, min_freq=2).collect()}
    assert capped == {"the": 3}


def test_learn_bpe_merges_tolerates_empty_words(spark):
    """A size-0 token array (permissive caller pattern admitting '') must
    contribute zero pairs, not a negative-length slice error."""
    from hiss_cube_spark.operators.tokenizer import learn_bpe_merges

    words = spark.createDataFrame(
        [("", 5), ("ab", 3), ("abab", 2)], "word string, f long"
    )
    got = [(r["round"], r.left_sym, r.right_sym, r.pair_count)
           for r in learn_bpe_merges(words, n_merges=2).collect()]
    assert got[0] == (1, "a", "b", 7)   # 3 + 2*2, '' casts no votes
    assert got[1] == (2, "ab", "ab", 2)


def test_learn_bpe_merges_quote_safe_symbols(spark):
    """Winning symbols bind as literal Columns: a quote in the alphabet
    must not break (or corrupt) the merge-apply expression."""
    from hiss_cube_spark.operators.tokenizer import learn_bpe_merges

    words = spark.createDataFrame(
        [("d'", 4), ("d'd'", 2)], "word string, f long"
    )
    got = [(r["round"], r.left_sym, r.right_sym, r.pair_count)
           for r in learn_bpe_merges(words, n_merges=2).collect()]
    assert got[0] == (1, "d", "'", 8)
    assert got[1] == (2, "d'", "d'", 2)


def test_oracle_harness_reads_multifile_tables(spark, tmp_path):
    """duck_connection must read the {table}.parquet/ DIRECTORY layout
    the multi-file corpus maker writes (DuckDB needs the glob)."""
    import os
    import shutil

    from oracle_harness import TABLES, duck_connection

    src = "/root/testdata/sf0.001"
    out = tmp_path / "corpus"
    out.mkdir()
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if t == "documents":  # one multi-file table among single-file ones
            dst.mkdir()
            shutil.copy(f"{src}/{t}.parquet", dst / "part-0.parquet")
            shutil.copy(f"{src}/{t}.parquet", dst / "part-1.parquet")
        else:
            shutil.copy(f"{src}/{t}.parquet", dst)
    con = duck_connection(str(out))
    n_single = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    assert con.execute("SELECT count(*) FROM documents").fetchone()[0] \
        == 2 * n_single
    assert con.execute("SELECT count(*) FROM region").fetchone()[0] > 0
