"""Dataset-curation operators: invariants beyond the oracle-parity gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hiss_cube_spark.operators.curation import balanced_sample, hash_split, pack_sequences


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_split_partition_and_stability(docs):
    out = hash_split(docs)
    n = docs.count()
    by = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(by.values()) == n  # total partition: every row in exactly one split
    assert set(by) <= {"train", "val", "test"}
    assert by["train"] > by.get("val", 0) and by["train"] > by.get("test", 0)
    # pure function of the key: dropping rows never reassigns the others
    half = hash_split(docs.where(F.col("doc_id") % 2 == 0))
    joined = out.alias("a").join(half.alias("b"), "doc_id").where(
        F.col("a.split") != F.col("b.split")
    )
    assert joined.count() == 0


def test_pack_sequences_reconstructs_stream(docs):
    capacity = 512
    out = pack_sequences(docs, capacity=capacity, shard_col="source").collect()
    # regroup per shard in doc order and replay the greedy concat
    shards: dict[str, list] = {}
    for r in out:
        shards.setdefault(r["source"], []).append(r)
    for rows in shards.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["bin_id"] == cum // capacity
            assert r["chunk_offset"] == cum % capacity
            cum += r["n_tokens"]
    # offsets always inside the window
    assert all(0 <= r["chunk_offset"] < capacity for r in out)


def test_balanced_sample_k_per_label(docs):
    k = 7
    out = balanced_sample(docs, k=k, label_col="lang")
    sizes = out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    label_sizes = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for r in sizes:
        assert r["cnt"] == min(k, label_sizes[r["lang"]])
    # deterministic: same result twice
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in balanced_sample(docs, k=k, label_col="lang").collect())
    assert a == b


def test_connected_components_chain_and_clique(spark):
    from hiss_cube_spark.operators.clusters import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + triangle
        # 10-11-12 + isolated pair (20, 21)
        [(2, 1), (2, 3), (4, 3), (10, 11), (11, 12), (10, 12), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_resolve_duplicates_keeps_canonical_and_untouched(spark):
    from hiss_cube_spark.operators.clusters import resolve_duplicates

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    kept = sorted(r["doc_id"] for r in resolve_duplicates(docs, pairs).collect())
    # cluster {1,2,3} -> keep 1; 7 and 8 appear in no pair -> untouched
    assert kept == [1, 7, 8]


def test_decontaminate_drops_ngram_overlap(spark):
    from hiss_cube_spark.operators.curation import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated content about spark engines"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps far away")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in decontaminate(train, test, n=3).collect())
    # doc 1 shares the 3-gram "quick brown fox"; docs 2 and 3 survive
    # (3 is shorter than n -> its whole-text gram matches nothing)
    assert kept == [2, 3]


def test_train_pipeline_example_composes(spark, sf_dir):
    """The end-to-end curation example: every stage feeds the next, counts
    shrink monotonically through the filters, and the packed train shard
    stays consistent with its split."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from train_pipeline import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    benchmark = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    outs = curate(spark, corpus, benchmark)

    n_raw = corpus.count()
    n_cur = outs["curated"].count()
    assert 0 < n_cur <= n_raw
    assert outs["split"].count() == n_cur
    train_ids = {r["doc_id"] for r in outs["split"].where(F.col("split") == "train").collect()}
    packed_ids = {r["doc_id"] for r in outs["packed_train"].collect()}
    assert packed_ids == train_ids  # every train doc packed exactly once
    rep = outs["report"]
    assert rep.agg(F.sum("n_docs")).collect()[0][0] == n_cur


def test_temperature_sample_flattens_distribution(spark):
    from hiss_cube_spark.operators.curation import temperature_sample

    # 400 'big' docs vs 20 'small' docs: α=0.5 should upsample the tail's
    # SHARE (small keeps a higher per-doc rate than big).
    rows = [(i, "big") for i in range(400)] + [(i, "small") for i in range(400, 420)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, alpha=0.5, budget_frac=0.5)
    rates = {r["lang"]: r["rate"] for r in out.select("lang", "rate").distinct().collect()}
    assert rates["small"] > rates["big"]
    # rates clip at 1.0 and stay positive
    assert 0.0 < rates["big"] <= 1.0 and rates["small"] <= 1.0
    # deterministic: repartitioned input selects the SAME doc ids
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"] for r in temperature_sample(df.repartition(13), alpha=0.5, budget_frac=0.5).collect()
    )
    assert a == b


def test_temperature_sample_tiny_label_clips_to_keep_all(spark):
    from hiss_cube_spark.operators.curation import temperature_sample

    rows = [(i, "big") for i in range(1000)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, alpha=0.3, budget_frac=0.5)
    rare = [r for r in out.collect() if r["lang"] == "rare"]
    # the single rare doc's rate clips at 1.0 → always kept
    assert len(rare) == 1 and rare[0]["rate"] == 1.0


def test_redact_pii_scrubs_and_counts(spark):
    from hiss_cube_spark.operators.privacy import redact_pii

    rows = [
        (1, "mail me at alice.smith+x@corp.example.org today"),
        (2, "call 303-555-0142 or 303.555.0143, ssn 123-45-6789"),
        (3, "server at 192.168.0.1 and 10.0.255.254"),
        (4, "nothing sensitive here"),
    ]
    out = {
        r["doc_id"]: r
        for r in redact_pii(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["redacted"]
    assert "alice" not in out[1]["redacted"]
    assert out[2]["n_phone"] == 2 and out[2]["n_ssn"] == 1
    assert out[2]["redacted"].count("<PHONE>") == 2
    assert "<SSN>" in out[2]["redacted"]
    assert out[3]["n_ipv4"] == 2 and out[3]["redacted"].count("<IPV4>") == 2
    assert out[4]["redacted"] == "nothing sensitive here"
    assert out[4]["n_email"] == out[4]["n_phone"] == out[4]["n_ssn"] == out[4]["n_ipv4"] == 0


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from hiss_cube_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha\n\nshared boilerplate\n\nbeta"),
        (2, "shared boilerplate\n\ngamma"),
        (3, "  shared boilerplate \n\ndelta"),  # whitespace-normalized dup
        (4, "shared boilerplate"),  # whole doc is a dup -> empty text
    ]
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[1]["text"] == "alpha\n\nshared boilerplate\n\nbeta"
    assert out[1]["n_kept"] == 3 and out[1]["n_dropped"] == 0
    assert out[2]["text"] == "gamma" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "delta" and out[3]["n_dropped"] == 1
    assert out[4]["text"] == "" and out[4]["n_kept"] == 0 and out[4]["n_dropped"] == 1
    # every normalized paragraph survives exactly once across the corpus
    total_kept = sum(r["n_kept"] for r in out.values())
    assert total_kept == 5  # alpha, shared boilerplate, beta, gamma, delta


def test_chunk_documents_covers_stream_with_overlap(spark):
    from hiss_cube_spark.operators.curation import chunk_documents

    toks = [f"t{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b c"), (3, "solo")], ["doc_id", "text"]
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, size=16, overlap=4).collect()
    }
    # doc 1: 50 tokens, stride 12 -> starts 0,12,24,36,48 -> 5 chunks
    assert {k for k in out if k[0] == 1} == {(1, i) for i in range(5)}
    # chunk i starts at token 12*i and holds up to 16 tokens
    for i in range(5):
        r = out[(1, i)]
        expect = toks[12 * i : 12 * i + 16]
        assert r["chunk_text"].split(" ") == expect
        assert r["n_tokens"] == len(expect)
    # consecutive chunks overlap by exactly 4 tokens
    assert out[(1, 0)]["chunk_text"].split(" ")[-4:] == out[(1, 1)][
        "chunk_text"
    ].split(" ")[:4]
    # short docs: exactly one (possibly short) chunk
    assert out[(2, 0)]["chunk_text"] == "a b c" and out[(2, 0)]["n_tokens"] == 3
    assert out[(3, 0)]["n_tokens"] == 1
    with pytest.raises(ValueError):
        chunk_documents(df, size=8, overlap=8)


def test_incremental_dedup_batch_and_index_semantics(spark):
    from hiss_cube_spark.operators.curation import build_dedup_index, incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "known text"), (2, "other known")], ["doc_id", "text"]
    )
    index = build_dedup_index(corpus)
    batch = spark.createDataFrame(
        [
            (10, "known text"),   # already in corpus -> dropped
            (11, "fresh text"),   # new -> kept
            (12, "fresh text"),   # within-batch dup, higher id -> dropped
            (13, "also fresh"),   # new -> kept
        ],
        ["doc_id", "text"],
    )
    kept = incremental_dedup(batch, index)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 13]
    # appending survivors' fingerprints makes a re-run of the same batch empty
    index2 = index.unionByName(kept.select("fp")).distinct()
    assert incremental_dedup(batch, index2).count() == 0


def test_domain_cap_deterministic_and_bounded(spark):
    from hiss_cube_spark.operators.curation import domain_cap

    rows = [(i, f"https://big.example.com/p/{i}") for i in range(20)]
    rows += [(100 + i, f"https://small.example.org/p/{i}") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = domain_cap(df, max_per_domain=5).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    # cap binds on the big domain, keeps the lowest ids; small domain intact
    assert sorted(by_dom["big.example.com"]) == [0, 1, 2, 3, 4]
    assert sorted(by_dom["small.example.org"]) == [100, 101, 102]


def test_incremental_update_example_composes(spark, sf_dir):
    import sys as _sys

    _sys.path.insert(0, "examples")
    from incremental_update import ingest_batch, maintain_snapshot

    from hiss_cube_spark.operators.curation import build_dedup_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text", "source")
    index = build_dedup_index(corpus)

    arts = ingest_batch(spark, batch, index)
    n_batch = batch.count()
    n_acc = arts["accepted"].count()
    assert 0 < n_acc <= n_batch
    # chunks only come from accepted docs
    acc_ids = {r["doc_id"] for r in arts["accepted"].select("doc_id").collect()}
    chunk_ids = {r["doc_id"] for r in arts["chunks"].select("doc_id").distinct().collect()}
    assert chunk_ids == acc_ids
    # the grown index rejects a replay of the same batch entirely
    replay = ingest_batch(spark, batch, arts["index"])
    assert replay["accepted"].count() == 0

    snap = corpus.select("doc_id", "text")
    nxt = snap.unionByName(arts["accepted"].select("doc_id", "text"))
    m = maintain_snapshot(snap, nxt)
    assert m["changelog"].where(F.col("op") != "I").count() == 0
    assert m["applied"].count() == nxt.count()
    assert m["history"].where(~F.col("is_current")).count() == 0


def test_incremental_neardup_matches_single_pass_query(spark, sf_dir):
    """The per-batch operator (`incremental_neardup` fed batch 0's folded
    index) and the registered query's single-pass shape (one corpus-wide
    feature/pair computation, batch-restricted) must make identical
    keep/drop decisions — the equivalence stream_neardup_minhash's
    docstring asserts."""
    import importlib.util

    from hiss_cube_spark.operators.curation import incremental_neardup

    spec = importlib.util.spec_from_file_location(
        "entry_eq", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.size(F.split("text", " ")) >= 3
    )
    b0 = d.where(F.col("doc_id") % 2 == 0)
    b1 = d.where(F.col("doc_id") % 2 == 1)
    sig0 = spark.createDataFrame([], "doc_id long, sig array<bigint>")
    band0 = spark.createDataFrame([], "band_id int, band_hash bigint, doc_id long")
    s0 = incremental_neardup(b0, sig0, band0, threshold=0.5)
    s0 = s0.localCheckpoint(eager=True)
    sig1 = s0.select("doc_id", "sig")
    band1 = s0.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_hash")
    ).select("band_id", "band_hash", "doc_id")
    s1 = incremental_neardup(b1, sig1, band1, threshold=0.5)
    op_ids = {r["doc_id"] for r in s0.select("doc_id").collect()} | {
        r["doc_id"] for r in s1.select("doc_id").collect()
    }

    q = m.queries()["stream_neardup_minhash"](spark, sf_dir)
    q_ids = {r["doc_id"] for r in q.collect()}
    assert op_ids == q_ids


def test_bpe_train_hand_checked_merges_and_counts(spark):
    """Toy corpus with hand-derivable merge order and token counts."""
    from hiss_cube_spark.operators.tokenizer import (
        bpe_encode_words,
        bpe_token_counts,
        train_bpe,
    )

    # words: "aa" x3, "aab" x1  (one doc per row)
    docs = spark.createDataFrame(
        [(0, "aa aa"), (1, "aa aab")], "doc_id long, text string"
    )
    # pair counts round 1: (a,a)=4, (a,</w>)=3, (a,b)=1, (b,</w>)=1 -> merge (a,a)
    # round 2: symbols "aa </w>" x3, "aa b </w>": (aa,</w>)=3, (aa,b)=1,
    #          (b,</w>)=1 -> merge (aa,</w>)
    merges = train_bpe(docs, n_merges=2, sample_docs=10)
    assert merges == [("a", "a"), ("aa", "</w>")]

    # "aa" -> ["aa</w>"] = 1 token; "aab" -> ["aa","b","</w>"] = 3 tokens
    out = {r["doc_id"]: r for r in bpe_token_counts(docs, merges).collect()}
    assert (out[0]["n_words"], out[0]["n_bpe_tokens"]) == (2, 2)
    assert (out[1]["n_words"], out[1]["n_bpe_tokens"]) == (2, 4)

    words = spark.createDataFrame([("aa",), ("aab",), ("ba",)], "w string")
    pieces = {r["w"]: r["pieces"] for r in bpe_encode_words(words, merges).collect()}
    assert pieces["aa"] == ["aa</w>"]
    assert pieces["aab"] == ["aa", "b", "</w>"]
    assert pieces["ba"] == ["b", "a", "</w>"]  # no applicable merge
    # segmentation roundtrip: concatenated pieces spell word + </w>
    for w, ps in pieces.items():
        assert "".join(ps) == w + "</w>"


def test_bpe_token_law_and_monotonicity(spark, sf_dir):
    """Zero merges => n_bpe_tokens == chars-in-words + n_words (each word is
    its characters plus the </w> marker); more merges never increase the
    token count."""
    from hiss_cube_spark.operators.tokenizer import bpe_token_counts, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    base = bpe_token_counts(docs, [])
    chars = docs.select(
        F.col("doc_id"),
        F.aggregate(
            F.filter(F.split("text", " "), lambda t: F.length(t) > 0),
            F.lit(0),
            lambda acc, w: acc + F.length(w) + 1,
        ).alias("expect"),
    )
    bad = base.join(chars, "doc_id").where(F.col("n_bpe_tokens") != F.col("expect"))
    assert bad.count() == 0

    m50 = train_bpe(docs, n_merges=50, sample_docs=50)
    m100 = train_bpe(docs, n_merges=100, sample_docs=50)
    assert m100[:50] == m50  # greedy training is prefix-stable
    t50 = bpe_token_counts(docs, m50).withColumnRenamed("n_bpe_tokens", "t50")
    t100 = bpe_token_counts(docs, m100).withColumnRenamed("n_bpe_tokens", "t100")
    grew = t50.join(t100.select("doc_id", "t100"), "doc_id").where(
        F.col("t100") > F.col("t50")
    )
    assert grew.count() == 0


def test_stratified_kfold_exact_balance(spark):
    from hiss_cube_spark.operators.curation import stratified_kfold

    rows = [(i, "en" if i % 3 else "de") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_kfold(df, "lang", k=4).collect()
    assert all(0 <= r["fold"] < 4 for r in out)
    from collections import Counter

    per = Counter((r["lang"], r["fold"]) for r in out)
    for lang, total in [("en", 66), ("de", 34)]:
        sizes = [per[(lang, f)] for f in range(4)]
        assert sum(sizes) == total
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    # deterministic under re-run
    again = stratified_kfold(df, "lang", k=4).collect()
    assert sorted((r["doc_id"], r["fold"]) for r in out) == sorted(
        (r["doc_id"], r["fold"]) for r in again
    )


def test_token_entropy_degenerate_and_uniform(spark):
    import math

    from hiss_cube_spark.operators.text_analysis import token_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["entropy"] == 0.0                      # all-same tokens
    assert abs(got[2]["entropy"] - math.log(4)) < 1e-5   # all-distinct
    assert abs(got[3]["entropy"] - math.log(2)) < 1e-5   # two even classes
    assert got[2]["n_distinct"] == 4 and got[2]["n"] == 4


def test_pmi_bigrams_prefers_exclusive_pair(spark):
    from hiss_cube_spark.operators.text_analysis import pmi_bigrams

    # "x y" always co-occur exclusively; "a b" occur often but independently
    docs = [(i, "x y " + "a b a c b d " * 3) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_bigrams(df, k=5, min_count=3).collect()
    assert (out[0]["tok_a"], out[0]["tok_b"]) == ("x", "y")
    assert out[0]["c_ab"] == 6
    assert out[0]["pmi"] > 0


def test_weighted_sample_prefers_heavy_rows_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.curation import weighted_sample

    # 500 light rows (w=1) + 100 heavy rows (w=50): heavy rows are ~50x
    # likelier per row, so they should dominate a k=100 sample
    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 500, F.lit(50)).otherwise(F.lit(1)).alias("w"),
    )
    out = weighted_sample(df, "w", k=100).collect()
    assert len(out) == 100
    assert [r["rank"] for r in out[:3]] == [1, 2, 3]
    heavy = sum(1 for r in out if r["weight"] == 50)
    assert heavy >= 60, heavy  # expectation ~85; far above uniform's ~17
    again = weighted_sample(df, "w", k=100).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)
    # zero/negative weights never selected
    z = weighted_sample(
        df.withColumn("w", F.when(F.col("doc_id") < 590, 0).otherwise(F.col("w"))),
        "w", k=100,
    ).collect()
    assert all(r["weight"] > 0 for r in z) and len(z) == 10


def test_resolve_duplicates_best_keeps_highest_score(spark):
    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.clusters import (
        resolve_duplicates,
        resolve_duplicates_best,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (10, 1.0), (99, 4.0)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    best = {r["doc_id"] for r in resolve_duplicates_best(df, pairs, "quality").collect()}
    # cluster {1,2,3}: keep 2 (quality 9); untouched docs 10, 99 survive
    assert best == {2, 10, 99}
    minid = {r["doc_id"] for r in resolve_duplicates(df, pairs).collect()}
    assert minid == {1, 10, 99}  # the policy difference, pinned
    # tie on score -> smallest id wins
    tied = spark.createDataFrame(
        [(7, 3.0), (8, 3.0)], "doc_id long, quality double"
    )
    tp = spark.createDataFrame([(7, 8)], "doc_a long, doc_b long")
    assert {r["doc_id"] for r in resolve_duplicates_best(tied, tp, "quality").collect()} == {7}


def test_compression_ratio_bands(spark):
    from hiss_cube_spark.operators.text_analysis import compression_ratio

    import random

    rng = random.Random(3)
    prose = " ".join(rng.choice("the quick brown fox jumps lazy dog table data".split())
                     for _ in range(200))
    noise = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(1000))
    df = spark.createDataFrame(
        [(1, "spam " * 300), (2, prose), (3, noise)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"] < got[3]["compression_ratio"]
    assert got[1]["compression_ratio"] < 0.05   # pure repetition collapses
    assert got[3]["compression_ratio"] > 0.7    # random text barely compresses
    assert got[2]["raw_bytes"] > got[2]["compressed_bytes"] > 0


def test_oversample_minority_reaches_target_and_passes_majority(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.curation import oversample_minority

    rows = [(i, "maj") for i in range(50)] + [(100 + i, "min") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = oversample_minority(df, target=20).collect()
    per = Counter(r["lang"] for r in out)
    assert per["maj"] == 50          # majority untouched
    assert per["min"] == 20          # minority reaches target
    maj_copies = {r["copy"] for r in out if r["lang"] == "maj"}
    assert maj_copies == {1}
    # minority: every original kept at copy 1, duplicates cycle upward
    min_rows = [(r["doc_id"], r["copy"]) for r in out if r["lang"] == "min"]
    assert sum(1 for _, c in min_rows if c == 1) == 7
    assert max(c for _, c in min_rows) == 3  # ceil(20/7)
    again = oversample_minority(df, target=20).collect()
    assert sorted((r["doc_id"], r["copy"]) for r in out if r["lang"] == "min") == sorted(
        (r["doc_id"], r["copy"]) for r in again if r["lang"] == "min"
    )


def test_canonicalize_urls_pinned(spark):
    from hiss_cube_spark.operators.curation import canonicalize_urls

    df = spark.createDataFrame(
        [
            (1, "HTTPS://WWW.Site.Example.COM/p/3/?utm_source=feed&b=2&a=1#sec"),
            (2, "https://site.example.com/p/3?a=1&b=2&utm_campaign=x"),
            (3, "http://www.other.org/Deep/Path/?z=9"),  # path case preserved
            (4, "https://plain.net/x"),
            (5, "https://plain.net/x?utm_a=1"),  # all params tracking -> none
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["canonical_url"] for r in canonicalize_urls(df).collect()}
    assert got[1] == got[2] == "https://site.example.com/p/3?a=1&b=2"
    assert got[3] == "http://other.org/Deep/Path?z=9"
    assert got[4] == got[5] == "https://plain.net/x"

    # column names that need backticks (dots) work — the implementation
    # references the column through F.col, never an interpolated SQL string
    dotted = df.withColumnRenamed("url", "page.url")
    got2 = {
        r["doc_id"]: r["canonical_url"]
        for r in canonicalize_urls(dotted, url_col="`page.url`").collect()
    }
    assert got2 == got


def test_rake_keywords_pinned(spark):
    """RAKE hand-check: in 'deep learning the deep model a fast index',
    phrases are [deep learning], [deep model], [fast index]; deg(deep)=4,
    freq=2 -> 2.0; learning/model 2/1 -> 2.0; fast/index 2/1 -> 2.0 each;
    so [deep learning]=4.0 ties [deep model]=4.0 and [fast index]=4.0 —
    first position wins."""
    from hiss_cube_spark.operators.text_analysis import rake_keywords

    df = spark.createDataFrame(
        [(1, "deep learning the deep model a fast index"),
         (2, "the solo a")],  # stopwords + one 1-word phrase
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["phrase"], r["score"]) for r in rake_keywords(df).collect()}
    assert got[1] == ("deep learning", 4.0)
    assert got[2] == ("solo", 1.0)


def test_pack_atomic_no_straddle_and_waste_bound(spark):
    """Atomic packing invariants: every doc whole in one bin (offset +
    n_tokens <= capacity for non-oversize docs), bins fill greedily
    big-first, an oversize doc gets its own bin, and per-bin loads never
    exceed capacity except for single-oversize-doc bins."""
    from hiss_cube_spark.operators.curation import pack_atomic

    df = spark.createDataFrame(
        [(i, "s", ("w " * n).strip())
         for i, n in enumerate([300, 300, 200, 100, 90, 700])],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in pack_atomic(df, capacity=512).collect()}
    # big-first order: 700 (oversize, own bin), 300, 300, 200, 100, 90
    assert out[5]["bin_id"] == 0 and out[5]["offset"] == 0      # oversize alone
    assert out[0]["bin_id"] == 1 and out[0]["offset"] == 0      # 300
    assert out[1]["bin_id"] == 2                                 # 300+300 > 512
    assert out[2]["bin_id"] == 2 and out[2]["offset"] == 300     # 300+200 fits
    assert out[3]["bin_id"] == 3                                 # 200+100 > remaining 12
    assert out[4]["bin_id"] == 3 and out[4]["offset"] == 100
    # invariant: non-oversize docs end within capacity
    for r in out.values():
        if r["n_tokens"] <= 512:
            assert r["offset"] + r["n_tokens"] <= 512
