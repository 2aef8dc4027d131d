"""Every declared query must match its DuckDB oracle (the driver's t2 gate).

Runs at sf0.001 by default (fast); set HCS_TEST_SF_DIR=/root/testdata/sf0.01
to replicate the driver's exact scale.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connection

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()

# Queries whose oracle pins measured-deterministic golden values at the
# driver's check SF (0.01): seeded-KMeans cell occupancies, ANN recall@k,
# BPE token totals, pixel means, the organic pHash pair. At other SFs the
# pins are definitionally wrong, so this sf0.001 suite runs them against
# sf0.01 (tools/parity_full.py and the driver check the same thing there).
_PINNED_AT_SF001 = "/root/testdata/sf0.01"
_PINNED_SF_QUERIES = {
    "ann_lsh_topk", "ann_pq_topk", "ann_ivf_pq_topk", "stream_ann_refresh",
    "text_bpe_tokens", "mm_phash_neardup", "mm_image_pipeline",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_pinned():
    con = duck_connection(_PINNED_AT_SF001)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, duck_pinned, name):
    if name in _PINNED_SF_QUERIES and sf_dir != _PINNED_AT_SF001:
        compare(
            _QUERIES[name](spark, _PINNED_AT_SF001),
            duck_pinned,
            _ORACLE[name],
            name,
        )
        return
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLE:
        # rows-only contract for non-SQL-expressible operators
        assert df.count() >= 0
        return
    compare(df, duck, _ORACLE[name], name)


def test_token_frequencies_pinned(spark):
    from hiss_cube_spark.operators.text_analysis import token_frequencies

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b  c"), (3, "a")], "doc_id long, text string"
    )
    got = {r["token"]: r["n"] for r in token_frequencies(df).collect()}
    assert got == {"a": 3, "b": 2, "c": 1}
    top = token_frequencies(df, k=2).collect()
    assert [(r["token"], r["n"]) for r in top] == [("a", 3), ("b", 2)]


def test_tfidf_top_terms_pinned(spark):
    import math

    from hiss_cube_spark.operators.text_analysis import tfidf_top_terms

    # 'rare' appears only in doc 1 (idf=ln(4/2)); 'common' in all 3 (idf=ln(1)=0)
    df = spark.createDataFrame(
        [(1, "rare common rare"), (2, "common x"), (3, "common y")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["rnk"]): (r["token"], r["score"]) for r in tfidf_top_terms(df, k=1).collect()}
    tok, score = out[(1, 1)]
    assert tok == "rare"
    assert score == round(math.floor(2 * math.log(4 / 2) * 1e6) / 1e6, 6)
    # docs 2/3: every term scores 0 or ln(4/2); x and y are unique → win
    assert out[(2, 1)][0] == "x" and out[(3, 1)][0] == "y"


def test_bigram_lm_score_pinned(spark):
    from hiss_cube_spark.operators.text_analysis import bigram_lm_score

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    # corpus bigrams: d1 (a,b)(b,a)(a,b), d2 (a,c); c(a)=3, c(b)=1; V=3
    p_b_a = (2 + 0.5) / (3 + 0.5 * 3)   # P(b|a)
    p_a_b = (1 + 0.5) / (1 + 0.5 * 3)   # P(a|b)
    p_c_a = (1 + 0.5) / (3 + 0.5 * 3)   # P(c|a)
    assert got[1]["n_bigrams"] == 3
    assert got[1]["lm_score"] == round((2 * p_b_a + p_a_b) / 3, 6)
    assert got[2]["lm_score"] == round(p_c_a, 6)
    assert 3 not in got  # single-token docs have no bigrams
