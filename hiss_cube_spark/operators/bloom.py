"""Bloom-filter join pruning: drop fact rows that cannot match the dim side
*before* the join shuffle.

The classic big-join optimization (Spark's own runtime row-group filters,
`InjectRuntimeFilter`, do the same thing behind AQE, but only for eligible
shuffle joins and without a user-controllable handle; the SQL surface of
this build does not expose ``bloom_filter_agg``). This operator builds the
filter with plain DataFrame aggregation — ``xxhash64`` positions, one
``bit_or`` per 64-bit word — so the whole construction is JVM-native and
engine-portable.

Scale shape: the build side aggregates k·|dim| hash positions down to
``num_bits/64`` longs (one narrow shuffle on the word index); the resulting
bit array is a few KB–MB and ships to executors as a *literal*, so the
probe side is a pure native-expression filter inside whole-stage codegen —
no join, no broadcast exchange, no Python. The driver collect is bounded by
``num_bits`` (not by data), same legitimacy argument as the PQ codebook
sample. False positives are removed by the real join that follows; false
negatives are impossible, so results are identical to the plain join — the
oracle for any query using this is the join without the bloom.

At 100 TB: a 4M-bit filter (512 KB) over a 1M-key dim prunes a fact scan at
~1% false-positive rate before any exchange — the shuffle shrinks by the
fact's non-matching fraction, which for selective dims is nearly all of it.
For dims too large for a useful in-literal bloom (≫10⁸ keys), fall back to
a semi-join (Catalyst already pushes those through shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom_words", "might_contain", "bloom_prune_join"]


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def build_bloom_words(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> list[int]:
    """Aggregate ``dim[key_col]`` into a bloom bit-set, returned as
    ``num_bits/64`` little-endian words (index ``pos // 64``, bit
    ``pos % 64``). ``num_bits`` must be a multiple of 64."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("p")
    words = (
        dim.select(pos)
        .groupBy((F.col("p") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(
                # shiftleft with a *column* shift amount (the python helper
                # only takes int literals)
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.pmod(F.col("p"), F.lit(64)).cast("int"),
                )
            ).alias("bits")
        )
        .collect()  # bounded: ≤ num_bits/64 rows regardless of data size
    )
    out = [0] * (num_bits // 64)
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def might_contain(
    key: Column, words: list[int], num_hashes: int = 5
) -> Column:
    """Native-expression bloom membership test against a literal word array
    (stays inside whole-stage codegen; no join, no Python)."""
    num_bits = len(words) * 64
    wlit = F.lit(words)
    cond = None
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(wlit, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, F.pmod(p, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1).cast("long")) == 1
        cond = bit if cond is None else cond & bit
    return cond


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` with a bloom pre-filter on the fact side.

    Result is identical to the plain join (the join removes the bloom's
    false positives); the win is that non-matching fact rows never enter
    the join exchange.
    """
    words = build_bloom_words(dim, dim_key, num_bits, num_hashes)
    pruned = fact.where(might_contain(F.col(fact_key), words, num_hashes))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
