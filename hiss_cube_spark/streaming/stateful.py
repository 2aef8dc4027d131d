"""Custom stateful streaming operator via ``applyInPandasWithState``.

The canonical example the engine ships: a per-key running aggregator
(count + decimal-safe sum + last event time) that survives across
micro-batches — the primitive for streaming dedup counters, rate trackers,
and incremental ivw accumulation. Works on any keyed stream with an
event-time column; in batch tests it runs under availableNow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "running_totals",
    "streaming_topk",
    "streaming_ewma",
    "streaming_sessionizer",
    "streaming_spacesaving",
]

_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("last", LongType()),
    ]
)


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Stateful per-key running totals over a (possibly streaming) DataFrame.

    Each micro-batch folds its rows into the key's persisted state and emits
    the updated totals — the structured-streaming analog of a keyed
    accumulator. Use ``.writeStream.outputMode("update")``. Output columns:
    (<key_col>, n_events, sum_value, last_ts_us), the key keeping its input
    name and type.
    """
    out_schema = StructType(
        [
            events.schema[key_col],
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("last_ts_us", LongType()),
        ]
    )

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
            if len(pdf):
                last = max(last, int(pdf[ts_us_col].max()))
        state.update((n, s, last))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [s], "last_ts_us": [last]}
        )

    return (
        events.select(key_col, value_col, ts_us_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_topk(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 3,
) -> DataFrame:
    """Streaming per-key top-``k`` rows by ``value_col``, exact across the
    whole stream: every micro-batch folds its rows into the key's persisted
    buffer (never more than ``k`` entries per key) and re-emits the key's
    current top-k. State is O(k) per key forever — the streaming analog of
    the batch `w_rank_topk` window. Output: (key, rank, oid, v).

    Implemented on ``applyInPandasWithState`` with the buffer flattened
    into two array columns (this container lacks the protobuf runtime the
    ``transformWithStateInPandas`` state server requires; that API's
    ListState is the drop-in upgrade — same fold, buffer rows stored
    unflattened).
    """
    state_schema = StructType(
        [
            StructField("oids", ArrayType(LongType())),
            StructField("vs", ArrayType(DoubleType())),
        ]
    )
    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("rank", IntegerType()),
            StructField("oid", LongType()),
            StructField("v", DoubleType()),
        ]
    )

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        oids, vs = state.get if state.exists else ([], [])
        items = list(zip(oids, vs))
        for pdf in pdfs:
            items.extend(
                zip(pdf[id_col].astype("int64"), pdf[value_col].astype("float64"))
            )
        # deterministic: value desc, id asc tiebreak
        items = sorted(items, key=lambda t: (-t[1], t[0]))[:k]
        state.update(([int(t[0]) for t in items], [float(t[1]) for t in items]))
        yield pd.DataFrame(
            {
                "key": [int(key[0])] * len(items),
                "rank": list(range(1, len(items) + 1)),
                "oid": [t[0] for t in items],
                "v": [t[1] for t in items],
            }
        )

    return (
        events.select(key_col, id_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            _fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)


def streaming_ewma(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Streaming per-key EWMA (α = 1/2), exact across micro-batches: the
    persisted state is just (current ewma, last ts, n seen) — O(1) per key
    forever — and each batch folds its rows in (ts, id) order through
    ``y = (x + y_prev) / 2``, the same recursion the batch `ts_ewma` query
    evaluates in closed form. Emits the key's updated (ewma, n_seen,
    last_ts_us) every micro-batch (``update`` output mode).

    Late rows older than the state's last timestamp violate the fold order;
    they are counted in ``n_late`` instead of folded — pair with an
    upstream ``withWatermark`` to bound them.
    """
    state_schema = StructType(
        [
            StructField("ewma", DoubleType()),
            StructField("last", LongType()),
            StructField("n", LongType()),
            StructField("late", LongType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("ewma", DoubleType()),
            StructField("n_seen", LongType()),
            StructField("n_late", LongType()),
            StructField("last_ts_us", LongType()),
        ]
    )

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ewma, last, n, late = (
            state.get if state.exists else (None, -(1 << 62), 0, 0)
        )
        rows = []
        for pdf in pdfs:
            rows.extend(
                zip(
                    pdf[ts_us_col].astype("int64"),
                    pdf[id_col].astype("int64"),
                    pdf[value_col].astype("float64"),
                )
            )
        rows.sort()
        for ts, _, x in rows:
            if ts < last:
                late += 1
                continue
            ewma = x if ewma is None else (x + ewma) / 2
            last = int(ts)
            n += 1
        state.update((ewma, last, n, late))
        yield pd.DataFrame(
            {
                "key": [int(key[0])],
                "ewma": [ewma],
                "n_seen": [n],
                "n_late": [late],
                "last_ts_us": [last],
            }
        )

    return (
        events.select(key_col, id_col, value_col, ts_us_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            _fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessionizer(
    events: DataFrame,
    gap_us: int = 1_800_000_000,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful sessionizer with EXPLICIT state timeout: events fold
    into the key's open session while gaps stay under ``gap_us``; a larger
    gap (or a processing-time timeout firing with no new data) CLOSES the
    session and emits its summary — unlike the built-in
    ``session_window``, the closed-session row carries custom state
    (event count, decimal-safe value sum, first/last ts) and the timeout
    path emits sessions for keys that simply went quiet, which a
    window-aggregation can only do via watermark advance.

    State per key is O(1): (session_start, last_ts, n, sum). Output rows
    are CLOSED sessions only (use outputMode("append")). The timeout is
    ``GroupStateTimeout.ProcessingTimeTimeout`` with a 1s horizon so
    availableNow batch tests flush trailing sessions on the final empty
    trigger.
    """
    out_schema = StructType(
        [
            events.schema[key_col],
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", LongType()),
            StructField("last", LongType()),
            StructField("n", LongType()),
            StructField("s", DoubleType()),
        ]
    )

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, s = state.get
                closed.append((key[0], start, last, n, s))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                rows.extend(
                    (int(t), float(v))
                    for t, v in zip(pdf[ts_us_col], pdf[value_col])
                )
            rows.sort()
            start, last, n, s = state.get if state.exists else (None, None, 0, 0.0)
            for t, v in rows:
                if start is None:
                    start, last, n, s = t, t, 1, v
                elif t - last > gap_us:
                    closed.append((key[0], start, last, n, s))
                    start, last, n, s = t, t, 1, v
                else:
                    last, n, s = max(last, t), n + 1, s + v
            if start is not None:
                state.update((start, last, n, s))
                state.setTimeoutDuration(1000)
        yield pd.DataFrame(
            closed,
            columns=[key_col, "session_start", "session_end", "n_events", "sum_value"],
        )

    return (
        events.select(key_col, ts_us_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_spacesaving(
    events: DataFrame,
    key_col: str = "k",
    k: int = 8,
    shards: int = 4,
) -> DataFrame:
    """SpaceSaving heavy-hitter DISCOVERY as a stateful stream — the
    streaming form of `operators/quality_checks.spacesaving_summaries`:
    keys hash into ``shards`` disjoint state groups (xxhash64, so every
    occurrence of a key lands in ONE group's state forever), and each
    group folds its micro-batch value_counts into ``k`` persisted
    counters with the batched SpaceSaving update (hit → +c; room →
    insert; full → evict min, insert at min+c). State is O(k) per shard
    FOREVER — the bounded-memory property that makes the sketch a
    sketch.

    Because shards partition the key space, per-shard SpaceSaving
    theorems are global facts: any key with TOTAL count > n_shard/k is
    among its shard's counters (so certainly any key with count >
    N_total/k), est ≥ true, est − true ≤ min_counter ≤ n_shard/k.
    The suite asserts exactly these, plus checkpoint replay.

    Emits each shard's full current summary every micro-batch
    (``update`` mode): (shard, key, est, min_c, n_shard).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    kk, nsh = int(k), int(shards)
    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("key", StringType()),
            StructField("est", LongType()),
            StructField("min_c", LongType()),
            StructField("n_shard", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("keys", ArrayType(StringType())),
            StructField("ests", ArrayType(LongType())),
            StructField("n", LongType()),
        ]
    )

    def _fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        keys, ests, n = state.get if state.exists else ([], [], 0)
        counters = dict(zip(list(keys), list(ests)))
        for pdf in pdfs:
            vc = pdf["_k"].value_counts()
            n += int(vc.sum())
            for kx, c in vc.items():
                c = int(c)
                if kx in counters:
                    counters[kx] += c
                elif len(counters) < kk:
                    counters[kx] = c
                else:
                    mk = min(counters, key=lambda x: (counters[x], x))
                    m = counters.pop(mk)
                    counters[kx] = m + c
        state.update((list(counters.keys()), list(counters.values()), n))
        min_c = 0 if len(counters) < kk else min(counters.values())
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "key": list(counters.keys()),
                "est": list(counters.values()),
                "min_c": [min_c] * len(counters),
                "n_shard": [n] * len(counters),
            }
        )

    # NULL keys are excluded up front (same contract as the batch
    # spacesaving_summaries): a null would shard-assign (xxhash64(null)
    # is a constant) yet vanish from value_counts, silently deflating
    # n_shard and the per-shard heavy threshold derived from it.
    return (
        events.where(F.col(key_col).isNotNull())
        .select(
            F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(nsh))
            .cast("long")
            .alias("_shard"),
            F.col(key_col).cast("string").alias("_k"),
        )
        .groupBy("_shard")
        .applyInPandasWithState(
            _fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
