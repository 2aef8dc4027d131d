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
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["running_totals"]

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
