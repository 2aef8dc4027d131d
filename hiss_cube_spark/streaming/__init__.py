"""Structured Streaming surface (an extension — the reference is batch-only,
SURVEY.md §2.9): file-source ingest into the bronze tables and event-time
windowed aggregations. Every transformation is identical in batch and
streaming mode (same DataFrame functions), so the batch oracle validates the
streaming semantics."""

from hiss_cube_spark.streaming.joins import interval_event_join
from hiss_cube_spark.streaming.link import stream_crossmatch
from hiss_cube_spark.streaming.ann_index import (
    query_ivf_index,
    stream_ivf_refresh,
    train_ivf_centroids,
)
from hiss_cube_spark.streaming.neardup import (
    init_neardup_index,
    stream_neardup_minhash,
)
from hiss_cube_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_dedup",
    "stream_crossmatch",
    "interval_event_join",
    "init_neardup_index",
    "stream_neardup_minhash",
    "train_ivf_centroids",
    "stream_ivf_refresh",
    "query_ivf_index",
]
