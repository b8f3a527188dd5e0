from eynollah_spark.streaming.jobs import (
    stream_events,
    stream_minute_rollup,
    stream_sessionize,
    stream_extract_spans,
    stream_dedup_docs,
    stream_near_dup_docs,
    stream_incremental_dedup,
)

__all__ = [
    "stream_events",
    "stream_minute_rollup",
    "stream_sessionize",
    "stream_extract_spans",
    "stream_dedup_docs",
    "stream_near_dup_docs",
    "stream_incremental_dedup",
]
