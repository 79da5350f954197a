from otterbrix_spark.streaming.pipeline import (
    events_stream,
    hourly_rollup_stream,
    run_available_now,
    run_until_count,
    stream_static_enrich,
    stream_stream_join,
    union_streams,
)

__all__ = [
    "events_stream",
    "hourly_rollup_stream",
    "run_available_now",
    "run_until_count",
    "stream_static_enrich",
    "stream_stream_join",
    "union_streams",
]
