from otterbrix_spark.streaming.pipeline import (
    events_stream,
    hourly_rollup_stream,
    run_available_now,
    run_until_count,
)

__all__ = [
    "events_stream",
    "hourly_rollup_stream",
    "run_available_now",
    "run_until_count",
]
