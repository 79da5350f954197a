"""Structured Streaming tests: the streaming hourly rollup over the events
corpus (availableNow trigger) must agree with the batch j08 aggregation —
the micro-batch-vs-batch equivalence that the reference's push-based
pipeline tests (`test_streaming_match.cpp` etc.) assert for its operators."""

from __future__ import annotations

import uuid

from otterbrix_spark.streaming import (
    events_stream,
    hourly_rollup_stream,
    run_available_now,
)
from otterbrix_spark.workload import load_all


def test_streaming_rollup_matches_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    assert stream.isStreaming
    rollup = hourly_rollup_stream(stream)
    name = f"rollup_{uuid.uuid4().hex[:8]}"
    result = run_available_now(rollup, name)

    batch = load_all()["j08_hourly_rollup"].spark_fn(spark, sf_dir)

    got = {
        (r["hour_start"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in result.collect()
    }
    want = {
        (r["hour_start"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_filter_pipeline(spark, sf_dir):
    # the reference README's "real-time filtering" shape: stream -> filter ->
    # projection -> sink
    from pyspark.sql import functions as F

    stream = events_stream(spark, sf_dir).filter(F.col("value") > 150).select(
        "event_id", "event_type", "value"
    )
    name = f"filt_{uuid.uuid4().hex[:8]}"
    result = run_available_now(stream, name, output_mode="append")
    n_stream = result.count()

    from otterbrix_spark.sources.registry import load_table

    n_batch = (
        load_table(spark, sf_dir, "events").filter(F.col("value") > 150).count()
    )
    assert n_stream == n_batch > 0


def test_streaming_sessionize_timeout_flush_equals_batch(spark, sf_dir):
    """With ProcessingTimeTimeout flushing, closed + flushed streaming
    sessions must equal the batch sessionization EXACTLY (finals included):
    after the input is exhausted, idle state times out and each key's last
    open session is emitted."""
    from otterbrix_spark.operators.sessionize import (
        session_stats,
        streaming_sessionize,
    )
    from otterbrix_spark.sources.registry import load_table
    from otterbrix_spark.streaming import events_stream, run_until_count

    batch = session_stats(load_table(spark, sf_dir, "events"), gap_minutes=30)
    batch_rows = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in batch.collect()
    }

    stream = events_stream(spark, sf_dir)
    sessions = streaming_sessionize(stream, gap_minutes=30, idle_timeout_ms=2000)
    name = f"flush_{uuid.uuid4().hex[:8]}"
    result = run_until_count(sessions, name, target_rows=len(batch_rows), timeout_s=120)

    stream_rows = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in result.collect()
    }
    assert stream_rows == batch_rows
