"""Structured Streaming tests: the streaming hourly rollup over the events
corpus (availableNow trigger) must agree with the batch j08 aggregation —
the micro-batch-vs-batch equivalence that the reference's push-based
pipeline tests (`test_streaming_match.cpp` etc.) assert for its operators."""

from __future__ import annotations

import uuid

import pytest

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


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data discipline: an event arriving after the watermark has
    passed its window must be DROPPED from the append-mode aggregate (the
    semantics SURVEY §2.11 promises for late data; the reference's
    push-based pipeline has no event-time, so this is the Spark-first
    superset behaviour). Two micro-batches (maxFilesPerTrigger=1): batch 1
    advances the watermark; batch 2 carries one too-late event (must not
    count) and one in-time event (must count)."""
    import os
    import time
    import uuid as _uuid

    from pyspark.sql import Row, functions as F

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    base_us = 1_600_002_000_000_000  # hour-aligned event-time anchor (µs)
    hour_us = 3_600_000_000

    def write_file(name: str, rows: list[tuple[int, int]]) -> None:
        df = spark.createDataFrame(
            [Row(event_id=i, ts_us=ts) for i, ts in rows]
        ).select(
            "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts")
        ).coalesce(1)
        df.write.mode("overwrite").parquet(os.path.join(landing, name))

    # batch 1: three events in hour 0 and one in hour 5 — max event time
    # hour 5 sets the watermark to hour 4 under a 1-hour delay, which takes
    # effect from batch 2 on (watermarks commit at batch boundaries)
    write_file("b1", [(1, base_us), (2, base_us + 1), (3, base_us + 2),
                      (4, base_us + 5 * hour_us)])
    time.sleep(1.1)  # file order = modification time order
    # batch 2: an in-time hour-5 event; the hour-0 window (end < watermark)
    # finalises and its state evicts at this boundary
    write_file("b2", [(6, base_us + 5 * hour_us + 1)])
    time.sleep(1.1)
    # batch 3: one event back in hour 0 (LATE: watermark passed hour 4 two
    # batches ago — must be dropped) plus a far-future flush event so every
    # interesting window closes and append mode emits it
    write_file("b3", [(5, base_us + 3), (7, base_us + 20 * hour_us)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("window.start")).alias("win"), "n")
    )
    name = f"late_{_uuid.uuid4().hex[:8]}"
    result = run_available_now(agg, name, output_mode="append")
    counts = {r["win"]: r["n"] for r in result.collect()}
    hour0 = base_us // 1_000_000
    hour5 = hour0 + 5 * 3600
    # hour-0 window: the 3 on-time events only — the late event 5 is dropped
    assert counts[hour0] == 3
    # hour-5 window: both events (the second arrived within the watermark)
    assert counts[hour5] == 2


def test_stream_static_join_inner_and_left_padding(spark, sf_dir):
    # reference test_streaming_join.cpp: inner join correctness + left join
    # null padding, re-expressed as Spark stream-static joins (the static
    # side broadcasts per micro-batch; no state store)
    from pyspark.sql import functions as F

    from otterbrix_spark.sources.registry import load_table
    from otterbrix_spark.streaming import stream_static_enrich

    dim = spark.createDataFrame(
        [("view", 1), ("click", 5)], "event_type string, weight int"
    )  # deliberately missing 'purchase' -> left join must null-pad
    stream = events_stream(spark, sf_dir).select("event_id", "event_type")

    inner = stream_static_enrich(stream, dim, "event_type", "inner")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    got_inner = run_available_now(inner, name, output_mode="append")
    batch = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    want_inner = batch.join(dim, "event_type", "inner").count()
    assert got_inner.count() == want_inner > 0

    left = stream_static_enrich(stream, dim, "event_type", "left")
    name2 = f"ssl_{uuid.uuid4().hex[:8]}"
    got_left = run_available_now(left, name2, output_mode="append")
    assert got_left.count() == batch.count()  # every stream row survives
    padded = got_left.filter(F.col("weight").isNull())
    # exactly the rows whose type is absent from the dim are null-padded
    assert padded.count() == batch.filter(
        ~F.col("event_type").isin("view", "click")
    ).count() > 0
    assert {r["event_type"] for r in padded.select("event_type").distinct().collect()} \
        .isdisjoint({"view", "click"})


def test_stream_stream_join_matches_batch_band_join(spark, sf_dir):
    # stream-stream inner join with an event-time band (the bounded-state
    # form): view->click pairs per user within 30 minutes must equal the
    # identical batch band join
    from pyspark.sql import functions as F

    from otterbrix_spark.sources.registry import load_table
    from otterbrix_spark.streaming import stream_stream_join

    def side(df, typ):
        return df.filter(F.col("event_type") == typ).select(
            "user_id", "event_id", "ts"
        )

    stream = events_stream(spark, sf_dir)
    joined = stream_stream_join(
        side(stream, "view"), side(stream, "click"), "user_id",
        within="30 minutes",
    ).select(
        F.col("l.event_id").alias("view_id"), F.col("r.event_id").alias("click_id")
    )
    name = f"s2s_{uuid.uuid4().hex[:8]}"
    got = run_available_now(joined, name, output_mode="append")

    ev = load_table(spark, sf_dir, "events")
    bl = side(ev, "view").alias("l")
    br = side(ev, "click").alias("r")
    want = bl.join(
        br,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts "
            "AND r.ts <= l.ts + INTERVAL 30 minutes"
        ),
    ).count()
    assert got.count() == want > 0


def test_union_streams_distinct_sink(spark, sf_dir):
    # reference test_streaming_join.cpp union_distinct_sinks: two pipelines
    # union into one sink; per-key dedup via watermark-scoped dropDuplicates
    from pyspark.sql import functions as F

    from otterbrix_spark.sources.registry import load_table
    from otterbrix_spark.streaming import union_streams

    stream = events_stream(spark, sf_dir)
    a = stream.filter(F.col("value") > 180).select("event_id", "ts")
    b = stream.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    unioned = union_streams(a, b).withWatermark("ts", "2 hours").dropDuplicates(
        ["event_id"]
    )
    name = f"uni_{uuid.uuid4().hex[:8]}"
    got = run_available_now(unioned, name, output_mode="append")

    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.filter((F.col("value") > 180) | (F.col("event_type") == "purchase"))
        .select("event_id")
        .distinct()
        .count()
    )
    assert got.count() == want > 0


def test_stream_dedup_within_watermark_equals_batch_distinct(spark, tmp_path):
    """At-least-once -> exactly-once: event_id-keyed streaming dedup over
    three micro-batches with cross-batch redeliveries must equal batch
    DISTINCT of the same files. Redeliveries all land within the watermark
    horizon, so the state-store tombstones catch every one."""
    import os
    import time
    import uuid as _uuid

    from pyspark.sql import Row, functions as F

    from otterbrix_spark.streaming.pipeline import run_available_now, stream_dedup

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    base_us = 1_600_002_000_000_000
    minute_us = 60_000_000

    def write_file(name: str, rows: list[tuple[int, int, str]]) -> None:
        df = spark.createDataFrame(
            [Row(event_id=i, ts_us=ts, payload=p) for i, ts, p in rows]
        ).select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "payload",
        ).coalesce(1)
        df.write.mode("overwrite").parquet(os.path.join(landing, name))

    # batch 1: four originals
    write_file("b1", [(1, base_us, "a"), (2, base_us + minute_us, "b"),
                      (3, base_us + 2 * minute_us, "c"),
                      (4, base_us + 3 * minute_us, "d")])
    time.sleep(1.1)
    # batch 2: redelivers 2 and 3 (same key, same event time — a queue
    # retry), plus one new event
    write_file("b2", [(2, base_us + minute_us, "b"),
                      (3, base_us + 2 * minute_us, "c"),
                      (5, base_us + 4 * minute_us, "e")])
    time.sleep(1.1)
    # batch 3: redelivers 5, new event 6
    write_file("b3", [(5, base_us + 4 * minute_us, "e"),
                      (6, base_us + 5 * minute_us, "f")])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/*")
    )
    deduped = stream_dedup(stream, ["event_id"], watermark="1 hour")
    name = f"dedup_{_uuid.uuid4().hex[:8]}"
    result = run_available_now(deduped, name, output_mode="append")
    got = sorted((r["event_id"], r["payload"]) for r in result.collect())
    batch = sorted(
        (r["event_id"], r["payload"])
        for r in spark.read.parquet(landing + "/*")
        .dropDuplicates(["event_id"])
        .collect()
    )
    assert got == batch == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "f")
    ]


def test_stream_stream_join_evicts_state_at_watermark(spark, tmp_path):
    """Bounded-state certification for the banded stream-stream join: the
    event-time band + watermark must let the state store EVICT rows once
    the watermark passes them — the property that makes the join runnable
    on an unbounded stream. Three micro-batches (maxFilesPerTrigger=1):
    batch 1's pairs sit in hour 0; batch 2 jumps to hour 10, advancing the
    watermark far past hour 0; batch 3 triggers another boundary so the
    eviction is recorded. Asserts both the join RESULT (hour-0 and hour-10
    pairs, nothing across) and numRowsRemoved > 0 in the state operator's
    progress — a join that never evicts is a scale bug even when its
    output is right."""
    import os
    import time as _time
    import uuid as _uuid

    from pyspark.sql import Row, functions as F

    from otterbrix_spark.streaming import stream_stream_join

    landing = str(tmp_path / "landing_s2s")
    os.makedirs(landing)
    base_us = 1_600_002_000_000_000
    hour_us = 3_600_000_000

    def write_file(name, rows):
        df = spark.createDataFrame(
            [Row(user_id=u, event_type=t, ts_us=ts) for u, t, ts in rows]
        ).select(
            "user_id", "event_type",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
        ).coalesce(1)
        df.write.mode("overwrite").parquet(os.path.join(landing, name))

    # batch 1: a view+click pair within the 30-min band, hour 0
    write_file("b1", [(1, "view", base_us), (1, "click", base_us + 60_000_000)])
    _time.sleep(1.1)
    # batch 2: a pair at hour 10 — watermark (2h delay) leaps past hour 0
    write_file("b2", [(2, "view", base_us + 10 * hour_us),
                      (2, "click", base_us + 10 * hour_us + 60_000_000)])
    _time.sleep(1.1)
    # batch 3: far-future singleton; the boundary flushes evictions
    write_file("b3", [(9, "view", base_us + 30 * hour_us)])

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/*")
    )

    def side(typ):
        return stream.filter(F.col("event_type") == typ).select("user_id", "ts")

    joined = stream_stream_join(
        side("view"), side("click"), "user_id", within="30 minutes"
    ).select(F.col("l.user_id").alias("uid"))

    name = f"s2s_evict_{_uuid.uuid4().hex[:8]}"
    query = (
        joined.writeStream.trigger(availableNow=True)
        .format("memory").queryName(name).outputMode("append").start()
    )
    query.awaitTermination(120)
    progress = list(query.recentProgress)
    query.stop()

    got = sorted(r["uid"] for r in spark.table(name).collect())
    assert got == [1, 2]  # in-band pairs only, none across hours

    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in progress
        for op in p.get("stateOperators", [])
    )
    assert removed > 0, (
        "watermark never evicted join state: "
        f"{[p.get('stateOperators') for p in progress]}"
    )


def test_streaming_anomalies_match_batch_twin(spark, sf_dir):
    # the stateful fold and the batch cumulative window must agree
    # verdict-for-verdict over the same bounded corpus
    from otterbrix_spark.operators.anomaly import (
        batch_anomalies,
        streaming_anomalies,
    )
    from otterbrix_spark.sources.registry import load_table
    from otterbrix_spark.streaming.pipeline import run_available_now

    stream = events_stream(spark, sf_dir)
    name = f"s06t_{uuid.uuid4().hex[:8]}"
    got = {
        (r["event_type"], r["event_id"]): r["is_anomaly"]
        for r in run_available_now(
            streaming_anomalies(stream), name, output_mode="append"
        ).collect()
    }
    want = {
        (r["event_type"], r["event_id"]): r["is_anomaly"]
        for r in batch_anomalies(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert got == want and sum(got.values()) > 0


# --- milestone operator: applyInPandasWithState + transformWithState twin ----


def test_milestone_batch_semantics(spark, tmp_path):
    """The fold's crossing arithmetic, checked directly on pandas frames."""
    import pandas as pd

    from otterbrix_spark.operators.milestones import MILESTONES, _crossings

    batch = pd.DataFrame(
        {"event_id": list(range(100, 125)), "ts": list(range(25))}
    )
    # prev=0: crossings at the 1st and 10th rows
    rows = _crossings(7, batch, 0)
    assert [(r["milestone"], r["event_id"]) for r in rows] == [
        (1, 100), (10, 109)]
    # prev=95: the 100th overall event is this batch's 5th row
    rows = _crossings(7, batch, 95)
    assert [(r["milestone"], r["event_id"]) for r in rows] == [(100, 104)]
    assert MILESTONES == (1, 10, 100, 1000)


def test_milestone_tws_twin_matches(spark, sf_dir):
    """transformWithState twin equals the applyInPandasWithState path.

    Availability-gated like the Avro reader: the TWS Python state server
    imports google.protobuf, absent in this container; on a stock
    PySpark 4 + protobuf install this test runs both paths and compares.
    """
    from otterbrix_spark.operators.milestones import tws_available

    if not tws_available():
        pytest.skip("transformWithState needs google.protobuf (not installed)")

    import uuid

    from otterbrix_spark.operators.milestones import (
        milestone_stream,
        milestone_stream_tws,
    )
    from otterbrix_spark.streaming.pipeline import (
        events_stream,
        run_available_now,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    a = run_available_now(
        milestone_stream(events_stream(spark, sf_dir)),
        f"ms_a_{uuid.uuid4().hex[:8]}", output_mode="append")
    b = run_available_now(
        milestone_stream_tws(events_stream(spark, sf_dir)),
        f"ms_b_{uuid.uuid4().hex[:8]}", output_mode="append")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
