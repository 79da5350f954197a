"""Structured Streaming pipelines — the Spark-first superset of the
reference's "streaming".

The reference's streaming is push-based batch pipelining of ordinary queries
(`pipeline_role {source, streaming, sink}` —
`components/physical_plan/operators/operator.hpp:149-158`); it has no
event-time semantics, watermarks, or windows (SURVEY.md §2.11). Its README
use case — "real-time filtering of streaming data" — is micro-batch ingestion,
which maps directly onto `readStream -> same DataFrame graph -> writeStream`.

We therefore expose the engine's aggregations as streaming pipelines with
real event-time windows + watermarks (strictly more capable than the
reference), and test them with `availableNow` triggers so the streaming graph
processes the same corpus as the batch path and must agree with it.

Scale notes: file-source micro-batches scale by splitting input files;
watermark state lives in the state store (RocksDB on a real cluster); the
window aggregation is the same partial+final hash agg as the batch plan.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from otterbrix_spark.sources.registry import normalize_event_ts


@contextlib.contextmanager
def bounded_state_width(spark: SparkSession):
    """Pin the stateful-operator partition count for a streaming query
    started inside the block (round-13 optimization, guide §2.2/§5).

    Stateful operators read ``spark.sql.shuffle.partitions`` ONCE at query
    start and bake it into the checkpoint; every micro-batch then runs one
    task AND one state-store instance per partition, each with per-batch
    version/commit maintenance. Inheriting the ambient width is wrong in
    both directions: a 32-wide session spends ~12x longer per micro-batch
    on store maintenance than the data needs (measured on the s15
    stream-stream outer join at sf0.01: addBatch 43.3s -> 1.6s, stream
    wall 98s -> 8.5s at width 8), and a 200-wide driver session is worse.
    A production deployment sizes state partitions to STATE VOLUME when
    it creates the checkpoint — this helper does the same for the bounded
    certification corpora: at least 8, at most a quarter of the cores,
    never raising an already-smaller session setting, overridable via
    ``OTX_STREAM_STATE_PARTITIONS``. Resuming an existing checkpoint is
    unaffected (Spark reads the recorded partition count from the
    checkpoint, not the session).

    Restored in ``finally``; batch queries planned outside the block are
    untouched. The streaming gates run sequentially (driver correctness,
    tests), so the brief session-conf toggle has no concurrent reader.
    """
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, "8")
    env = os.environ.get("OTX_STREAM_STATE_PARTITIONS")
    cores = spark.sparkContext.defaultParallelism
    width = int(env) if env else min(int(prev), max(8, cores // 4))
    try:
        spark.conf.set(key, str(width))
        yield
    finally:
        spark.conf.set(key, prev)


@dataclass(frozen=True)
class StreamStateStats:
    """State-store metrics aggregated over every progress report of a
    bounded (availableNow) run. ``max_rows_total`` is the PEAK concurrent
    state rows across micro-batches — the bounded-state certification
    metric; ``rows_removed`` is summed watermark evictions — the proof
    that eviction actually fired (not just that the final report was
    empty)."""

    max_rows_total: int
    rows_removed: int
    rows_dropped_late: int = 0


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet, ``ts`` normalised to a
    session-UTC timestamp whatever physical form the generator wrote.

    File streams require an explicit schema; rather than hard-coding one
    generator era's layout (the round-3 bug: an int64-nanos assumption met
    a ``timestamp[us]`` file and silently produced 1970 windows), probe the
    actual file schema with a batch footer read — one driver-side metadata
    call, no data scan — and reuse ``normalize_event_ts`` so batch and
    streaming ingest cannot diverge again.
    """
    # the file stream source requires a directory; select the events file
    # out of the corpus dir with a glob (a real deployment points this at a
    # landing directory that accumulates micro-batch files). Corpora where
    # events.parquet is itself a DIRECTORY of part files (Spark-written,
    # e.g. the scaling probe's replicated copies) stream that directory
    # directly — the glob filter matches leaf file NAMES, so it would
    # silently match nothing against part-*.parquet files.
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        # availableNow splits the backlog into batches of maxFilesPerTrigger
        # files; operators whose batch-equivalence needs the whole bounded
        # corpus in ONE event-time pass (stream-stream joins: a later batch
        # carrying older timestamps would arrive behind the advanced
        # watermark and be evicted) pass a bound >= the corpus file count
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isdir(path):
        raw = reader.load(path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    return normalize_event_ts(raw)


def hourly_rollup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window rollup with late-data watermark — the
    streaming twin of workload j08 (counts + quantised value sums)."""
    q = F.floor(F.col("value") * F.lit(10000.0)).cast("long")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(q).alias("qsum"))
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n",
            (F.col("qsum").cast("double") / F.lit(10000.0)).alias("total_value"),
        )
    )


def run_available_now(
    df: DataFrame, name: str, timeout_s: float = 120.0, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming frame over all currently-available input
    (micro-batch catch-up), collect into an in-memory sink, return the
    result table. This is the bounded-execution harness the tests use."""
    return run_available_now_counted(df, name, timeout_s, output_mode)[0]


# run_available_now_counted returns (result, batches_with_input,
# StreamStateStats) — see the dataclass and the function docstring for the
# state-metric semantics the dedup certification (s09) relies on.


def run_until_count(
    df: DataFrame,
    name: str,
    target_rows: int,
    timeout_s: float = 120.0,
    trigger_ms: int = 500,
) -> DataFrame:
    """Execute a streaming frame with a ProcessingTime trigger until the
    in-memory sink reaches ``target_rows`` (or timeout), then stop.

    Unlike availableNow, the query keeps running EMPTY micro-batches after
    the input is exhausted — which is what lets ProcessingTimeTimeout state
    timeouts fire and flush idle sessions."""
    spark = df.sparkSession
    with bounded_state_width(spark):
        query = (
            df.writeStream.trigger(processingTime=f"{trigger_ms} milliseconds")
            .format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
    deadline = time.time() + timeout_s
    try:
        while time.time() < deadline:
            if spark.table(name).count() >= target_rows:
                break
            time.sleep(0.5)
        else:
            raise TimeoutError(
                f"streaming query {name}: sink never reached {target_rows} rows"
            )
    finally:
        query.stop()
        query.awaitTermination()
    return _detach_sink(spark, name)


def run_available_now_counted(
    df: DataFrame,
    name: str,
    timeout_s: float = 120.0,
    output_mode: str = "complete",
) -> tuple[DataFrame, int, "StreamStateStats"]:
    """``run_available_now`` that also reports how many micro-batches
    actually carried input rows — the multi-batch certification gates
    (s07) assert on it: a run that collapsed into one batch would
    vacuously pass the batch-equality check without exercising
    cross-batch state merge.

    Returns ``(result, batches_with_input, state_stats)``: the third
    element aggregates state-store metrics across EVERY progress report
    (``max_rows_total`` = peak concurrent state rows, ``rows_removed`` =
    summed evictions). The dedup certification (s09) asserts on it to
    prove watermark eviction actually happened; availableNow's final
    micro-batch is often empty and reports zero state rows, so reading
    only the last report would pass that check vacuously."""
    with bounded_state_width(df.sparkSession):
        query = (
            df.writeStream.trigger(availableNow=True)
            .format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )
    _await_bounded(query, name, timeout_s)
    n_batches = sum(
        1 for p in query.recentProgress if _progress_rows(p) > 0
    )
    stats = StreamStateStats(
        max_rows_total=max(
            (_state_metric(p, "numRowsTotal") for p in query.recentProgress),
            default=0,
        ),
        rows_removed=sum(
            _state_metric(p, "numRowsRemoved") for p in query.recentProgress
        ),
        rows_dropped_late=sum(
            _state_metric(p, "numRowsDroppedByWatermark", default=0)
            for p in query.recentProgress
        ),
    )
    return _detach_sink(df.sparkSession, name), n_batches, stats


def _await_bounded(query, name: str, timeout_s: float) -> None:
    deadline = time.time() + timeout_s
    while query.isActive and time.time() < deadline:
        time.sleep(0.2)
    if query.isActive:
        query.stop()
        raise TimeoutError(f"streaming query {name} did not finish in {timeout_s}s")
    query.awaitTermination()


def _progress_rows(p):  # StreamingQueryProgress: attribute in 4.x, dict in older
    try:
        return p.numInputRows
    except (AttributeError, TypeError):
        return p["numInputRows"]


def _state_metric(p, metric, default=None):
    try:
        ops = p.stateOperators
    except (AttributeError, TypeError):
        ops = p["stateOperators"]
    total = 0
    for op in ops:
        try:
            total += getattr(op, metric)
        except (AttributeError, TypeError):
            try:
                total += op[metric]
            except KeyError:
                if default is None:
                    raise
                total += default
    return total


def run_available_now_to_files(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_s: float = 120.0,
) -> tuple[int, int, list[int]]:
    """One availableNow pass into a parquet FILE sink with a durable
    checkpoint; returns ``(batches_with_input, input_rows, batch_ids)``
    — ``batch_ids`` is every batch id the pass executed, so restart
    certifications can assert that a resume REPLAYED the batch whose
    commit marker was removed (s21/s23 pattern).

    Unlike the memory-sink harness this SURVIVES restart: re-invoking
    with the same checkpoint resumes from the recorded source offsets
    (already-committed files are not re-read), recovers operator state
    (watermark, dedup keys) from the state store, and the file sink's
    ``_spark_metadata`` commit log keeps the output exactly-once even if
    a batch was interrupted mid-write — the production recovery contract
    the restart certification (s10) exercises. Read the output back with
    a plain ``spark.read.parquet(out_dir)``: the batch reader honours
    the commit log, so orphan files from an uncommitted batch are
    invisible."""
    with bounded_state_width(df.sparkSession):
        query = (
            df.writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start()
        )
    _await_bounded(query, out_dir, timeout_s)
    progress = query.recentProgress
    n_batches = sum(1 for p in progress if _progress_rows(p) > 0)
    input_rows = sum(_progress_rows(p) for p in progress)
    batch_ids = [p["batchId"] for p in progress if "batchId" in p]
    return n_batches, input_rows, batch_ids


def _detach_sink(spark: SparkSession, name: str) -> DataFrame:
    """Materialise a memory-sink table off the driver and drop the view.

    The memory sink holds every emitted row in DRIVER memory for the
    session's lifetime; gates create a fresh uuid-named sink per run, so
    repeated runs (driver batteries, scale probes) accumulate corpus-sized
    tables until the heap pressure bleeds into unrelated queries (observed
    as a 22x false scale reading). localCheckpoint moves the rows to
    executor block storage (spillable, ContextCleaner-collected once the
    returned frame is garbage) and the temp view is dropped immediately."""
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the static (or
    slowly-refreshed) dimension — the Spark form of the reference's
    streaming join over a pipelined source + materialized side
    (`integration/cpp/test/test_streaming_join.cpp` inner/left sections,
    incl. left-join null padding). The static side broadcasts per batch;
    no state store is involved, so it scales exactly like the batch join."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: both sides are unbounded; matches are
    constrained to an event-time band so the state store can evict rows
    older than the watermark (`test_streaming_join.cpp` cross-batch
    matching, expressed with the bounded-state semantics Spark requires —
    an UNBOUNDED stream-stream join cannot evict and is a scale bug, so
    the band is mandatory, not optional).

    Expects both inputs to carry event-time column ``ts``; emits one row
    per (left row, right row) pair with right.ts in [left.ts, left.ts +
    within]."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND r.ts >= l.ts "
            f"AND r.ts <= l.ts + INTERVAL {within}"
        ),
    )


def union_streams(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION of two streaming pipelines into one sink
    (`test_streaming_join.cpp` union_distinct_sinks; distinct-ness over an
    unbounded union needs watermark+dropDuplicates downstream — callers
    dedup per key with ``dropDuplicates`` scoped by the watermark)."""
    return a.unionByName(b)


def stream_dedup(
    stream: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once projection of an at-least-once stream: drop redelivered
    rows by key while their first arrival is still within the watermark.

    The LLM-ingest twin of batch exact dedup (llm/dedup.exact_dedup): file
    and queue sources redeliver on retry, so the first streaming stage of a
    corpus pipeline is a keyed tombstone filter. `dropDuplicatesWithinWatermark`
    keeps one state-store entry per key and EVICTS it once event time passes
    the watermark — bounded state at any scale, unlike plain
    `dropDuplicates` on a stream (which retains every key forever).

    Semantics: a duplicate arriving within `watermark` of the first copy is
    dropped; one arriving later than that may re-emit (its state is gone).
    That is the standard trade — dedup horizon == watermark delay — and the
    redelivery window of real queues (seconds-minutes) sits far inside it.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )
