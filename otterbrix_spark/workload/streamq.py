"""Oracle-gated STREAMING queries: each gate executes a real Structured
Streaming pipeline (file source -> event-time windows/watermark -> memory
sink, `availableNow` trigger) and is certified against the same DuckDB
batch SQL as every batch gate — the streaming graph must reproduce the
batch answer over the same corpus bit-for-bit.

This is the round-4 "streaming correctness certification": the reference's
streaming is micro-batch pipelining of ordinary queries (SURVEY.md §2.11;
reference `components/physical_plan/operators/operator.hpp:149-158`
pipeline roles), so batch-equivalence over a bounded corpus is exactly its
correctness contract. Watermarks only ever DROP data that arrives later
than the bound; with `availableNow` over a static corpus nothing is late,
so the streaming result must equal the batch aggregate.

Scale notes: the gate runs the identical graph a production deployment
would run against a landing directory — file-split micro-batches, state in
the state store, partial+final hash aggregation per window. Nothing here
collects to the driver beyond the memory sink the driver itself reads.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from otterbrix_spark.streaming.pipeline import (
    events_stream,
    hourly_rollup_stream,
    run_available_now,
)
from otterbrix_spark.workload import query

# Hourly event-time rollup: counts + quantised value sums per
# (hour, event_type). The oracle is the batch formulation over the same
# parquet — identical to the streaming graph's semantics because the
# availableNow run sees the whole (bounded) corpus before any watermark
# could expire a window.
_S03_ORACLE = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS total_value
FROM events
GROUP BY 1, 2
"""


@query(
    "s03_streaming_hourly_rollup", _S03_ORACLE,
    doc="streaming certification: event-time hourly rollup with watermark, "
        "availableNow over the corpus, hash-matched against the batch SQL",
)
def s03(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    rollup = hourly_rollup_stream(stream)
    name = f"s03_rollup_{uuid.uuid4().hex[:8]}"
    result = run_available_now(rollup, name, output_mode="complete")
    return result.select(
        F.col("hour_start").cast("timestamp").alias("hour_start"),
        "event_type",
        "n",
        "total_value",
    )
