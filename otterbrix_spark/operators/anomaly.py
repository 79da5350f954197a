"""Streaming running-mean anomaly detection — a second custom STATEFUL
operator beyond sessionize (`operators/sessionize.py`), showing the
applyInPandasWithState recipe for detectors whose per-event verdict
depends on ALL prior events of the key.

Rule (integer-exact so the batch oracle can hash-match): an event is
anomalous when the key has seen at least ``min_prior`` earlier events and
``q * n_prior > factor * sum_prior`` — i.e. the quantised value exceeds
``factor``x the running mean of everything before it. Cross-multiplied
integers, no division, no float drift.

State per key: (n_prior, sum_prior) — two BIGINTs, O(1) per key at any
scale; the verdict stream is append-mode and feeds any downstream sink.
Batch twin: the same rule as one cumulative window
(ROWS UNBOUNDED PRECEDING .. 1 PRECEDING), which is also the DuckDB
oracle formulation — one operator, two execution models, one truth
(the s03/s04 certification pattern).

Ordering: events fold in (ts, event_id) order WITHIN each micro-batch;
cross-batch order follows arrival. Batch-equivalence therefore holds when
the bounded corpus arrives as one availableNow batch (the certification
harness pins this) — the same contract as any at-least-once detector
replayed from a log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_prior", T.LongType()),
        T.StructField("sum_prior", T.LongType()),
    ]
)

ANOMALY_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("is_anomaly", T.IntegerType()),
    ]
)


def streaming_anomalies(
    stream: DataFrame, min_prior: int = 10, factor: int = 2
) -> DataFrame:
    """Per-event anomaly verdicts over a stream keyed by event_type:
    (event_type, event_id, is_anomaly)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    columns = ["event_type", "event_id", "is_anomaly"]

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        (event_type,) = key
        n_prior, sum_prior = state.get if state.exists else (0, 0)
        # the iterator delivers the key's rows as MULTIPLE Arrow chunks
        # (arrow.maxRecordsPerBatch) in arbitrary shuffle order — sorting
        # per chunk would fold locally-sorted runs out of global time
        # order; concatenate first, sort the whole micro-batch once
        chunks = [pdf for pdf in pdf_iter]
        if not chunks:
            state.update((n_prior, sum_prior))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["us", "event_id"]
        )
        out = []
        for event_id, q in zip(pdf["event_id"], pdf["q"]):
            flag = int(
                n_prior >= min_prior and q * n_prior > factor * sum_prior
            )
            out.append((event_type, int(event_id), flag))
            n_prior += 1
            sum_prior += int(q)
        state.update((n_prior, sum_prior))
        if out:
            yield pd.DataFrame(out, columns=columns)

    prepared = stream.select(
        "event_type",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        F.floor(F.col("value") * F.lit(10000.0)).cast("long").alias("q"),
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=ANOMALY_OUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_anomalies(
    events: DataFrame, min_prior: int = 10, factor: int = 2
) -> DataFrame:
    """The batch twin: one cumulative window per key — identical verdicts
    to the streaming fold over the same (ts, event_id)-ordered corpus."""
    from pyspark.sql import Window

    q = F.floor(F.col("value") * F.lit(10000.0)).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.expr("unix_micros(CAST(ts AS TIMESTAMP))"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior_n = F.count(F.lit(1)).over(w)
    prior_s = F.coalesce(F.sum("q").over(w), F.lit(0))
    return (
        events.withColumn("q", q)
        .withColumn(
            "is_anomaly",
            (
                (prior_n >= min_prior)
                & (F.col("q") * prior_n > factor * prior_s)
            ).cast("int"),
        )
        .select("event_type", "event_id", "is_anomaly")
    )
