"""Gap-based sessionization — a custom stateful operator beyond built-in
Spark windows.

Batch path: the classic gaps-and-islands formulation with window functions
(lag + cumulative sum of gap-breaks) — pure JVM expressions, one shuffle on
the entity key.

Streaming path: `applyInPandasWithState` with per-key timeout state — the
Structured Streaming recipe for operators the built-in windowed aggregations
cannot express (session windows whose end is data-dependent).

Scale notes: both paths partition by the entity key; state size is one open
session per key. The batch plan is a single hash-partitioned window — no
driver involvement, no UDF in the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T


def _ts_us(col):
    """unix_micros over either TIMESTAMP or TIMESTAMP_NTZ (cast via UTC)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_minutes``.

    Returns the input plus `session_seq` (0-based per-key session index).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | ((_ts_us(F.col(ts_col)) - _ts_us(prev_ts)) > gap_us)
    ).cast("int")
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session summary: (key, session_seq, n_events, start_us, end_us,
    duration_us)."""
    s = sessionize(events, key_col, ts_col, gap_minutes)
    return s.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        _ts_us(F.min(ts_col)).alias("start_us"),
        _ts_us(F.max(ts_col)).alias("end_us"),
        (_ts_us(F.max(ts_col)) - _ts_us(F.min(ts_col))).alias(
            "duration_us"
        ),
    )


# --- streaming variant: applyInPandasWithState ------------------------------

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)


def streaming_sessionize(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Stateful session assembly over a stream keyed by user_id.

    Each micro-batch folds its events into per-key state (open session id,
    last-seen timestamp); sessions are emitted when closed by a
    gap-exceeding event. A production pipeline would also use the state
    timeout to flush idle sessions; with availableNow testing the final
    open session per key remains in state by design.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            session_seq, last_us, n_events, start_us = state.get
        else:
            session_seq, last_us, n_events, start_us = -1, None, 0, None

        closed = []
        for pdf in pdf_iter:
            for us in sorted(pdf["us"].tolist()):
                if last_us is None or us - last_us > gap_us:
                    if last_us is not None:
                        closed.append(
                            (user_id, session_seq, n_events, start_us, last_us)
                        )
                    session_seq += 1
                    n_events = 0
                    start_us = us
                n_events += 1
                last_us = us
        state.update((session_seq, last_us, n_events, start_us))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_seq", "n_events", "start_us", "end_us"],
            )

    prepared = stream.select(
        "user_id", _ts_us(F.col("ts")).alias("us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
