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


def streaming_sessionize(
    stream: DataFrame, gap_minutes: int = 30, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Stateful session assembly over a stream keyed by user_id.

    Each micro-batch folds its events into per-key state (open session id,
    last-seen timestamp); sessions are emitted when closed by a
    gap-exceeding event.

    With ``idle_timeout_ms`` set, idle open sessions are FLUSHED via
    ``GroupStateTimeout.ProcessingTimeTimeout``: when a key sees no events
    for the timeout span, its open session is emitted and the state becomes
    a tombstone (session counter + last timestamp, no open session) so a
    returning key continues its session numbering; a second idle timeout
    removes the tombstone entirely, bounding state for dead keys at
    2x the timeout. Without it (None), final open sessions stay in state —
    the availableNow testing mode.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    columns = ["user_id", "session_seq", "n_events", "start_us", "end_us"]

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key

        if idle_timeout_ms is not None and state.hasTimedOut:
            session_seq, last_us, n_events, start_us = state.get
            if n_events:
                # flush the idle open session; keep a tombstone so the seq
                # counter survives a returning key
                state.update((session_seq, last_us, 0, None))
                state.setTimeoutDuration(idle_timeout_ms)
                yield pd.DataFrame(
                    [(user_id, session_seq, n_events, start_us, last_us)],
                    columns=columns,
                )
            else:
                state.remove()  # second idle span: drop the tombstone
            return

        if state.exists:
            session_seq, last_us, n_events, start_us = state.get
        else:
            session_seq, last_us, n_events, start_us = -1, None, 0, None

        closed = []
        for pdf in pdf_iter:
            for us in sorted(pdf["us"].tolist()):
                if last_us is None or us - last_us > gap_us or n_events == 0:
                    if n_events:
                        closed.append(
                            (user_id, session_seq, n_events, start_us, last_us)
                        )
                    session_seq += 1
                    n_events = 0
                    start_us = us
                n_events += 1
                last_us = us
        state.update((session_seq, last_us, n_events, start_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=columns)

    prepared = stream.select(
        "user_id", _ts_us(F.col("ts")).alias("us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
