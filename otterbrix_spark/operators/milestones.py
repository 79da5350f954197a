"""Per-key milestone detection — a third custom stateful streaming operator
(after the sessionizer and anomaly scorer): emit (key, milestone,
event_id) when a key's cumulative event count crosses a threshold, i.e.
the event that IS the user's 1st / 10th / 100th / 1000th.

Deterministic under the time-sorted landing contract (README §streaming,
certified by s07): micro-batches ascend in event time and the fold sorts
within a batch by (ts, event_id), so "the n-th event of this user" is a
total order both engines agree on. State is ONE integer per live key.

Two implementations of the same semantics:

- :func:`milestone_stream` — ``applyInPandasWithState`` (GroupState tuple),
  the API every Spark 3.x/4.x deployment has. This is the gated path.
- :func:`milestone_stream_tws` — Spark 4's ``transformWithStateInPandas``
  (named ValueState handles in the RocksDB state store). The state-server
  protocol needs ``google.protobuf``, which this container lacks, so the
  path is availability-gated exactly like the Avro reader
  (:func:`tws_available`); on a stock PySpark 4 install with protobuf it
  runs the identical fold. Requires
  ``spark.sql.streaming.stateStore.providerClass =
  RocksDBStateStoreProvider``.

Reference anchor: custom stateful pipeline stages
(`components/physical_plan/operators/operator.hpp:149-158` pipeline roles).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

MILESTONES = (1, 10, 100, 1000)
_OUT_SCHEMA = "user_id long, milestone long, event_id long"


def _crossings(user_id, batch: "pd.DataFrame", prev: int):
    """Milestone rows crossed by appending ``batch`` (sorted) after
    ``prev`` events: the m-th event overall sits at 0-based index
    m - prev - 1 of this batch when prev < m <= prev + len(batch)."""
    out = []
    for m in MILESTONES:
        if prev < m <= prev + len(batch):
            out.append(
                {
                    "user_id": user_id,
                    "milestone": m,
                    "event_id": int(batch["event_id"].iloc[m - prev - 1]),
                }
            )
    return out


def milestone_stream(events: "DataFrame") -> "DataFrame":
    """(user_id, milestone, event_id) crossings via applyInPandasWithState —
    GroupState holds the single running count per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(
            ["ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        prev = state.get[0] if state.exists else 0
        rows = _crossings(user_id, batch, prev)
        state.update((prev + len(batch),))
        if rows:
            yield pd.DataFrame(rows)

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_OUT_SCHEMA,
            stateStructType="cnt long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_available() -> bool:
    """True when the transformWithState Python state-server can run here
    (its wire protocol imports google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def milestone_stream_tws(events: "DataFrame") -> "DataFrame":
    """Same crossings through Spark 4's transformWithStateInPandas
    (named ValueState in the RocksDB state store). See module docstring
    for the availability gate."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MilestoneProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState("cnt", "cnt BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            batch = pd.concat(list(rows), ignore_index=True)
            if len(batch) == 0:
                return
            batch = batch.sort_values(
                ["ts", "event_id"], kind="mergesort"
            ).reset_index(drop=True)
            prev = self._cnt.get()[0] if self._cnt.exists() else 0
            rows_out = _crossings(key[0], batch, prev)
            self._cnt.update((prev + len(batch),))
            if rows_out:
                yield pd.DataFrame(rows_out)

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=MilestoneProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
