"""Temporal join operators Spark lacks natively — as-of join and
bounded-interval range join — in their scale-stable DataFrame forms.

Both are classic time-series engine operators (kdb's `aj`, TimescaleDB /
QuestDB ASOF, Flink interval joins). Spark has no built-in; the naive
formulations are scale bugs (an inequality-only join lowers to
BroadcastNestedLoopJoin — O(n*m) pair evaluation), so each operator here
is the standard reformulation that stays equi-join/window shaped:

* ``as_of_join``: union the two sides tagged, ONE window pass per key
  ordered by (time, tag) carrying the last left-side time forward —
  O(n log n) per key partition, one shuffle, no pairwise matching. This
  is the sort-merge as-of plan every time-series engine implements
  natively, expressed in DataFrame ops.

* ``interval_join``: expand each interval into the fixed-width time
  buckets it covers (bounded by ``max_hours``), equi-join events on the
  bucket, then apply the exact BETWEEN filter. Turns the inequality join
  into an equi-join with a small constant expansion factor — the standard
  range-bucketing trick (Flink/Spark SQL range-join hints do the same
  internally). A plan audit asserts no BroadcastNestedLoopJoin survives.

Reference anchor: the reference engine has no temporal join operators
(its join surface is `components/physical_plan/operators/join` —
nested-loop + hash equi-join only, SURVEY.md §2.3); these belong to the
time-series extension layer this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: str | None = None,
) -> DataFrame:
    """For every LEFT row, attach the greatest ``right_ts`` of the same
    key with ``right_ts <= left_ts`` (NULL when none precedes it).

    Returns the left rows plus ``matched_ts`` (and ``matched_payload``
    when ``payload`` names a right-side column to carry).
    """
    lt = left.select(
        F.col(key),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
    )
    rcols = [F.col(key), F.col(right_ts).alias("_t"), F.lit(0).alias("_side")]
    unioned = lt.unionByName(
        right.select(*rcols, F.col(payload).alias("_rpay"))
        if payload
        else right.select(*rcols),
        allowMissingColumns=True,
    )
    # rows sort by (key, time, side): a right row at time T precedes a left
    # row at the same T, so ties match (<= semantics). last(ignorenulls)
    # carries the most recent right time/payload forward within the key.
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "matched_ts",
        F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w),
    )
    if payload:
        carried = carried.withColumn(
            "matched_payload",
            F.last(
                F.when(F.col("_side") == 0, F.col("_rpay")), ignorenulls=True
            ).over(w),
        )
    out = carried.filter(F.col("_side") == 1).withColumnRenamed("_t", left_ts)
    drop = ["_side"] + (["_rpay"] if payload else [])
    return out.drop(*drop)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str,
    start_ts: str,
    end_ts: str,
    keys: list[str | tuple[str, str]] | None = None,
    bucket_hours: int = 24,
    max_hours: int | None = None,
) -> DataFrame:
    """Join events to intervals with ``start <= ts <= end`` without a
    nested-loop plan: intervals explode into the ``bucket_hours``-wide
    time buckets they overlap, events compute their single bucket, the
    two sides equi-join on (keys..., bucket), and the exact BETWEEN
    predicate filters the candidates.

    ``max_hours`` (defaults to ``bucket_hours``) bounds the per-interval
    expansion: an interval longer than that raises rather than silently
    exploding — the caller picks the bucket width to match the data.
    """
    max_hours = max_hours or bucket_hours
    bucket_us = bucket_hours * 3_600_000_000
    ev_us = F.unix_micros(F.col(event_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))

    iv = intervals.withColumn("_s_us", s_us).withColumn("_e_us", e_us)
    # hard stop on unbounded expansion (scale guard): a too-long interval
    # fails the job with a clear message instead of silently exploding.
    # The check lives INSIDE the bucket expression — a free-standing
    # assert column would be pruned away by the optimizer and never run.
    max_us = max_hours * 3_600_000_000
    iv = iv.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"_s_us DIV {bucket_us}"),
                F.expr(
                    f"CASE WHEN _e_us - _s_us <= {max_us} "
                    f"THEN _e_us DIV {bucket_us} "
                    f"ELSE raise_error('interval longer than "
                    f"max_hours={max_hours}') END"
                ),
            )
        ),
    )
    # integer DIV, not double division: epoch-us magnitudes are exactly
    # representable but a float quotient can truncate off-by-one at exact
    # bucket boundaries
    evb = events.withColumn("_ev_us", ev_us).withColumn(
        "_bucket", F.expr(f"_ev_us DIV {bucket_us}")
    )
    on: list[Column] = [evb["_bucket"] == iv["_bucket"]]
    for k in keys or []:
        # a (event_col, interval_col) pair sidesteps self-join ambiguity
        # when both sides derive from the same source frame
        ek, ik = (k, k) if isinstance(k, str) else k
        on.append(evb[ek] == iv[ik])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    joined = evb.join(iv, cond).filter(
        (F.col("_ev_us") >= F.col("_s_us")) & (F.col("_ev_us") <= F.col("_e_us"))
    )
    return joined
