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
    slice_width: int | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For every LEFT row, attach the greatest ``right_ts`` of the same
    key with ``right_ts <= left_ts`` (NULL when none precedes it).

    ``allow_exact_matches=False`` (pandas merge_asof's flag) makes the
    boundary STRICT — backward matches require ``right_ts < left_ts``,
    forward ``right_ts > left_ts``. Implementation cost: zero — only the
    tie ORDER of the union's side column flips, so a same-timestamp
    right row sorts outside the current row's frame instead of inside
    it. Supported for the one-sided directions (nearest and the
    two-pass skew path keep the default inclusive boundary).

    ``direction="forward"`` flips the match to the SMALLEST ``right_ts``
    with ``right_ts >= left_ts``; ``direction="nearest"`` picks the
    CLOSER of the two (tie -> backward) — completing pandas
    ``merge_asof``'s direction matrix. ``tolerance`` (same units as the
    ts columns) nulls out matches farther than the bound — for the
    one-sided directions a pure column postcondition, for nearest a
    per-side precondition before the choice (pandas semantics). The
    forward form is the same one-pass window sweep run with a mirrored
    frame (first-following instead of last-preceding); nearest runs both
    frames over one sorted partition (same single shuffle); the two-pass
    skew path supports backward only.

    Returns the left rows plus ``matched_ts`` (and ``matched_payload``
    when ``payload`` names a right-side column to carry).

    **Skew limit of the default path**: the single window pass partitions
    by ``key``, so one key's whole timeline serialises through one task —
    correct, but a hot key (one user with 10^9 events) is a straggler by
    construction. It needs key cardinality >> cores.

    **Two-pass skew-hardened path** (``slice_width`` set): the timeline is
    cut into fixed slices of ``slice_width`` time units (microseconds when
    the ts columns are timestamps, else the native units of the numeric ts
    column). Pass 1 runs the window sweep within each (key, slice) — a hot
    key now spreads over #slices tasks. Pass 2 fixes up slice boundaries:
    a per-(key, slice) summary frame (rows = keys x slices, tiny) computes
    each slice's carry-in (the latest right row of any earlier slice) with
    a per-key window over slices, and left rows that found no within-slice
    match coalesce onto the carry-in — the same two-level trick as the
    p04 sub-shard prefix sums.
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
    if not allow_exact_matches and direction not in ("backward", "forward"):
        raise ValueError(
            "allow_exact_matches=False supports backward/forward only"
        )
    if slice_width is not None:
        if direction != "backward":
            raise ValueError("two-pass skew path supports backward only")
        if not allow_exact_matches:
            raise ValueError(
                "two-pass skew path keeps the inclusive boundary"
            )
        out = _as_of_two_pass(unioned, key, left_ts, payload, slice_width)
        return _apply_tolerance(out, left_ts, payload, direction, tolerance)
    if direction == "nearest":
        # the third merge_asof direction: the CLOSER of the at-or-before
        # and at-or-after matches (tie -> backward). ONE sorted window
        # partition serves both frames — Spark reuses the sort, so this
        # costs the same single shuffle as either one-sided sweep. A
        # right row exactly at a left row's time sorts before it (side
        # asc) and is seen only by the backward frame; that match has
        # gap 0, which dominates anything forward could offer, so the
        # asymmetry never changes the result. Tolerance applies PER SIDE
        # before choosing (pandas semantics: nearest within tolerance).
        return _as_of_nearest(unioned, key, left_ts, payload, tolerance)
    if direction == "forward":
        # rows sort by (key, time, side DESC): a left row at time T comes
        # BEFORE a right row at the same T, so ties match (>= semantics).
        # first(ignorenulls) over the following frame picks the nearest
        # right row at-or-after.
        # strict (>): flip the tie order — a right row at the same T
        # sorts BEFORE the left row, outside the following frame
        tie = F.col("_side").desc() if allow_exact_matches else F.col("_side")
        w = (
            Window.partitionBy(key)
            .orderBy("_t", tie)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first
    else:
        # rows sort by (key, time, side): a right row at time T precedes a
        # left row at the same T, so ties match (<= semantics).
        # last(ignorenulls) carries the most recent right time forward.
        # strict (<): flip the tie order — a right row at the same T
        # sorts AFTER the left row, outside the preceding frame
        tie = F.col("_side") if allow_exact_matches else F.col("_side").desc()
        w = (
            Window.partitionBy(key)
            .orderBy("_t", tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last
    carried = unioned.withColumn(
        "matched_ts",
        pick(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w),
    )
    if payload:
        carried = carried.withColumn(
            "matched_payload",
            pick(
                F.when(F.col("_side") == 0, F.col("_rpay")), ignorenulls=True
            ).over(w),
        )
    out = carried.filter(F.col("_side") == 1).withColumnRenamed("_t", left_ts)
    drop = ["_side"] + (["_rpay"] if payload else [])
    return _apply_tolerance(out.drop(*drop), left_ts, payload, direction, tolerance)


def _as_of_nearest(
    unioned: DataFrame,
    key: str,
    left_ts: str,
    payload: str | None,
    tolerance: int | None,
) -> DataFrame:
    """Nearest-direction sweep over the tagged union (see as_of_join):
    backward and forward candidates from two frames over ONE sorted
    partition, then a per-row choice of the closer (tie -> backward)."""
    wb = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    right_t = F.when(F.col("_side") == 0, F.col("_t"))
    carried = unioned.withColumn(
        "_bwd", F.last(right_t, ignorenulls=True).over(wb)
    ).withColumn("_fwd", F.first(right_t, ignorenulls=True).over(wf))
    if payload:
        right_p = F.when(F.col("_side") == 0, F.col("_rpay"))
        carried = carried.withColumn(
            "_bpay", F.last(right_p, ignorenulls=True).over(wb)
        ).withColumn("_fpay", F.first(right_p, ignorenulls=True).over(wf))
    out = carried.filter(F.col("_side") == 1)
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if isinstance(out.schema["_t"].dataType, (TimestampType, TimestampNTZType)):
        t = F.unix_micros(F.col("_t"))
        b, f = F.unix_micros(F.col("_bwd")), F.unix_micros(F.col("_fwd"))
    else:
        t, b, f = F.col("_t"), F.col("_bwd"), F.col("_fwd")
    bgap, fgap = t - b, f - t
    b_ok = F.col("_bwd").isNotNull() & (
        F.lit(True) if tolerance is None else bgap <= F.lit(tolerance)
    )
    f_ok = F.col("_fwd").isNotNull() & (
        F.lit(True) if tolerance is None else fgap <= F.lit(tolerance)
    )
    use_b = (b_ok & f_ok & (bgap <= fgap)) | (b_ok & ~f_ok)
    out = out.withColumn(
        "matched_ts",
        F.when(use_b, F.col("_bwd")).when(f_ok, F.col("_fwd")),
    )
    drop = ["_side", "_bwd", "_fwd"]
    if payload:
        out = out.withColumn(
            "matched_payload",
            F.when(use_b, F.col("_bpay")).when(f_ok, F.col("_fpay")),
        )
        drop += ["_bpay", "_fpay", "_rpay"]
    return out.withColumnRenamed("_t", left_ts).drop(*drop)


def _apply_tolerance(
    out: DataFrame,
    left_ts: str,
    payload: str | None,
    direction: str,
    tolerance: int | None,
) -> DataFrame:
    """Null out matches farther than ``tolerance`` from the left row —
    a pure column postcondition on the already-computed nearest match."""
    if tolerance is None:
        return out
    from pyspark.sql.types import TimestampType, TimestampNTZType

    # timestamp ts columns: difference is an interval, not comparable to an
    # integer tolerance — compare in epoch microseconds instead (tolerance
    # is then in microseconds, the documented unit for timestamp inputs)
    if isinstance(out.schema[left_ts].dataType, (TimestampType, TimestampNTZType)):
        m, l = F.unix_micros("matched_ts"), F.unix_micros(F.col(left_ts))
    else:
        m, l = F.col("matched_ts"), F.col(left_ts)
    gap = m - l if direction == "forward" else l - m
    # _ok materialised FIRST: the payload when() must test the original
    # matched_ts, not the one already nulled by the previous withColumn
    out = out.withColumn("_ok", gap <= F.lit(tolerance)).withColumn(
        "matched_ts", F.when(F.col("_ok"), F.col("matched_ts"))
    )
    if payload:
        out = out.withColumn(
            "matched_payload", F.when(F.col("_ok"), F.col("matched_payload"))
        )
    return out.drop("_ok")


def _as_of_two_pass(
    unioned: DataFrame,
    key: str,
    left_ts: str,
    payload: str | None,
    slice_width: int,
) -> DataFrame:
    """Skew-hardened as-of sweep over the tagged union (see as_of_join).

    Correctness: within a slice, pass 1 is exactly the single-pass sweep
    restricted to the slice. A left row with no within-slice match takes
    the carry-in — the latest right row of any strictly earlier slice,
    whose time is < its slice end <= the left row's slice start <= left
    time, so the <= ordering always holds; and any right row the carry-in
    skips over would have been in the left row's own slice, where pass 1
    wins via coalesce precedence.
    """
    dt = dict(unioned.dtypes)["_t"]
    if dt.startswith(("timestamp", "date")):
        slice_expr = F.expr(
            f"unix_micros(CAST(_t AS TIMESTAMP)) DIV {slice_width}"
        )
    else:
        slice_expr = F.expr(f"CAST(_t AS BIGINT) DIV {slice_width}")
    sliced = unioned.withColumn("_slice", slice_expr)

    # pass 1: the standard sweep, but partitioned by (key, slice) — a hot
    # key's timeline spreads over as many tasks as it spans slices
    w1 = (
        Window.partitionBy(key, "_slice")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = sliced.withColumn(
        "_m_ts",
        F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w1),
    )
    if payload:
        carried = carried.withColumn(
            "_m_pay",
            F.last(
                F.when(F.col("_side") == 0, F.col("_rpay")), ignorenulls=True
            ).over(w1),
        )

    # pass 2: boundary fix-up on a keys x slices summary frame. Every
    # (key, slice) seen on either side appears (a left-only slice still
    # needs its carry-in); slices with no right rows carry NULL summaries
    # that last(ignorenulls) skips.
    right_agg = [F.max("_t").alias("_last_rt")]
    if payload:
        right_agg.append(F.expr("max_by(_rpay, _t)").alias("_last_rpay"))
    rs = (
        sliced.filter(F.col("_side") == 0)
        .groupBy(key, "_slice")
        .agg(*right_agg)
    )
    slices = sliced.select(key, "_slice").distinct()
    summ = slices.join(rs, [key, "_slice"], "left")
    wprev = (
        Window.partitionBy(key)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_cols = [
        F.col(key),
        F.col("_slice"),
        F.last("_last_rt", ignorenulls=True).over(wprev).alias("_carry_ts"),
    ]
    if payload:
        carry_cols.append(
            F.last("_last_rpay", ignorenulls=True).over(wprev).alias("_carry_pay")
        )
    carry = summ.select(*carry_cols)

    lefts = carried.filter(F.col("_side") == 1).join(
        carry, [key, "_slice"], "left"
    )
    out = lefts.withColumn(
        "matched_ts", F.coalesce(F.col("_m_ts"), F.col("_carry_ts"))
    )
    drop = ["_side", "_slice", "_m_ts", "_carry_ts"]
    if payload:
        out = out.withColumn(
            "matched_payload", F.coalesce(F.col("_m_pay"), F.col("_carry_pay"))
        )
        drop += ["_rpay", "_m_pay", "_carry_pay"]
    return out.withColumnRenamed("_t", left_ts).drop(*drop)


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
