"""Edge-case tests for the temporal join operators — the corpus-backed
oracle gates (aj01/rj01) cover bulk behaviour; these pin the boundary
semantics: ties at equal timestamps, rows with no preceding match,
payload carry, exact interval endpoints, bucket-boundary spanning, and
the over-long-interval guard."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from otterbrix_spark.operators.temporal import as_of_join, interval_join


def _frame(spark, rows, schema):
    return spark.createDataFrame([Row(**r) for r in rows], schema=schema)


def test_asof_tie_at_equal_ts_matches(spark):
    left = _frame(spark, [{"k": 1, "t": 100}], "k long, t long")
    right = _frame(spark, [{"k": 1, "t": 100}], "k long, t long")
    out = as_of_join(left, right, key="k", left_ts="t", right_ts="t").collect()
    assert out[0]["matched_ts"] == 100  # <= semantics: equal ts matches


def test_asof_no_preceding_row_is_null(spark):
    left = _frame(spark, [{"k": 1, "t": 50}], "k long, t long")
    right = _frame(spark, [{"k": 1, "t": 100}], "k long, t long")
    out = as_of_join(left, right, key="k", left_ts="t", right_ts="t").collect()
    assert out[0]["matched_ts"] is None


def test_asof_takes_greatest_preceding_and_carries_payload(spark):
    left = _frame(spark, [{"k": 1, "t": 100}, {"k": 1, "t": 300}], "k long, t long")
    right = _frame(
        spark,
        [{"k": 1, "t": 10, "p": "a"}, {"k": 1, "t": 90, "p": "b"},
         {"k": 1, "t": 200, "p": "c"}, {"k": 2, "t": 50, "p": "x"}],
        "k long, t long, p string",
    )
    out = {
        r["t"]: (r["matched_ts"], r["matched_payload"])
        for r in as_of_join(
            left, right, key="k", left_ts="t", right_ts="t", payload="p"
        ).collect()
    }
    assert out == {100: (90, "b"), 300: (200, "c")}  # never key 2's rows


def test_interval_join_inclusive_endpoints(spark):
    base = 1_600_000_000_000_000
    hour = 3_600_000_000
    events = _frame(
        spark,
        [
            {"uid": 1, "c_ts": base},             # == start: inside
            {"uid": 1, "c_ts": base + 2 * hour},  # == end: inside
            {"uid": 1, "c_ts": base + 2 * hour + 1},  # just past end: out
        ],
        "uid long, c_ts long",
    ).withColumn("c_ts", F.timestamp_micros("c_ts"))
    ivs = _frame(
        spark, [{"uid": 1, "s": base, "e": base + 2 * hour}], "uid long, s long, e long"
    ).select(
        "uid",
        F.timestamp_micros("s").alias("s_ts"),
        F.timestamp_micros("e").alias("e_ts"),
    )
    got = interval_join(
        events, ivs, event_ts="c_ts", start_ts="s_ts", end_ts="e_ts",
        keys=[("uid", "uid")], bucket_hours=2,
    ).count()
    assert got == 2


def test_interval_join_spans_bucket_boundary(spark):
    # an interval crossing a bucket edge must still find events in BOTH
    # buckets (the expansion covers every overlapped bucket)
    base = 1_600_000_000_000_000
    hour = 3_600_000_000
    # bucket width 2h; interval starts 1h before a boundary, ends after it
    events = _frame(
        spark,
        [{"uid": 1, "c_ts": base + i * hour} for i in range(4)],
        "uid long, c_ts long",
    ).withColumn("c_ts", F.timestamp_micros("c_ts"))
    ivs = _frame(
        spark, [{"uid": 1, "s": base + hour, "e": base + 3 * hour}],
        "uid long, s long, e long",
    ).select(
        "uid",
        F.timestamp_micros("s").alias("s_ts"),
        F.timestamp_micros("e").alias("e_ts"),
    )
    got = interval_join(
        events, ivs, event_ts="c_ts", start_ts="s_ts", end_ts="e_ts",
        keys=[("uid", "uid")], bucket_hours=2,
    ).count()
    assert got == 3  # hours 1, 2, 3


def test_interval_join_overlong_interval_fails_loudly(spark):
    base = 1_600_000_000_000_000
    hour = 3_600_000_000
    events = _frame(spark, [{"uid": 1, "c_ts": base}], "uid long, c_ts long")
    events = events.withColumn("c_ts", F.timestamp_micros("c_ts"))
    ivs = _frame(
        spark, [{"uid": 1, "s": base, "e": base + 100 * hour}],
        "uid long, s long, e long",
    ).select(
        "uid",
        F.timestamp_micros("s").alias("s_ts"),
        F.timestamp_micros("e").alias("e_ts"),
    )
    with pytest.raises(Exception, match="max_hours|ASSERT"):
        interval_join(
            events, ivs, event_ts="c_ts", start_ts="s_ts", end_ts="e_ts",
            keys=[("uid", "uid")], bucket_hours=2,
        ).count()


# --- two-pass (skew-hardened) as-of ------------------------------------------


def test_asof_two_pass_equals_single_pass_on_random_data(spark):
    import random

    rng = random.Random(7)
    left = _frame(
        spark,
        [{"k": rng.randint(1, 3), "t": rng.randint(0, 1000)} for _ in range(200)],
        "k long, t long",
    )
    right = _frame(
        spark,
        [
            {"k": rng.randint(1, 3), "t": rng.randint(0, 1000), "p": f"p{i}"}
            for i in range(80)
        ],
        "k long, t long, p string",
    )
    one = as_of_join(left, right, key="k", left_ts="t", right_ts="t", payload="p")
    two = as_of_join(
        left, right, key="k", left_ts="t", right_ts="t", payload="p",
        slice_width=100,
    )
    cols = ["k", "t", "matched_ts", "matched_payload"]
    a = sorted(map(tuple, one.select(cols).collect()))
    b = sorted(map(tuple, two.select(cols).collect()))
    assert a == b


def test_asof_two_pass_boundary_semantics(spark):
    # left row in a slice with NO right rows takes the carry-in from the
    # latest earlier slice; ties at slice boundaries keep <= semantics
    left = _frame(
        spark,
        [{"k": 1, "t": 250}, {"k": 1, "t": 100}, {"k": 1, "t": 99}],
        "k long, t long",
    )
    right = _frame(
        spark,
        [{"k": 1, "t": 95, "p": "early"}, {"k": 1, "t": 100, "p": "edge"}],
        "k long, t long, p string",
    )
    out = as_of_join(
        left, right, key="k", left_ts="t", right_ts="t", payload="p",
        slice_width=100,
    )
    got = {r["t"]: (r["matched_ts"], r["matched_payload"]) for r in out.collect()}
    assert got[99] == (95, "early")      # within slice 0
    assert got[100] == (100, "edge")     # tie at slice-1 start: <= match
    assert got[250] == (100, "edge")     # slice 2 empty: carry-in crosses slices


def test_asof_two_pass_spreads_hot_key_over_tasks(spark):
    # one key holds ~90% of rows; the two-pass plan must put its timeline
    # through MORE THAN ONE window partition (the single-pass plan cannot)
    hot = [{"k": 1, "t": i * 10} for i in range(900)]
    cold = [{"k": 2 + i, "t": i * 10} for i in range(100)]
    left = _frame(spark, hot + cold, "k long, t long")
    right = _frame(
        spark, [{"k": 1, "t": 5}, {"k": 3, "t": 5}], "k long, t long"
    )
    out = as_of_join(
        left, right, key="k", left_ts="t", right_ts="t", slice_width=1000
    )
    # mechanical plan check: the pass-1 window partitions by (k, _slice) —
    # the slice column in the partition spec is what splits a hot key's
    # timeline across tasks (the single-pass plan partitions by k alone)
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "_slice" in executed
    win_lines = [ln for ln in executed.splitlines() if "Window" in ln]
    assert any("_slice" in ln for ln in win_lines)
    # and the data really spans >1 slice for the hot key
    n_slices = (
        left.filter(F.col("k") == 1)
        .select((F.col("t") / 1000).cast("long").alias("s"))
        .distinct()
        .count()
    )
    assert n_slices > 1
    # and the result is still the correct as-of answer
    rows = {r["t"]: r["matched_ts"] for r in out.filter(F.col("k") == 1).collect()}
    assert rows[0] is None and rows[10] == 5 and rows[8990] == 5


def test_asof_forward_tie_and_tolerance(spark):
    """A right row at the SAME timestamp matches (>= semantics); a match
    beyond the tolerance is nulled; an earlier right row never matches
    forward."""
    left = spark.createDataFrame(
        [(1, 100), (1, 500), (2, 100)], "user_id long, us long"
    )
    right = spark.createDataFrame(
        [(1, 100), (1, 90), (1, 1000), (2, 99)], "user_id long, us long"
    )
    from otterbrix_spark.operators.temporal import as_of_join

    out = {
        (r["user_id"], r["us"]): r["matched_ts"]
        for r in as_of_join(
            left, right, key="user_id", left_ts="us", right_ts="us",
            direction="forward", tolerance=200,
        ).collect()
    }
    assert out[(1, 100)] == 100  # tie matches
    assert out[(1, 500)] is None  # 1000 is beyond tolerance 200
    assert out[(2, 100)] is None  # only an earlier right row exists


def test_asof_backward_tolerance(spark):
    left = spark.createDataFrame([(1, 500)], "user_id long, us long")
    right = spark.createDataFrame([(1, 100)], "user_id long, us long")
    from otterbrix_spark.operators.temporal import as_of_join

    row = as_of_join(
        left, right, key="user_id", left_ts="us", right_ts="us",
        tolerance=100,
    ).collect()[0]
    assert row["matched_ts"] is None  # gap 400 > tolerance 100
    row = as_of_join(
        left, right, key="user_id", left_ts="us", right_ts="us",
        tolerance=400,
    ).collect()[0]
    assert row["matched_ts"] == 100


def test_asof_tolerance_on_timestamp_columns(spark):
    """tolerance must work when the ts columns are TIMESTAMPs (the gap is
    an interval; the guard compares epoch micros) — review r6 finding."""
    from pyspark.sql import functions as F

    from otterbrix_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    # gap = 600s; tolerance in MICROSECONDS for timestamp inputs
    within = as_of_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        tolerance=601_000_000,
    ).collect()[0]
    assert within["matched_ts"] is not None
    beyond = as_of_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        tolerance=599_000_000,
    ).collect()[0]
    assert beyond["matched_ts"] is None


def test_asof_join_agrees_with_pandas_merge_asof(spark):
    """Property check against an INDEPENDENT reference implementation:
    pandas.merge_asof, both directions, with and without tolerance, on
    deterministic pseudo-random integer data (ties included)."""
    import pandas as pd

    from otterbrix_spark.operators.temporal import as_of_join

    import random

    rng = random.Random(1234)
    for direction in ("backward", "forward", "nearest"):
        for tolerance in (None, 7):
            left_rows = sorted(
                (rng.randrange(3), rng.randrange(40))
                for _ in range(60)
            )
            right_rows = sorted(
                (rng.randrange(3), rng.randrange(40))
                for _ in range(50)
            )
            lpd = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values(
                ["t", "k"], kind="stable"
            ).reset_index(drop=True)
            rpd = pd.DataFrame(right_rows, columns=["k", "t"]).sort_values(
                ["t", "k"], kind="stable"
            ).reset_index(drop=True)
            # carry the matched right ts explicitly (mt)
            rpd2 = rpd.assign(mt=rpd["t"])
            expected = pd.merge_asof(
                lpd, rpd2, on="t", by="k", direction=direction,
                tolerance=tolerance, suffixes=("", "_r"),
                allow_exact_matches=True,
            )
            ldf = spark.createDataFrame(lpd, "k long, t long")
            rdf = spark.createDataFrame(rpd, "k long, t long")
            got = as_of_join(
                ldf, rdf, key="k", left_ts="t", right_ts="t",
                direction=direction, tolerance=tolerance,
            ).collect()
            # multiset comparison per (k, t): multiple identical left rows
            # must each carry the same match
            from collections import Counter

            got_c = Counter((r["k"], r["t"], r["matched_ts"]) for r in got)
            exp_c = Counter(
                (
                    int(r.k),
                    int(r.t),
                    None if pd.isna(r.mt) else int(r.mt),
                )
                for r in expected.itertuples()
            )
            assert got_c == exp_c, (direction, tolerance)


def test_asof_strict_agrees_with_pandas_merge_asof(spark):
    """allow_exact_matches=False parity: backward/forward strict
    boundaries against pandas.merge_asof on tie-heavy data."""
    import random
    from collections import Counter

    import pandas as pd

    from otterbrix_spark.operators.temporal import as_of_join

    rng = random.Random(4321)
    for direction in ("backward", "forward"):
        for tolerance in (None, 5):
            # small value range -> plenty of exact-timestamp ties, the
            # case the flag exists for
            left_rows = sorted(
                (rng.randrange(3), rng.randrange(15)) for _ in range(50)
            )
            right_rows = sorted(
                (rng.randrange(3), rng.randrange(15)) for _ in range(40)
            )
            lpd = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values(
                ["t", "k"], kind="stable"
            ).reset_index(drop=True)
            rpd = pd.DataFrame(right_rows, columns=["k", "t"]).sort_values(
                ["t", "k"], kind="stable"
            ).reset_index(drop=True)
            expected = pd.merge_asof(
                lpd, rpd.assign(mt=rpd["t"]), on="t", by="k",
                direction=direction, tolerance=tolerance,
                suffixes=("", "_r"), allow_exact_matches=False,
            )
            got = as_of_join(
                spark.createDataFrame(lpd, "k long, t long"),
                spark.createDataFrame(rpd, "k long, t long"),
                key="k", left_ts="t", right_ts="t",
                direction=direction, tolerance=tolerance,
                allow_exact_matches=False,
            ).collect()
            got_c = Counter((r["k"], r["t"], r["matched_ts"]) for r in got)
            exp_c = Counter(
                (int(r.k), int(r.t), None if pd.isna(r.mt) else int(r.mt))
                for r in expected.itertuples()
            )
            assert got_c == exp_c, (direction, tolerance)


def test_asof_strict_unsupported_combinations_raise(spark):
    import pytest

    from otterbrix_spark.operators.temporal import as_of_join

    ldf = spark.createDataFrame([(1, 1)], "k long, t long")
    rdf = spark.createDataFrame([(1, 1)], "k long, t long")
    with pytest.raises(ValueError, match="backward/forward"):
        as_of_join(
            ldf, rdf, key="k", left_ts="t", right_ts="t",
            direction="nearest", allow_exact_matches=False,
        )
    with pytest.raises(ValueError, match="inclusive"):
        as_of_join(
            ldf, rdf, key="k", left_ts="t", right_ts="t",
            slice_width=10, allow_exact_matches=False,
        )


# --- LTTB downsampling (operators/downsample.py) -----------------------------


def test_lttb_small_series_passthrough():
    import pandas as pd

    from otterbrix_spark.operators.downsample import lttb_select

    pdf = pd.DataFrame({"event_id": [3, 1, 2], "x": [30, 10, 20],
                        "y": [1, 2, 3]})
    out = lttb_select(pdf, n_buckets=16)
    # n <= buckets: every point kept, ordered by (x, event_id)
    assert out["event_id"].tolist() == [1, 2, 3]
    assert out["sel_seq"].tolist() == [0, 1, 2]


def test_lttb_numpy_path_matches_reference_loop():
    # round-14 internals change: lttb_select moved from pandas sort_values
    # + iloc to np.lexsort + array slicing. The selection chain (Python-int
    # areas, (-area, event_id) tie-break) must be bit-identical to the
    # reference spelling — checked on tie-heavy and int64-overflowing data.
    import random

    import pandas as pd

    from otterbrix_spark.operators.downsample import lttb_select

    def reference(pdf, n_buckets):
        pdf = pdf.sort_values(["x", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        n = len(pdf)
        if n <= n_buckets:
            out = pdf.copy()
            out["sel_seq"] = range(n)
            return out
        xs, ys, eids = (pdf[c].to_numpy() for c in ("x", "y", "event_id"))
        inner = n_buckets - 2
        buckets = [[] for _ in range(inner)]
        for i in range(1, n - 1):
            buckets[((i - 1) * inner) // (n - 2)].append(i)
        sums = [
            (len(g), sum(int(xs[i]) for i in g), sum(int(ys[i]) for i in g))
            for g in buckets
        ]
        sel, px, py = [0], int(xs[0]), int(ys[0])
        for b in range(inner):
            cm, sx, sy = (
                sums[b + 1] if b < inner - 1 else (1, int(xs[n - 1]), int(ys[n - 1]))
            )
            best = None
            for i in buckets[b]:
                area = abs(
                    (px * cm - sx) * (int(ys[i]) - py)
                    - (px - int(xs[i])) * (sy - py * cm)
                )
                key = (-area, int(eids[i]))
                if best is None or key < best[0]:
                    best = (key, i)
            sel.append(best[1])
            px, py = int(xs[best[1]]), int(ys[best[1]])
        sel.append(n - 1)
        out = pdf.iloc[sel].copy()
        out["sel_seq"] = range(len(sel))
        return out

    rng = random.Random(42)
    for n in (1, 3, 17, 66):
        # tie-heavy: few distinct x and y values force area + x ties
        pdf = pd.DataFrame(
            {
                "event_id": rng.sample(range(10 * n), n),
                "x": [rng.randrange(0, max(2, n // 4)) * 10 for _ in range(n)],
                "y": [rng.choice([0, 0, 5, -5, 100]) for _ in range(n)],
            }
        )
        a = reference(pdf[["event_id", "x", "y"]].copy(), 16)
        b = lttb_select(pdf, 16)
        cols = ["event_id", "x", "y", "sel_seq"]
        assert (
            a[cols]
            .reset_index(drop=True)
            .equals(b[cols].reset_index(drop=True).astype(a[cols].dtypes.to_dict()))
        ), n
    # epoch-microsecond magnitudes whose cross products exceed int64: the
    # Python-int chain must stay exact (numpy vectorization would overflow)
    base = 1_700_000_000_000_000
    pdf = pd.DataFrame(
        {
            "event_id": list(range(66)),
            "x": sorted(base + rng.randrange(0, 3 * 10**13) for _ in range(66)),
            "y": [rng.randrange(-(10**8), 10**8) for _ in range(66)],
        }
    )
    a = reference(pdf[["event_id", "x", "y"]].copy(), 16)
    b = lttb_select(pdf, 16)
    cols = ["event_id", "x", "y", "sel_seq"]
    assert a[cols].reset_index(drop=True).equals(b[cols].reset_index(drop=True))


def test_lttb_selects_extremes_and_endpoints():
    import pandas as pd

    from otterbrix_spark.operators.downsample import lttb_select

    # a spike at x=50 must survive a 4-bucket downsample of a flat series
    xs = list(range(101))
    ys = [0] * 101
    ys[50] = 1000
    pdf = pd.DataFrame({"event_id": xs, "x": xs, "y": ys})
    out = lttb_select(pdf, n_buckets=4)
    assert len(out) == 4
    assert out["event_id"].iloc[0] == 0  # first endpoint
    assert out["event_id"].iloc[-1] == 100  # last endpoint
    assert 50 in out["event_id"].tolist()  # the spike
