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
