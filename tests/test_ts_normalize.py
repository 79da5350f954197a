"""Unit tests for the events-timestamp normalizer — every physical form
the corpus generator has shipped (int64 nanos) or ships now
(timestamp[us] / timestamp), plus the magnitude branches that guard
against future integer-unit changes. The round-3 incident: a hard-coded
nanos assumption met a micros file and silently produced 1970 windows, so
each branch is pinned to the exact expected UTC instant."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F, types as T

from otterbrix_spark.sources.registry import normalize_event_ts

# 2024-01-15 12:00:00 UTC
EPOCH_S = 1_705_320_000
WANT = datetime.datetime(2024, 1, 15, 12, 0, 0)


@pytest.mark.parametrize(
    "value,unit",
    [
        (EPOCH_S * 1_000_000_000, "nanos"),
        (EPOCH_S * 1_000_000, "micros"),
        (EPOCH_S * 1_000, "millis"),
        (EPOCH_S, "seconds"),
    ],
)
def test_bigint_magnitude_branches(spark, value, unit):
    df = spark.createDataFrame([Row(ts=value)], schema="ts long")
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = out.collect()[0]["ts"]
    assert got.replace(tzinfo=None) == WANT, (unit, got)


def test_timestamp_ntz_casts_exactly(spark):
    df = spark.createDataFrame(
        [Row(ts=WANT)],
        schema=T.StructType([T.StructField("ts", T.TimestampNTZType())]),
    )
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    # session tz is UTC: the wall-clock instant must be preserved exactly
    assert out.select(F.unix_micros("ts").alias("us")).collect()[0]["us"] == (
        EPOCH_S * 1_000_000
    )


def test_timestamp_passthrough_and_missing_column(spark):
    df = spark.createDataFrame([Row(ts=WANT)], schema="ts timestamp")
    out = normalize_event_ts(df)
    assert out is df  # already normal: no-op, no extra projection
    no_ts = spark.createDataFrame([Row(x=1)])
    assert normalize_event_ts(no_ts) is no_ts


def test_nanos_precision_no_double_loss(spark):
    # 1.7e18 exceeds 2^53: a float division path would corrupt the low
    # microseconds; integer DIV must preserve them exactly
    nanos = EPOCH_S * 1_000_000_000 + 123_456_789  # +123.456789 ms
    df = spark.createDataFrame([Row(ts=nanos)], schema="ts long")
    us = (
        normalize_event_ts(df)
        .select(F.unix_micros("ts").alias("us"))
        .collect()[0]["us"]
    )
    assert us == EPOCH_S * 1_000_000 + 123_456
