"""Type-system boundary tests — the F5 fixture shapes (FIXTURES.md) and the
SURVEY §1.2 promotion policies."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F, types as T

from otterbrix_spark.functions.types_map import (
    hugeint_lit,
    micros_to_time,
    time_to_micros,
    ubigint_lit,
)


def test_signed_integer_boundaries(spark):
    df = spark.createDataFrame(
        [(127, 32767, 2147483647, 9223372036854775807)],
        "t: tinyint, s: smallint, i: int, b: bigint",
    )
    row = df.select(
        (F.col("t") + F.lit(0)).alias("t"),
        "s", "i", "b",
    ).collect()[0]
    assert row["b"] == 9223372036854775807


def test_unsigned_promotion_policy(spark):
    # UBIGINT max (2^64 - 1) survives via DECIMAL(20,0)
    df = spark.range(1).select(ubigint_lit(2**64 - 1).alias("u"))
    assert int(df.collect()[0]["u"]) == 2**64 - 1
    assert isinstance(df.schema["u"].dataType, T.DecimalType)


def test_hugeint_promotion_policy(spark):
    v = 2**100
    df = spark.range(1).select(hugeint_lit(v).alias("h"), hugeint_lit(-v).alias("nh"))
    row = df.collect()[0]
    assert int(row["h"]) == v and int(row["nh"]) == -v


def test_float_specials(spark):
    df = spark.createDataFrame(
        [(float("nan"), float("inf"), float("-inf"))], "a: double, b: double, c: double"
    )
    row = df.select(
        F.isnan("a").alias("nan_detected"),
        (F.col("b") > F.lit(1e308)).alias("posinf"),
        (F.col("c") < F.lit(-1e308)).alias("neginf"),
    ).collect()[0]
    assert row["nan_detected"] and row["posinf"] and row["neginf"]


def test_decimal_rounding_edges(spark):
    df = spark.createDataFrame([("1.005",), ("2.675",), ("-1.005",)], "s: string")
    out = df.select(
        F.col("s").cast("decimal(10,2)").alias("d2"),
        F.round(F.col("s").cast("decimal(10,3)"), 2).alias("r2"),
    ).collect()
    # exact decimal parse + HALF_UP rounding (away from zero on ties)
    assert [str(r["r2"]) for r in out] == ["1.01", "2.68", "-1.01"]


def test_time_as_micros_roundtrip(spark):
    df = spark.createDataFrame([("13:45:30.123456",), ("00:00:00",)], "t: string")
    out = df.select(
        time_to_micros(F.col("t")).alias("us")
    ).select(micros_to_time(F.col("us")).alias("t2"), "us").collect()
    assert out[0]["us"] == (13 * 3600 + 45 * 60 + 30) * 1_000_000 + 123456
    assert out[0]["t2"] == "13:45:30.123456"
    assert out[1]["t2"] == "00:00:00.000000"


def test_interval_arithmetic(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 30, 23, 0),)], "ts: timestamp_ntz"
    )
    out = df.select(
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("plus2h"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("plus1d"),
        (F.col("ts") - F.col("ts")).alias("zero_interval"),
    ).collect()[0]
    assert out["plus2h"] == datetime.datetime(2024, 3, 31, 1, 0)
    assert out["plus1d"] == datetime.datetime(2024, 3, 31, 23, 0)


def test_timestamp_minus_timestamp_is_interval(spark):
    df = spark.createDataFrame(
        [
            (
                datetime.datetime(2024, 1, 2, 0, 0),
                datetime.datetime(2024, 1, 1, 12, 0),
            )
        ],
        "a: timestamp_ntz, b: timestamp_ntz",
    )
    out = df.select((F.col("a") - F.col("b")).alias("d"))
    assert isinstance(out.schema["d"].dataType, T.DayTimeIntervalType)
    assert out.collect()[0]["d"] == datetime.timedelta(hours=12)


def test_utf8_byte_vs_char_length(spark):
    df = spark.createDataFrame([("héllo wörld 你好",)], "s: string")
    row = df.select(
        F.octet_length("s").alias("bytes"),
        F.length("s").alias("chars"),
    ).collect()[0]
    assert row["chars"] == 14
    assert row["bytes"] == 14 + 2 + 2 * 2  # two 2-byte umlauts + two 3-byte CJK


def test_blob_and_uuid(spark):
    df = spark.range(1).select(
        F.unhex(F.lit("deadbeef")).alias("blob"),
        F.lit("550e8400-e29b-41d4-a716-446655440000").alias("uuid"),
    )
    row = df.collect()[0]
    assert row["blob"] == b"\xde\xad\xbe\xef"
    assert len(row["uuid"]) == 36


def test_nested_struct_list_map(spark):
    schema = "s: struct<xs: array<struct<k: string, v: bigint>>, m: map<string, double>>"
    df = spark.createDataFrame([(([("a", 1), ("b", 2)], {"p": 1.5}),)], schema)
    out = df.select(
        F.col("s.xs")[1]["v"].alias("second_v"),
        F.map_keys("s.m").alias("mkeys"),
        F.size("s.xs").alias("n"),
    ).collect()[0]
    assert out["second_v"] == 2 and out["mkeys"] == ["p"] and out["n"] == 2


def test_fixed_size_array_constraint(spark):
    # reference ARRAY is fixed-size LIST; enforced as a CHECK here
    from otterbrix_spark.operators.dml import ConstraintViolation, check_constraint

    df = spark.createDataFrame([([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "v: array<double>")
    import pytest

    with pytest.raises(ConstraintViolation):
        check_constraint(df, F.size("v") == 2, "fixed_size_2")
