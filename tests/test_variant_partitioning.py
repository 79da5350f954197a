"""VARIANT encoding (Spark 4) and partition-pruning layout tests."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from otterbrix_spark.functions.variant import (
    ingest_json_events,
    try_variant_path,
    variant_path,
)
from otterbrix_spark.sources.registry import load_table


def test_variant_ingest_and_typed_get(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(100)
    v = ingest_json_events(ev)
    out = v.select(
        variant_path(F.col("props"), "$.k", "bigint").alias("k"),
        try_variant_path(F.col("props"), "$.k", "string").alias("k_str"),
        try_variant_path(F.col("props"), "$.missing", "bigint").alias("gone"),
    ).collect()
    assert all(r["gone"] is None for r in out)
    assert all(r["k"] is not None for r in out)
    # variant aggregation equals JSON-text extraction
    a = v.agg(F.sum(variant_path(F.col("props"), "$.k", "bigint"))).collect()[0][0]
    b = ev.agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint"))
    ).collect()[0][0]
    assert a == b


def test_variant_type_mismatch_yields_null_with_try(spark):
    df = spark.createDataFrame([('{"x": "not a number"}',)], "j: string")
    v = df.select(F.parse_json("j").alias("v"))
    row = v.select(
        try_variant_path(F.col("v"), "$.x", "bigint").alias("as_int"),
        try_variant_path(F.col("v"), "$.x", "string").alias("as_str"),
    ).collect()[0]
    assert row["as_int"] is None and row["as_str"] == "not a number"


def test_partition_pruning_on_date_layout(spark, sf_dir, tmp_path):
    """Date-partitioned layout: a date-filtered scan must prune partitions
    (the 100 TB posture: the scan reads only matching directories)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / f"events_parted_{uuid.uuid4().hex[:6]}")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(path)

    parted = spark.read.parquet(path)
    one_day = parted.select("day").distinct().limit(1).collect()[0]["day"]
    q = parted.filter(F.col("day") == F.lit(one_day)).select("event_id")
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "day" in pf
    n_one_day = q.count()
    assert 0 < n_one_day < ev.count()
