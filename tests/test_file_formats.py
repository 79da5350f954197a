"""Multi-format ingest round-trips — the reference README claims
JSON/Parquet/ORC/Avro ingest (`/root/reference/README.md:5`); Spark provides
them all natively. Each format round-trips the events table and must agree
with the parquet source. (Avro requires the external spark-avro package —
covered behind an availability gate.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otterbrix_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "ts", F.unix_micros("ts")  # format-portable representation
    )


def _roundtrip(spark, df, path: str, fmt: str, **read_opts):
    df.write.format(fmt).save(path)
    back = spark.read.format(fmt).options(**read_opts).load(path)
    if "schema" in read_opts:
        back = spark.read.format(fmt).schema(read_opts["schema"]).load(path)
    return back


def test_json_roundtrip(spark, events, tmp_path):
    path = str(tmp_path / "ev_json")
    events.write.json(path)
    back = spark.read.schema(events.schema).json(path)
    assert back.count() == events.count()
    a = events.agg(F.sum("value").cast("decimal(20,2)")).collect()[0][0]
    b = back.agg(F.sum("value").cast("decimal(20,2)")).collect()[0][0]
    assert abs(float(a) - float(b)) < 1e-4


def test_csv_roundtrip(spark, events, tmp_path):
    path = str(tmp_path / "ev_csv")
    events.write.option("header", True).csv(path)
    back = spark.read.schema(events.schema).option("header", True).csv(path)
    assert back.count() == events.count()
    assert back.agg(F.countDistinct("event_type")).collect()[0][0] == 5


def test_orc_roundtrip(spark, events, tmp_path):
    path = str(tmp_path / "ev_orc")
    events.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == events.count()
    assert dict(back.dtypes) == dict(events.dtypes)


def test_avro_gated(spark, events, tmp_path):
    # spark-avro is an external jar; skip cleanly when absent
    try:
        events.limit(1).write.format("avro").save(str(tmp_path / "ev_avro"))
    except Exception as exc:
        pytest.skip(f"avro unavailable in this container: {type(exc).__name__}")
    back = spark.read.format("avro").load(str(tmp_path / "ev_avro"))
    assert back.count() == 1
