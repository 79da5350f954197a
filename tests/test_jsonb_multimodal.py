"""JSONB struct-delete semantics (`-`/`#-` — reference jsonb_delete) and the
multimodal asset pipeline (binary payloads, Arrow-batched decode plumbing
with the stubbed codec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otterbrix_spark.functions import jsonb
from otterbrix_spark.llm.multimodal import (
    decode_assets,
    documents_as_assets,
    fake_decode,
    real_decode,
)
from otterbrix_spark.sources.registry import load_table


def test_jsonb_navigation_functions(spark):
    df = spark.createDataFrame(
        [('{"a": {"b": 7, "c": "x"}, "tags": [1, 2]}',)], "j: string"
    )
    out = df.select(
        jsonb.arrow_text(F.col("j"), "a").alias("a_json"),
        jsonb.path_text(F.col("j"), ["a", "b"]).alias("ab"),
        jsonb.path_text(F.col("j"), ["tags", "0"]).alias("t0"),
        jsonb.path_text(F.col("j"), ["missing"]).alias("gone"),
    ).collect()[0]
    assert out["ab"] == "7"
    assert out["t0"] == "1"
    assert out["gone"] is None
    assert '"b"' in out["a_json"]


def test_struct_delete(spark):
    df = spark.createDataFrame([((1, "x", 2.5),)], "s: struct<a: int, b: string, c: double>")
    out = df.select(jsonb.struct_delete(F.col("s"), "b").alias("s")).collect()[0]["s"]
    assert out.asDict() == {"a": 1, "c": 2.5}
    out2 = df.select(jsonb.struct_delete(F.col("s"), "a", "c").alias("s")).collect()[0]["s"]
    assert out2.asDict() == {"b": "x"}


def test_multimodal_decode_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    assets = documents_as_assets(docs)
    # payload is binary, metadata typed
    dtypes = dict(assets.dtypes)
    assert dtypes["payload"] == "binary"
    decoded = decode_assets(assets)
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert r["n_bytes"] == 16  # md5 payload
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert len(r["feature"]) == 4


def test_metadata_query_prunes_payload(spark, sf_dir):
    # metadata-only access must not read the payload column
    docs = load_table(spark, sf_dir, "documents")
    assets = documents_as_assets(docs)
    meta_only = assets.select("asset_id", "meta.n_bytes")
    assert meta_only.count() == docs.count()


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00" * 16)
    # deterministic fake path
    a = fake_decode(b"abcdef0123456789")
    b = fake_decode(b"abcdef0123456789")
    assert a == b and a["n_bytes"] == 16
