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
    from otterbrix_spark.llm.multimodal import documents_as_pixel_assets

    docs = load_table(spark, sf_dir, "documents").limit(50)
    assets = documents_as_pixel_assets(docs)
    # payload is binary, metadata typed
    dtypes = dict(assets.dtypes)
    assert dtypes["payload"] == "binary"
    decoded = decode_assets(assets)  # default decoder = real_decode
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows:
        d = r["asset_id"]
        assert r["width"] == 1 + (d * 13) % 64  # parsed from real headers
        assert r["height"] == 1 + (d * 7) % 64
        assert r["feature"][0] == (d % 256) / 255.0  # real pixel means
        assert len(r["feature"]) == 4


def test_fake_decode_pipeline_still_works(spark, sf_dir):
    # the format-agnostic stand-in path stays available for opaque payloads
    docs = load_table(spark, sf_dir, "documents").limit(10)
    decoded = decode_assets(documents_as_assets(docs), decoder=fake_decode)
    rows = decoded.collect()
    assert len(rows) == 10 and all(r["n_bytes"] == 16 for r in rows)


def test_metadata_query_prunes_payload(spark, sf_dir):
    # metadata-only access must not read the payload column
    docs = load_table(spark, sf_dir, "documents")
    assets = documents_as_assets(docs)
    meta_only = assets.select("asset_id", "meta.n_bytes")
    assert meta_only.count() == docs.count()


def test_real_decode_ppm_and_bmp():
    from otterbrix_spark.llm.multimodal import encode_bmp24, encode_ppm

    out = real_decode(encode_ppm(3, 2, (10, 20, 30)))
    assert (out["width"], out["height"]) == (3, 2)
    assert out["feature"] == [10 / 255.0, 20 / 255.0, 30 / 255.0, 60 / 765.0]
    # PPM comment in header
    p = b"P6\n# c\n3 2\n255\n" + bytes((10, 20, 30)) * 6
    assert real_decode(p)["width"] == 3
    # BMP: BGR order + 4-byte row padding handled (w=3 -> 9-byte row pads to 12)
    out = real_decode(encode_bmp24(3, 5, (200, 100, 50)))
    assert (out["width"], out["height"]) == (3, 5)
    assert out["feature"][0] == 200 / 255.0 and out["feature"][2] == 50 / 255.0


def test_real_decode_rejects_unknown_container():
    with pytest.raises(ValueError):
        real_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(ValueError):
        real_decode(b"P6\n3 2\n255\n\x00")  # truncated pixel data
    # deterministic fake path unchanged
    a = fake_decode(b"abcdef0123456789")
    b = fake_decode(b"abcdef0123456789")
    assert a == b and a["n_bytes"] == 16


def test_wav_decoder_rejects_malformed():
    import pytest as _pytest

    from otterbrix_spark.llm.multimodal import decode_wav, encode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"not a riff container at all")
    with _pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI ")  # wrong form type
    good = encode_wav(64, 500, 8)
    with _pytest.raises(ValueError):
        decode_wav(good[:20])  # truncated before any data chunk


def test_wav_decoder_walks_extra_chunks():
    # a LIST/INFO chunk (odd-sized, word-aligned per RIFF) before fmt/data
    # must be skipped by the chunk walk, not break parsing
    import struct

    from otterbrix_spark.llm.multimodal import decode_wav, encode_wav

    base = encode_wav(32, 1234, 8)
    tail = base[12:]  # fmt + data chunks (RIFF header + WAVE tag are 12 bytes)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # pad byte
    body = b"WAVE" + extra + tail
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_wav(rebuilt)
    assert got["n_samples"] == 32 and got["peak"] == 1234
