"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched `mapInPandas`.

The decode step is STUBBED — the container has no image/audio codecs — but
the Spark-side plumbing is real and tested: schema contract, partitioning,
Arrow batch shapes, and the UDF signature are exactly what a production
decoder would plug into. `fake_decode` is a deterministic stand-in so the
pipeline is end-to-end testable.

Scale notes: mapInPandas streams Arrow batches (no per-row Python), media
payloads stay in executor memory one batch at a time, and the metadata-only
columns are available without touching payload bytes (column pruning skips
the binary column entirely for metadata queries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Contract for a multimodal asset column-group
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def real_decode(payload: bytes) -> dict:
    """Decode an image/audio payload into pixels/samples.

    STUB: requires an image/audio codec library (PIL / libsndfile / ffmpeg)
    that is not available in this environment. The surrounding pipeline is
    fully functional with `fake_decode`.
    """
    raise NotImplementedError(
        "media codecs unavailable in this container; use fake_decode for the "
        "deterministic test path"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives 'dimensions' and a 4-dim
    'feature' from payload bytes. Same input -> same output, any engine."""
    if payload is None:
        return {"width": None, "height": None, "n_bytes": None, "feature": None}
    n = len(payload)
    head = payload[:8].ljust(8, b"\0")
    return {
        "width": 1 + head[0] % 64,
        "height": 1 + head[1] % 64,
        "n_bytes": n,
        "feature": [float(head[i]) / 255.0 for i in range(4)],
    }


def decode_assets(assets: DataFrame, decoder=fake_decode) -> DataFrame:
    """Run the decoder over asset payloads as Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(decoder)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": out.map(lambda d: d["width"]),
                    "height": out.map(lambda d: d["height"]),
                    "n_bytes": out.map(lambda d: d["n_bytes"]),
                    "feature": out.map(lambda d: d["feature"]),
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("frame_byte", T.IntegerType(), True),
        T.StructField("intensity", T.DoubleType(), True),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling over binary payloads: each asset expands
    to ``n_frames`` rows sampled at evenly-spaced byte offsets.

    The decode of a real container format is stubbed (same contract as
    `real_decode`); the *plumbing* is the production shape — Arrow-batched
    `mapInPandas` with 1→N row expansion, payload bytes never leaving the
    executor, output schema typed for downstream joins/aggregations.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                step = max(1, len(payload) // n_frames)
                for j in range(n_frames):
                    off = j * step
                    b = payload[off] if off < len(payload) else None
                    rows.append(
                        (
                            asset_id,
                            j,
                            off,
                            b,
                            None if b is None else b / 255.0,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_idx", "offset", "frame_byte", "intensity"],
            )

    return assets.select("asset_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the asset contract for testing: the
    'payload' is a deterministic 16-byte pseudo-media blob (md5 of text)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/fake").alias("media_type"),
        F.unhex(F.md5("text")).alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.unhex(F.md5("text"))).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def plan_resize(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning over decoded dimensions: integer-percent scale to
    fit the longest edge to ``target``, preserving aspect ratio.

    Runs AFTER the (stubbed) decode as pure column expressions — the
    actual pixel resample belongs in the same mapInPandas batch as the
    decoder in production (`real_decode`), but the planning arithmetic
    (scale selection, output geometry) is engine-side and testable today.
    Integer percent arithmetic keeps the plan reproducible and
    cross-engine checkable."""
    longest = F.greatest(F.col("width"), F.col("height"))
    scale_pct = F.floor(F.lit(target * 100) / longest).cast("long")
    return decoded.select(
        "asset_id",
        "width",
        "height",
        scale_pct.alias("scale_pct"),
        F.floor(F.col("width") * scale_pct / 100).cast("long").alias("out_w"),
        F.floor(F.col("height") * scale_pct / 100).cast("long").alias("out_h"),
    )
