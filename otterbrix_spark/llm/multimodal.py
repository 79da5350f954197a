"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched `mapInPandas`.

``real_decode`` is a real (stdlib+numpy) decoder for two uncompressed
image containers — PPM P6 and BI_RGB BMP — so the pipeline is end-to-end
honest: header parsing, padded-row geometry, channel statistics from
actual pixel bytes. Formats needing external codecs (JPEG/PNG/audio/video)
raise ``ValueError`` at the same seam a production decoder would plug into.
``fake_decode`` remains as the format-agnostic deterministic stand-in.

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
    """Decode an image payload into dimensions + channel-mean feature.

    Stdlib+numpy only — two uncompressed container formats are supported,
    enough to make the multimodal pipeline end-to-end real without adding
    codec dependencies (reference BLOB ingestion surface,
    `components/types/types.hpp:83`):

      - PPM binary (``P6`` magic, maxval <= 255)
      - BMP, uncompressed BI_RGB, 24- or 32-bit, top-down or bottom-up

    Returns ``{width, height, n_bytes, feature}`` where feature is
    ``[mean_r/255, mean_g/255, mean_b/255, (mean_r+mean_g+mean_b)/765]``.
    Channel means are computed from exact integer sums, so for images whose
    true mean is integral the doubles are bit-exact and cross-engine
    checkable. Unsupported containers raise ``ValueError`` (a real decode
    error, not a stub)."""
    if payload is None:
        return {"width": None, "height": None, "n_bytes": None, "feature": None}
    if payload[:2] == b"P6":
        w, h, sums = _decode_ppm(payload)
    elif payload[:2] == b"BM":
        w, h, sums = _decode_bmp(payload)
    else:
        raise ValueError(
            f"unsupported media container (magic {payload[:2]!r}); "
            "PPM P6 and uncompressed 24/32-bit BMP are supported"
        )
    n_px = w * h
    means = [s / n_px for s in sums]
    return {
        "width": w,
        "height": h,
        "n_bytes": len(payload),
        "feature": [
            means[0] / 255.0,
            means[1] / 255.0,
            means[2] / 255.0,
            (means[0] + means[1] + means[2]) / 765.0,
        ],
    }


def _decode_ppm(buf: bytes) -> tuple[int, int, list[int]]:
    """P6 header (whitespace/#-comment tokens: width height maxval) +
    packed RGB; returns (w, h, per-channel integer sums)."""
    import numpy as np

    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace terminating the maxval token
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = 3 * w * h
    if len(buf) - i < need:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(buf, np.uint8, count=need, offset=i).reshape(-1, 3)
    return w, h, [int(px[:, c].sum(dtype=np.int64)) for c in range(3)]


def _decode_bmp(buf: bytes) -> tuple[int, int, list[int]]:
    """BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB only; rows are padded
    to 4 bytes and stored bottom-up (positive height) in BGR(A) order."""
    import struct

    import numpy as np

    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    _, w, h, _, bpp, compression = struct.unpack_from("<IiiHHI", buf, 14)
    if compression != 0:
        raise ValueError("only uncompressed BI_RGB BMP is supported")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    h = abs(h)  # negative height = top-down; irrelevant to sums/dims
    bytes_px = bpp // 8
    row_bytes = (w * bytes_px + 3) // 4 * 4
    if len(buf) - data_off < h * row_bytes:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        buf, np.uint8, count=h * row_bytes, offset=data_off
    ).reshape(h, row_bytes)
    px = rows[:, : w * bytes_px].reshape(h, w, bytes_px)
    # BGR(A) -> RGB channel sums
    return w, h, [
        int(px[:, :, 2 - c].sum(dtype=np.int64)) for c in range(3)
    ]


def encode_ppm(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal P6 encoder (constant-color fill) — the synthetic-corpus side
    of the decode contract; also the production shape for writing decoded
    tiles back out."""
    return f"P6\n{w} {h}\n255\n".encode() + bytes(rgb) * (w * h)


def encode_bmp24(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal 24-bit BI_RGB BMP encoder (constant-color fill), rows padded
    to 4 bytes, bottom-up."""
    import struct

    r, g, b = rgb
    row = bytes((b, g, r)) * w
    row += b"\0" * ((-len(row)) % 4)
    pixel_data = row * h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


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


def decode_assets(assets: DataFrame, decoder=real_decode) -> DataFrame:
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


def documents_as_pixel_assets(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into REAL image assets: each doc becomes a
    valid constant-color image whose geometry and color derive from doc_id
    by SQL-expressible rules (so a cross-engine oracle can predict every
    decoded value without a codec):

      width  = 1 + (doc_id * 13) % 64      color r = doc_id % 256
      height = 1 + (doc_id * 7)  % 64              g = (doc_id * 3) % 256
      container: even doc_id -> PPM P6             b = (doc_id * 7) % 256
                 odd  doc_id -> 24-bit BMP

    Encoding runs as an Arrow-batched pandas UDF on the executors — the
    same seam a production ingest would use to wrap raw camera/scraper
    bytes into the asset contract."""
    import pandas as pd  # noqa: F811 (module-level import is the same)

    @F.pandas_udf(T.BinaryType())
    def encode(doc_id: pd.Series) -> pd.Series:
        def one(d):
            if d is None:
                return None
            d = int(d)
            w, h = 1 + (d * 13) % 64, 1 + (d * 7) % 64
            rgb = (d % 256, (d * 3) % 256, (d * 7) % 256)
            return encode_ppm(w, h, rgb) if d % 2 == 0 else encode_bmp24(w, h, rgb)

        return doc_id.map(one)

    # two-step select so the encode UDF appears once in the plan; the meta
    # column references the materialized payload, not a second UDF call
    base = docs.select(
        F.col("doc_id").alias("asset_id"),
        encode(F.col("doc_id")).alias("payload"),
    )
    return base.select(
        "asset_id",
        F.when(F.col("asset_id") % 2 == 0, F.lit("image/x-portable-pixmap"))
        .otherwise(F.lit("image/bmp"))
        .alias("media_type"),
        "payload",
        F.struct(
            (1 + (F.col("asset_id") * 13) % 64).cast("int").alias("width"),
            (1 + (F.col("asset_id") * 7) % 64).cast("int").alias("height"),
            F.length("payload").cast("long").alias("n_bytes"),
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


# --- audio: RIFF/WAV PCM16 ---------------------------------------------------
# The audio leg of the multimodal triad (image decode above, video frame
# sampling in sample_frames). Same honesty contract as real_decode: the
# executor-side decoder parses REAL RIFF/WAVE containers (chunked layout,
# fmt geometry, 16-bit LE PCM payload) and computes integer waveform
# features, while the oracle predicts them from the generation rule — a
# format misparse cannot hash-match. Integer features only (peak, abs-sum,
# zero crossings): no float audio math to drift across engines.

AUDIO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("sum_abs", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def encode_wav(n_samples: int, amp: int, half_period: int, rate: int = 8000) -> bytes:
    """Minimal valid RIFF/WAVE: mono 16-bit PCM square wave — sample i is
    ``+amp`` when ``(i // half_period) % 2 == 0`` else ``-amp``."""
    import struct

    frames = bytearray()
    for i in range(n_samples):
        v = amp if (i // half_period) % 2 == 0 else -amp
        frames += struct.pack("<h", v)
    data = bytes(frames)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    out = b"RIFF"
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return out + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE container (chunk walk, not fixed offsets) and
    compute integer waveform features from the PCM16 samples."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated RIFF chunk")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk shorter than PCM header")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    x = np.frombuffer(data, dtype="<i2").astype("int64")
    signs = np.sign(x)
    zc = int(np.count_nonzero(signs[1:] != signs[:-1])) if len(x) > 1 else 0
    return {
        "sample_rate": int(rate),
        "n_samples": int(len(x)),
        "peak": int(np.max(np.abs(x))) if len(x) else 0,
        "sum_abs": int(np.sum(np.abs(x))),
        "zero_crossings": zc,
    }


def documents_as_audio_assets(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into REAL WAV assets with SQL-predictable
    waveforms:

      n_samples   = 256 + (doc_id * 37) % 512
      amplitude   = 1000 + (doc_id * 11) % 20000
      half_period = 8 + (doc_id * 5) % 24
    """
    @F.pandas_udf(T.BinaryType())
    def encode(doc_id: pd.Series) -> pd.Series:
        def one(d):
            if d is None:
                return None
            d = int(d)
            return encode_wav(
                256 + (d * 37) % 512, 1000 + (d * 11) % 20000, 8 + (d * 5) % 24
            )

        return doc_id.map(one)

    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio/wav").alias("media_type"),
        encode(F.col("doc_id")).alias("payload"),
    )


def decode_audio_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched WAV decode: (asset_id, sample_rate, n_samples, peak,
    sum_abs, zero_crossings). Same mapInPandas seam as decode_assets."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for aid, payload in zip(b["asset_id"], b["payload"]):
                d = decode_wav(bytes(payload))
                d["asset_id"] = int(aid)
                rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples", "peak",
                    "sum_abs", "zero_crossings",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, AUDIO_DECODED_SCHEMA
    )


def encode_ppm_gradient(
    w: int, h: int, r0: int, g0: int, b0: int
) -> bytes:
    """P6 encoder with SPATIAL structure: pixel (x, y) = (r0 + x, g0 + y,
    b0). Callers keep r0 + w <= 256 and g0 + h <= 256 so channels never
    wrap — which is what lets a cross-engine oracle predict any patch
    statistic with closed-form arithmetic series instead of a codec."""
    import numpy as np

    xs = np.arange(w, dtype=np.uint8)
    ys = np.arange(h, dtype=np.uint8)
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = r0 + xs[None, :]
    px[:, :, 1] = g0 + ys[:, None]
    px[:, :, 2] = b0
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def documents_as_gradient_assets(
    docs: DataFrame, fan_out: bool = False
) -> DataFrame:
    """Documents -> gradient PPM assets (SQL-predictable spatial content):
    w = 1 + (id*13) % 64, h = 1 + (id*7) % 64, r0 = id % 128,
    g0 = (id*3) % 128, b0 = (id*7) % 256 — r0 + w <= 191, g0 + h <= 191,
    so no channel wraps."""
    import pandas as pd

    @F.pandas_udf(T.BinaryType())
    def encode(doc_id: pd.Series) -> pd.Series:
        def one(d):
            if d is None:
                return None
            d = int(d)
            return encode_ppm_gradient(
                1 + (d * 13) % 64, 1 + (d * 7) % 64,
                d % 128, (d * 3) % 128, (d * 7) % 256,
            )

        return doc_id.map(one)

    # Round-14 (guide §2.2/§1.3, same guard as dedup._fan_out): the
    # documents scan is a handful of splits locally, so downstream Python
    # stages ran in ~3 tasks on 32 cores. fan_out=True spreads the NARROW
    # id column to cluster width BEFORE generating payloads — the shuffle
    # moves only 8-byte ids, the pixel bytes are born post-shuffle and
    # never move; skipped when the input is already hash-clustered on
    # doc_id at the target width (the warm-cache layout stamp).
    # Opt-in per caller because it was MEASURED per gate (interleaved
    # A/B, 2 pairs, best-of-4): m07's per-asset decode+tile is heavy
    # enough to win 1.5-1.6x (3.3/2.8s -> 2.2/1.7s); m09's flip-crop is
    # too light and LOST ~20% to the added exchange + tiny-task
    # scheduling (1.4/1.1s -> 1.7/1.4s); m11 read parity. Light-work
    # callers keep the scan's natural splits.
    ids = docs.select(F.col("doc_id").alias("asset_id"))
    if fan_out:
        spark = docs.sparkSession
        target = spark.sparkContext.defaultParallelism
        clustered = getattr(docs, "_otx_clustered_key", None)
        if not (
            clustered is not None
            and clustered[0] == "doc_id"
            and clustered[1] >= target
        ):
            ids = ids.repartition(target, F.col("asset_id"))
    return ids.select(
        "asset_id",
        encode(F.col("asset_id")).alias("payload"),
    )


def extract_patches(assets: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch grid over decoded images: each asset becomes its
    ``ceil(w/p) x ceil(h/p)`` tiles with exact integer per-channel sums
    (edge tiles clipped). Arrow-batched ``mapInPandas`` — payload bytes
    never leave the executors; the shuffle carries only (asset, ti, tj,
    counts) narrow rows, the patch-embedding input layout every
    vision-model ingest produces at scale."""
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("ti", T.IntegerType()),
            T.StructField("tj", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: list[tuple] = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, px = _decode_ppm_pixels(bytes(payload))
                for ti in range((h + patch - 1) // patch):
                    for tj in range((w + patch - 1) // patch):
                        tile = px[
                            ti * patch : (ti + 1) * patch,
                            tj * patch : (tj + 1) * patch,
                        ]
                        sums = tile.sum(axis=(0, 1), dtype=np.int64)
                        out.append(
                            (
                                int(aid), ti, tj,
                                int(tile.shape[0] * tile.shape[1]),
                                int(sums[0]), int(sums[1]), int(sums[2]),
                            )
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in schema.fields]
            )

    return assets.mapInPandas(run, schema)


def _decode_ppm_pixels(buf: bytes):
    """P6 -> (w, h, ndarray[h, w, 3]) — the full-pixel sibling of
    _decode_ppm's channel-sum fast path."""
    import numpy as np

    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(buf, np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3)


def _decode_wav_samples(payload: bytes):
    """RIFF chunk walk -> (sample_rate, int64 ndarray of PCM16 samples) —
    the raw-sample sibling of decode_wav's stats fast path."""
    import struct

    import numpy as np

    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated RIFF chunk")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk shorter than PCM header")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return int(rate), np.frombuffer(data, dtype="<i2").astype("int64")


def frame_audio(
    assets: DataFrame, win: int = 64, hop: int = 32
) -> DataFrame:
    """STFT-style framing over decoded WAV assets: overlapping windows of
    ``win`` samples every ``hop`` samples (full frames only — the layout
    every spectrogram/ASR front-end produces before the FFT). Per frame:
    signed sample sum and positive-sample count — exact integers a
    cross-engine oracle can predict for synthetic waveforms. Arrow-batched
    ``mapInPandas``; payload bytes never leave the executors, the shuffle
    carries only narrow (asset, frame, stats) rows."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("sum_signed", T.LongType()),
            T.StructField("n_pos", T.LongType()),
        ]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: list[tuple] = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                _, x = _decode_wav_samples(bytes(payload))
                n_frames = (len(x) - win) // hop + 1 if len(x) >= win else 0
                for f in range(n_frames):
                    fr = x[f * hop : f * hop + win]
                    out.append(
                        (
                            int(aid), f,
                            int(fr.sum()),
                            int((fr > 0).sum()),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[c.name for c in schema.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema)


def augment_flip_crop(assets: DataFrame, crop: int = 16) -> DataFrame:
    """Deterministic image augmentation — horizontal flip + center crop —
    the two transforms every vision training loader applies (random
    variants differ only in the offset/flag source; a seeded-hash column
    drives them at scale with the identical plan). Arrow-batched
    ``mapInPandas`` over REAL PPM decode: payloads never leave the
    executors, the shuffle carries only narrow (asset, dims, channel
    sums) rows. Crop is ``min(crop, w) x min(crop, h)`` centered with
    floor offsets, so every output statistic is closed-form predictable
    on a gradient corpus."""
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: list[tuple] = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, px = _decode_ppm_pixels(bytes(payload))
                px = px[:, ::-1, :]  # horizontal flip
                cw, ch = min(crop, w), min(crop, h)
                x0, y0 = (w - cw) // 2, (h - ch) // 2
                tile = px[y0 : y0 + ch, x0 : x0 + cw]
                sums = tile.sum(axis=(0, 1), dtype=np.int64)
                out.append(
                    (int(aid), cw, ch, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return assets.mapInPandas(run, schema)


def encode_wav_gated(
    n_samples: int, amp: int, half_period: int, seg: int,
    quiet_div: int = 50, rate: int = 8000,
) -> bytes:
    """A square wave whose AMPLITUDE gates on/off in blocks of ``seg``
    samples (loud block, quiet block, loud block, ...) — the synthetic
    speech/silence alternation the VAD segmentation gate (m10) detects.
    Sample i: sign from ((i // half_period) % 2), magnitude ``amp`` in
    even blocks and ``amp // quiet_div`` in odd blocks."""
    import struct

    frames = bytearray()
    for i in range(n_samples):
        mag = amp if (i // seg) % 2 == 0 else amp // quiet_div
        v = mag if (i // half_period) % 2 == 0 else -mag
        frames += struct.pack("<h", v)
    data = bytes(frames)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def documents_as_gated_audio(docs: DataFrame) -> DataFrame:
    """REAL WAV assets with an SQL-predictable gated envelope:

      n_samples = 512 + (doc_id * 29) % 512
      amplitude = 2000 + (doc_id * 7) % 10000
      seg       = 96 + (doc_id * 13) % 96      (half_period fixed at 8)
    """
    @F.pandas_udf(T.BinaryType())
    def encode(doc_id: pd.Series) -> pd.Series:
        def one(d):
            if d is None:
                return None
            d = int(d)
            return encode_wav_gated(
                512 + (d * 29) % 512,
                2000 + (d * 7) % 10000,
                8,
                96 + (d * 13) % 96,
            )

        return doc_id.map(one)

    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio/wav").alias("media_type"),
        encode(F.col("doc_id")).alias("payload"),
    )


def frame_energy(assets: DataFrame, win: int = 64) -> DataFrame:
    """Non-overlapping energy frames over decoded WAV assets: per frame
    of ``win`` samples, the exact integer sum of |sample| — the VAD
    front-end statistic. Arrow-batched mapInPandas; payloads never leave
    the executors."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("sum_abs", T.LongType()),
        ]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: list[tuple] = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                _, x = _decode_wav_samples(bytes(payload))
                n_frames = len(x) // win
                for f in range(n_frames):
                    fr = x[f * win : (f + 1) * win]
                    out.append(
                        (int(aid), f, int(np.abs(fr.astype("int64")).sum()))
                    )
            yield pd.DataFrame(
                out, columns=[c.name for c in schema.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema)


def ahash_bands(assets: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over decoded PPM assets, split
    into four 16-bit bands for pigeonhole near-dup joins.

    The classical recipe, integer-exact: nearest-neighbour sample an
    8x8 grid (sample (i, j) = pixel at row i*h//8, col j*w//8), value =
    r + g + b, bit(i, j) = 1 iff 64*value > sum-of-64-values (the mean
    comparison, cross-multiplied — no division anywhere). Band k packs
    rows 2k..2k+1 (16 bits, bit index (i-2k)*8 + j), so hamming <= 3
    pairs ALWAYS share at least one equal band (pigeonhole, the d20
    SimHash discipline). Assets narrower/shorter than 8px are skipped
    (no grid). Arrow-batched mapInPandas; payloads never leave the
    executors — the shuffle carries (asset_id, b0..b3) only."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("b0", T.LongType()),
            T.StructField("b1", T.LongType()),
            T.StructField("b2", T.LongType()),
            T.StructField("b3", T.LongType()),
        ]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: list[tuple] = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h, px = _decode_ppm_pixels(bytes(payload))
                if w < 8 or h < 8:
                    continue
                arr = px.astype(np.int64)
                ys = [(i * h) // 8 for i in range(8)]
                xs = [(j * w) // 8 for j in range(8)]
                vals = arr[np.ix_(ys, xs)].sum(axis=2)  # 8x8 gray sums
                total = int(vals.sum())
                bits = (64 * vals > total).astype(np.int64)
                bands = []
                for k in range(4):
                    word = 0
                    for i in range(2):
                        for j in range(8):
                            word |= int(bits[2 * k + i, j]) << (i * 8 + j)
                    bands.append(word)
                out.append((int(aid), *bands))
            yield pd.DataFrame(
                out, columns=[c.name for c in schema.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema)
