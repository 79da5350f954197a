"""LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) time-series
downsampling — the visual-fidelity downsampler TimescaleDB ships as
`lttb()`; the reference's continuous-aggregate family (SURVEY §2.11)
covers the same "serve a bounded number of points per series" need.

Semantics (classic LTTB): per series, keep the first and last points;
split the interior into n_buckets-2 equal-count buckets; walking left to
right, from each bucket select the point forming the LARGEST TRIANGLE
with the previously selected point and the centroid of the next bucket
(the next anchor is the last point for the final interior bucket).

The selection is inherently SEQUENTIAL within a series (each choice
feeds the next bucket's triangle) but embarrassingly parallel ACROSS
series — exactly the applyInPandas shape: one Arrow batch per key, a
tight integer loop inside, no state across keys. At 100 TB the operator
is one hash shuffle on the series key.

All arithmetic is exact int64: x is whole seconds rebased per series,
y is the scale-10^4 quantized value, and the triangle comparison uses
the centroid-count-multiplied cross product

    A = |(px*cm - sx) * (cy - py)  -  (px - cx) * (sy - py*cm)|

(cm, sx, sy = next-bucket count and coordinate sums), so an external
engine replays every choice bit-for-bit. Ties break to the lowest
event_id. Magnitudes: |x| <= series span in seconds, |y| <= 1e8-ish;
the products stay far inside int64.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame


def lttb_select(pdf: "pd.DataFrame", n_buckets: int) -> "pd.DataFrame":
    """LTTB over ONE series: pdf has columns (event_id, x, y), any order.
    Returns the selected rows' columns plus their selection order
    (sel_seq).

    Round-14 (guide §4.2): the per-series work is plain numpy — profiling
    showed the former pandas spelling spent ~half its time in
    ``sort_values`` (multi-key lexsort machinery) and most of the rest in
    per-group ``iloc``/``__setitem__``, dwarfing the selection loop
    itself at realistic series lengths. ``np.lexsort`` yields the
    identical (x, event_id) order — event_id is unique, so the total
    order is unambiguous — and the output frame is built once from
    sliced arrays. The argmax chain stays Python-int (arbitrary
    precision): the area cross-products exceed int64 for
    epoch-microsecond x values, so numpy vectorization would silently
    overflow; the formula, order and tie-breaks are unchanged."""
    import numpy as np
    import pandas as pd

    order = np.lexsort((pdf["event_id"].to_numpy(), pdf["x"].to_numpy()))
    xs = pdf["x"].to_numpy()[order]
    ys = pdf["y"].to_numpy()[order]
    eids = pdf["event_id"].to_numpy()[order]
    n = len(xs)
    if n <= n_buckets:
        return pd.DataFrame(
            {"event_id": eids, "x": xs, "y": ys, "sel_seq": np.arange(n)}
        )
    inner = n_buckets - 2
    # interior index i (1..n-2, 0-based) -> bucket ((i-1)*inner)//(n-2);
    # membership and per-bucket sums precomputed in ONE pass (round 13).
    buckets: list[list[int]] = [[] for _ in range(inner)]
    for i in range(1, n - 1):
        buckets[((i - 1) * inner) // (n - 2)].append(i)
    xl = [int(v) for v in xs]
    yl = [int(v) for v in ys]
    el = [int(v) for v in eids]
    bucket_sums = [
        (len(g), sum(xl[i] for i in g), sum(yl[i] for i in g))
        for g in buckets
    ]
    sel = [0]
    px, py = xl[0], yl[0]
    for b in range(inner):
        cand = buckets[b]
        if b < inner - 1:
            cm, sx, sy = bucket_sums[b + 1]
        else:
            cm, sx, sy = 1, xl[n - 1], yl[n - 1]
        best = None
        for i in cand:
            cx, cy = xl[i], yl[i]
            area = abs(
                (px * cm - sx) * (cy - py) - (px - cx) * (sy - py * cm)
            )
            key = (-area, el[i])
            if best is None or key < best[0]:
                best = (key, i)
        i = best[1]
        sel.append(i)
        px, py = xl[i], yl[i]
    sel.append(n - 1)
    idx = np.array(sel)
    return pd.DataFrame(
        {
            "event_id": eids[idx],
            "x": xs[idx],
            "y": ys[idx],
            "sel_seq": np.arange(len(sel)),
        }
    )


def lttb(
    df: "DataFrame",
    key_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    n_buckets: int = 16,
) -> "DataFrame":
    """Distributed LTTB: one applyInPandas per series key. Input columns
    must already be exact integers (rebase/quantize upstream). Output:
    (key, event_id, x, y, sel_seq)."""

    from pyspark.sql import functions as F

    def per_key(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # columns arrive pre-aliased (event_id, x, y) — no per-group rename
        out = lttb_select(pdf, n_buckets)
        out.insert(0, key_col, pdf[key_col].iloc[0])
        return out

    return (
        df.select(
            F.col(key_col),
            F.col(id_col).alias("event_id"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
        )
        .groupBy(key_col)
        .applyInPandas(
            per_key,
            schema=f"{key_col} long, event_id long, x long, y long, "
            "sel_seq long",
        )
    )
