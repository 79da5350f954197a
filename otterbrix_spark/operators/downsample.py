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
    """Pure-pandas LTTB over ONE series: pdf has columns
    (event_id, x, y), any order. Returns the selected rows' columns plus
    their selection order (sel_seq)."""
    import pandas as pd

    pdf = pdf.sort_values(["x", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    n = len(pdf)
    if n <= n_buckets:
        out = pdf.copy()
        out["sel_seq"] = range(n)
        return out
    xs = pdf["x"].to_numpy()
    ys = pdf["y"].to_numpy()
    eids = pdf["event_id"].to_numpy()
    inner = n_buckets - 2
    # interior index i (1..n-2, 0-based) -> bucket ((i-1)*inner)//(n-2).
    # Round-13 optimization (guide §4.2): membership and per-bucket sums
    # are precomputed in ONE pass — the former per-step re-scan of the
    # whole series made the loop O(n_buckets * n). Arithmetic stays
    # Python-int (arbitrary precision): the area cross-products exceed
    # int64 for epoch-microsecond x values, so numpy vectorization would
    # silently overflow; the formula, order and tie-breaks are unchanged.
    buckets: list[list[int]] = [[] for _ in range(inner)]
    for i in range(1, n - 1):
        buckets[((i - 1) * inner) // (n - 2)].append(i)
    bucket_sums = [
        (len(g), sum(int(xs[i]) for i in g), sum(int(ys[i]) for i in g))
        for g in buckets
    ]
    sel = [0]
    px, py = int(xs[0]), int(ys[0])
    for b in range(inner):
        cand = buckets[b]
        if b < inner - 1:
            cm, sx, sy = bucket_sums[b + 1]
        else:
            cm, sx, sy = 1, int(xs[n - 1]), int(ys[n - 1])
        best = None
        for i in cand:
            cx, cy = int(xs[i]), int(ys[i])
            area = abs(
                (px * cm - sx) * (cy - py) - (px - cx) * (sy - py * cm)
            )
            key = (-area, int(eids[i]))
            if best is None or key < best[0]:
                best = (key, i)
        i = best[1]
        sel.append(i)
        px, py = int(xs[i]), int(ys[i])
    sel.append(n - 1)
    out = pdf.iloc[sel].copy()
    out["sel_seq"] = range(len(sel))
    return out


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

    def per_key(pdf: "pd.DataFrame") -> "pd.DataFrame":
        key = pdf[key_col].iloc[0]
        out = lttb_select(
            pdf.rename(
                columns={id_col: "event_id", x_col: "x", y_col: "y"}
            )[["event_id", "x", "y"]],
            n_buckets,
        )
        out[key_col] = key
        return out[[key_col, "event_id", "x", "y", "sel_seq"]]

    return (
        df.select(key_col, id_col, x_col, y_col)
        .groupBy(key_col)
        .applyInPandas(
            per_key,
            schema=f"{key_col} long, event_id long, x long, y long, "
            "sel_seq long",
        )
    )
