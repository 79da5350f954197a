"""The main correctness gate, run locally: every registered workload query's
Spark result must match its DuckDB oracle exactly (row count, columns,
order-insensitive values) — the same comparison the driver performs."""

from __future__ import annotations

import pytest

from otterbrix_spark.workload import load_all
from tests.oracle import compare

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark_fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare(df, spec.oracle, sf_dir, name)


def test_l04_non_broadcast_branch_matches_oracle(spark, sf_dir, monkeypatch):
    """ADVICE r13: the >threshold edge path (planner-chosen joins + chunked
    adjacency) was never exercised by tests or captured plans. Force it by
    zeroing the broadcast gate and shrinking the skew chunk so the slice
    explode produces multi-row adjacencies, then oracle-compare — both plan
    branches must produce the identical triangle count."""
    from otterbrix_spark.workload import benchmark_shapes as bs

    spec = REGISTRY["l04_triangle_count"]
    # default branch first (bitmap/broadcast at small SFs)
    compare(spec.spark_fn(spark, sf_dir), spec.oracle, sf_dir, "l04-default")
    monkeypatch.setattr(bs, "L04_BROADCAST_EDGES", 0)
    monkeypatch.setattr(bs, "L04_CHUNK", 2)
    compare(spec.spark_fn(spark, sf_dir), spec.oracle, sf_dir, "l04-equijoin")


def test_d22_short_docs_yield_no_grams(spark, sf_dir, tmp_path):
    """ADVICE r8: a document with fewer than K=8 tokens must produce NO
    grams (Spark's sequence(1, n) is descending for n < 1 and the slice
    then crashed); the DuckDB oracle's range() is simply empty there.
    End-to-end: a corpus containing 1/7/8-token docs still hash-matches."""
    import os

    d = tmp_path / "sf_short"
    d.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, "one", "en", "web", 3),
        (2, "seven tokens only here for this doc", "en", "web", 36),
        (3, base, "en", "web", len(base)),  # exactly K tokens
        (4, base + " extra " + base, "en", "web", 1),  # dup 8-grams
        (5, base + " extra " + base, "en", "web", 1),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    pq.write_table(
        pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)}),
        str(d / "documents.parquet"),
    )
    spec = REGISTRY["d22_substring_span_removal"]
    compare(spec.spark_fn(spark, str(d)), spec.oracle, str(d), "d22-short")
