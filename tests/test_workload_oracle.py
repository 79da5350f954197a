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
