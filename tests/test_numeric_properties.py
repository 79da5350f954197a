"""Permutation/partitioning invariance of the deterministic aggregates:
the quantised sum must be bit-identical regardless of row order or
partition count — the property that makes oracle hash-comparison sound."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from otterbrix_spark.functions.numeric import dsum, davg


def test_dsum_partition_invariance(spark):
    random.seed(7)
    values = [(i, random.uniform(-1e5, 1e5)) for i in range(20_000)]
    df = spark.createDataFrame(values, "k: int, v: double")

    results = set()
    for parts in (1, 7, 32):
        out = (
            df.repartition(parts)
            .agg(dsum(F.col("v"), "s"), davg(F.col("v"), "a"))
            .collect()[0]
        )
        results.add((out["s"], out["a"]))
    assert len(results) == 1  # bit-identical across partitionings


def test_dsum_matches_duckdb_quantisation(spark):
    import duckdb

    random.seed(11)
    values = [(random.uniform(-1e4, 1e4),) for _ in range(5_000)]
    df = spark.createDataFrame(values, "v: double")
    got = df.agg(dsum(F.col("v"), "s")).collect()[0]["s"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", values)
    want = con.sql(
        "SELECT CAST(SUM(CAST(FLOOR(v * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 FROM t"
    ).fetchone()[0]
    assert got == want
