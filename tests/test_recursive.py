"""Recursive CTE driver tests — F6 hierarchy fixture shapes (FIXTURES.md):
transitive closure, depth computation, UNION-vs-UNION-ALL accumulation, and
cycle termination (the reference caps runaway recursion; our driver does the
same via max_iter and UNION-distinct semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from otterbrix_spark.operators.recursive import recursive_cte


def _edges(spark, rows):
    return spark.createDataFrame(rows, "child: bigint, parent: bigint")


def test_transitive_closure_depth(spark):
    # tree: 1 <- {2,3}, 2 <- {4,5}, 4 <- {6}
    edges = _edges(spark, [(2, 1), (3, 1), (4, 2), (5, 2), (6, 4)])
    anchor = spark.createDataFrame([(1, 0)], "id: bigint, depth: int")

    def step(prev):
        return prev.join(edges, prev.id == edges.parent).select(
            F.col("child").alias("id"), (F.col("depth") + 1).alias("depth")
        )

    out = {r["id"]: r["depth"] for r in recursive_cte(anchor, step).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3}


def test_union_distinct_terminates_on_cycle(spark):
    # 2-node cycle: 1 -> 2 -> 1 (the F6 cycle variant)
    edges = _edges(spark, [(2, 1), (1, 2)])
    anchor = spark.createDataFrame([(1,)], "id: bigint")

    def step(prev):
        return prev.join(edges, prev.id == edges.parent).select(
            F.col("child").alias("id")
        )

    # UNION semantics (distinct=True): already-seen rows leave the delta ->
    # fixpoint after visiting {1, 2}; no max_iter exhaustion
    out = recursive_cte(anchor, step, distinct=True, max_iter=10)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_union_all_cycle_capped_by_max_iter(spark):
    edges = _edges(spark, [(2, 1), (1, 2)])
    anchor = spark.createDataFrame([(1,)], "id: bigint")

    def step(prev):
        return prev.join(edges, prev.id == edges.parent).select(
            F.col("child").alias("id")
        )

    out = recursive_cte(anchor, step, distinct=False, max_iter=5)
    # anchor + 5 capped iterations of a 1-row delta
    assert out.count() == 6
