"""Join family — inner/left/right/full/cross, equi + theta, multi-way —
mirroring the reference's `operator_join_t` (nested-loop, all types, theta
predicates — `operators/operator_join.hpp:12-80`) and `operator_hash_join_t`
(equi fast path — `operator_hash_join.hpp:13-60`).

Spark-first: every join is declared with `df.join(...)`; Catalyst picks
broadcast / shuffled-hash / sort-merge. We add explicit `F.broadcast` hints
on the fixed-size dimensions (region=5, nation=25 rows) so the plan never
shuffles a 100 TB fact table against a 5-row dim, and rely on AQE for
skew-splitting on the shuffled joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otterbrix_spark.functions.numeric import dsum, oracle_dsum
from otterbrix_spark.sources.registry import load_table
from otterbrix_spark.workload import query


# --- q03: 3-way equi join + agg + top-k (TPC-H Q3 shape) --------------------

_Q03_ORACLE = f"""
SELECT l_orderkey,
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       CAST(o_orderdate AS DATE) AS odate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q03_shipping_priority", _Q03_ORACLE, doc="TPC-H Q3: 3-way join + agg + top-k", bench=True)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # single-F.expr filters/conditions/aggregates: identical Catalyst
    # trees, ~5x fewer py4j round-trips (SCALE.md r13 decomposition)
    return (
        cust.filter(F.expr("c_mktsegment = 'BUILDING'"))
        .join(
            orders.filter(
                F.expr("o_orderdate < TIMESTAMP_NTZ'1998-03-15'")
            ),
            F.expr("c_custkey = o_custkey"),
        )
        .join(
            li.filter(F.expr("l_shipdate > TIMESTAMP_NTZ'1998-03-15'")),
            F.expr("l_orderkey = o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select(
            "l_orderkey", "revenue",
            F.expr("CAST(o_orderdate AS DATE) AS odate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- q05: 6-way join through broadcast dims (TPC-H Q5 shape) ----------------

_Q05_ORACLE = f"""
SELECT n_name,
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""


@query("q05_local_supplier", _Q05_ORACLE, doc="TPC-H Q5: 6-way join, broadcast dims", bench=True)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    # join conditions and the date band as single F.expr calls — same
    # Catalyst trees, a fraction of the py4j round-trips (q05 was the
    # chattiest headline construction; SCALE.md round-13 decomposition)
    return (
        F.broadcast(region.filter(F.expr("r_name = 'ASIA'")))
        .join(F.broadcast(nation), F.expr("n_regionkey = r_regionkey"))
        .join(cust, F.expr("c_nationkey = n_nationkey"))
        .join(
            orders.filter(F.expr(
                "o_orderdate >= TIMESTAMP_NTZ'1996-01-01'"
                " AND o_orderdate < TIMESTAMP_NTZ'1998-01-01'"
            )),
            F.expr("o_custkey = c_custkey"),
        )
        .join(li, F.expr("l_orderkey = o_orderkey"))
        .join(
            F.broadcast(supp),
            F.expr("s_suppkey = l_suppkey AND s_nationkey = c_nationkey"),
        )
        .groupBy("n_name")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.col("revenue").desc())
    )


# --- q07: CROSS JOIN --------------------------------------------------------

_Q07_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@query("q07_cross_join", _Q07_ORACLE, doc="explicit cross join")
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


# --- q08: theta join (non-equi predicate alongside equi key) ----------------
# Reference nested-loop join accepts arbitrary theta predicates
# (`operator_join.hpp:12-80`); Spark handles equi+theta as a hash join with
# residual condition, pure-theta as BNLJ.

_Q08_ORACLE = """
SELECT s_nationkey, COUNT(*) AS n_pairs,
       CAST(MAX(s_acctbal - c_acctbal) AS DOUBLE) AS max_gap
FROM supplier JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
GROUP BY s_nationkey
"""


@query("q08_theta_join", _Q08_ORACLE, doc="equi + theta join predicate")
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    joined = supp.join(
        cust,
        (supp.s_nationkey == cust.c_nationkey) & (supp.s_acctbal > cust.c_acctbal),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max(F.col("s_acctbal") - F.col("c_acctbal")).cast("double").alias("max_gap"),
    )


# --- q09: LEFT OUTER join ---------------------------------------------------

_Q09_ORACLE = """
SELECT n_name, COUNT(c_custkey) AS n_cust
FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey AND c_acctbal > 9500
GROUP BY n_name
"""


@query("q09_left_join", _Q09_ORACLE, doc="left outer join preserving unmatched dims")
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nation.join(
            cust.filter(F.col("c_acctbal") > 9500),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_cust"))
    )


# --- q10: RIGHT OUTER join --------------------------------------------------

_Q10_ORACLE = """
SELECT n_name, COUNT(s_suppkey) AS n_supp
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey AND s_acctbal > 5000
GROUP BY n_name
"""


@query("q10_right_join", _Q10_ORACLE, doc="right outer join")
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.filter(F.col("s_acctbal") > 5000)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_supp"))
    )


# --- q11: FULL OUTER join ---------------------------------------------------

_Q11_ORACLE = """
WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer
           WHERE c_acctbal > 9000 GROUP BY c_nationkey),
     s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier
           WHERE s_acctbal > 5000 GROUP BY s_nationkey)
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.k = s.k
"""


@query("q11_full_outer_join", _Q11_ORACLE, doc="full outer join of two aggregates")
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = (
        cust.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        supp.filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.ck == s.sk, "full").select(
        F.coalesce(F.col("ck"), F.col("sk")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


# --- q35: multi-table comma-FROM (left-deep cross-join tree) ----------------
# Reference synthesizes comma-lists into left-deep cross joins with the WHERE
# as the join predicate (`transform_select.cpp:345-430`).

_Q35_ORACLE = """
SELECT r_name, n_name, COUNT(*) AS n
FROM region, nation, supplier
WHERE n_regionkey = r_regionkey AND s_nationkey = n_nationkey
GROUP BY r_name, n_name
"""


@query("q35_comma_from", _Q35_ORACLE, doc="comma-FROM lowered to cross joins + WHERE")
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    # declared exactly as the reference lowers it: cross-join tree + filter;
    # Catalyst turns the filter back into equi-join conditions.
    return (
        region.crossJoin(nation)
        .crossJoin(supp)
        .filter(
            (F.col("n_regionkey") == F.col("r_regionkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey"))
        )
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
