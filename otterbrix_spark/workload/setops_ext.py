"""Set-operation extensions and null-ordering semantics.

INTERSECT/EXCEPT have enum slots but no transform or operator in the
reference (`components/logical_plan/forward.hpp:21` — SURVEY.md §2.7);
Spark provides both natively, so we expose them as extensions.

Null ordering: Spark's default is NULLS FIRST for ASC (DuckDB's is NULLS
LAST) — every ORDER BY over nullable keys must pin the ordering explicitly,
which q43 gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otterbrix_spark.sources.registry import load_table
from otterbrix_spark.workload import query

# --- q41: INTERSECT ---------------------------------------------------------

_Q41_ORACLE = """
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9500
INTERSECT
SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000
"""


@query("q41_intersect", _Q41_ORACLE, doc="INTERSECT (extension; ref has enum slot only)")
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.filter(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("k"))
    b = supp.filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("k"))
    return a.intersect(b)


# --- q42: EXCEPT ------------------------------------------------------------

_Q42_ORACLE = """
SELECT n_nationkey AS k FROM nation
EXCEPT
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
"""


@query("q42_except", _Q42_ORACLE, doc="EXCEPT (extension)")
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    a = nation.select(F.col("n_nationkey").alias("k"))
    b = cust.filter(F.col("c_acctbal") > 9900).select(F.col("c_nationkey").alias("k"))
    return a.exceptAll(b).distinct()


# --- q43: ORDER BY with NULLs, ordering pinned explicitly -------------------

_Q43_ORACLE = """
SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status
FROM orders
WHERE o_orderkey < 500
ORDER BY status ASC NULLS FIRST, o_orderkey
LIMIT 50
"""


@query("q43_order_nulls", _Q43_ORACLE, doc="ORDER BY nullable key, NULLS FIRST pinned")
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status"),
        )
        .orderBy(F.col("status").asc_nulls_first(), F.col("o_orderkey"))
        .limit(50)
    )


# --- q52: null-safe equality (IS NOT DISTINCT FROM / <=>) -------------------

_Q52_ORACLE = """
SELECT COUNT(*) AS n_total,
       COUNT(CASE WHEN NULLIF(o_orderstatus, 'P')
                       IS NOT DISTINCT FROM NULLIF(o_orderpriority, '5-LOW')
             THEN 1 END) AS n_nullsafe_eq,
       COUNT(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL
                   AND NULLIF(o_orderstatus, 'P')
                       IS NOT DISTINCT FROM CAST(NULL AS VARCHAR)
             THEN 1 END) AS n_null_eq_null
FROM orders
"""


@query("q52_null_safe_eq", _Q52_ORACLE, doc="null-safe equality (<=> / IS NOT DISTINCT FROM)")
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    b = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    return orders.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(a.eqNullSafe(b), 1)).alias("n_nullsafe_eq"),
        F.count(
            F.when(a.isNull() & a.eqNullSafe(F.lit(None).cast("string")), 1)
        ).alias("n_null_eq_null"),
    )


# --- q77: INTERSECT ALL (bag semantics) --------------------------------------

_Q77_ORACLE = """
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
INTERSECT ALL
SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 3000
"""


@query("q77_intersect_all", _Q77_ORACLE, doc="INTERSECT ALL: multiset intersection keeps duplicates")
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("k"))
    b = supp.filter(F.col("s_acctbal") > 3000).select(F.col("s_nationkey").alias("k"))
    return a.intersectAll(b)


# --- q78: EXCEPT ALL (bag semantics) -----------------------------------------

_Q78_ORACLE = """
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
EXCEPT ALL
SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 3000
"""


@query("q78_except_all", _Q78_ORACLE, doc="EXCEPT ALL: multiset difference preserves surplus multiplicity")
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("k"))
    b = supp.filter(F.col("s_acctbal") > 3000).select(F.col("s_nationkey").alias("k"))
    return a.exceptAll(b)
