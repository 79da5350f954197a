"""Scans, filters, projections, aggregates, sorts, set ops, DISTINCT,
LIMIT/OFFSET, string/arith/date functions, recursive CTEs — the single-table
half of the reference's operator inventory (SURVEY.md §2.1/2.2/2.4/2.6/2.7/
2.8/2.12), each as a Spark DataFrame plan + DuckDB oracle.

Scale notes common to all entries: every plan is declarative DataFrame API —
filters and projections reach the parquet scan (PushedFilters/ReadSchema),
aggregates are partial+final (map-side combine), sorts with LIMIT lower to
TakeOrderedAndProject (top-k, no global sort materialisation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otterbrix_spark.functions.numeric import dsum, davg, oracle_dsum, oracle_davg
from otterbrix_spark.operators.recursive import recursive_cte
from otterbrix_spark.sources.registry import load_table
from otterbrix_spark.workload import query


# --- q01: flagship pricing summary (TPC-H Q1 shape) -------------------------
# Reference runs this shape through full_scan -> match -> group -> sort
# (`operators/scan/full_scan.hpp`, `operator_group.cpp`, `operator_sort.hpp`).

_Q01_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {oracle_dsum('l_quantity', 'sum_qty')},
       {oracle_dsum('l_extendedprice', 'sum_base_price')},
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {oracle_davg('l_quantity', 'avg_qty')},
       {oracle_davg('l_extendedprice', 'avg_price')},
       {oracle_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", _Q01_ORACLE, doc="TPC-H Q1: scan+filter+agg+sort", bench=True)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # SQL-string aggregates: identical Catalyst trees to the Column form,
    # built in one py4j round-trip each (headline construction cost)
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = f"{disc_price} * (1 + l_tax)"
    return (
        li.filter(F.expr("l_shipdate <= TIMESTAMP_NTZ'1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.expr("COUNT(1) AS count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- q02: filter + LIKE + regex + projected arithmetic ----------------------
# Reference: operator_match with regex compare (LIKE lowered to regex at
# parse time, `transfrom_common.cpp:352-379`) + operator_select arithmetic.

_Q02_ORACLE = """
SELECT p_partkey, p_name, UPPER(p_brand) AS brand_uc,
       p_retailprice * CAST(1.1 AS DOUBLE) AS marked_up,
       p_size % 5 AS size_mod
FROM part
WHERE (p_name LIKE '%bolt%' OR regexp_matches(p_name, '^red '))
  AND p_size BETWEEN 1 AND 25
"""


@query("q02_filter_like_regex", _Q02_ORACLE, doc="LIKE + rlike + arithmetic projection")
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            (F.col("p_name").like("%bolt%") | F.col("p_name").rlike("^red "))
            & F.col("p_size").between(1, 25)
        )
        .select(
            "p_partkey",
            "p_name",
            F.upper("p_brand").alias("brand_uc"),
            (F.col("p_retailprice") * 1.1).alias("marked_up"),
            (F.col("p_size") % 5).alias("size_mod"),
        )
    )


# --- q06: single-filter global aggregate (TPC-H Q6 shape) -------------------

_Q06_ORACLE = f"""
SELECT {oracle_dsum('l_extendedprice * l_discount', 'revenue')},
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
"""


@query("q06_forecast_revenue", _Q06_ORACLE, doc="TPC-H Q6: filter + global agg", bench=True)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.expr(
        "l_shipdate >= TIMESTAMP_NTZ'1996-01-01'"
        " AND l_shipdate < TIMESTAMP_NTZ'1997-01-01'"
        " AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24"
    )).agg(
        dsum("l_extendedprice * l_discount", "revenue"),
        F.expr("COUNT(1) AS n"),
    )


# --- q16: SELECT DISTINCT ---------------------------------------------------
# Reference operator_distinct preserves first-occurrence order; Spark does
# not — the contract is set equality (SURVEY.md §7 risk register).

_Q16_ORACLE = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


@query("q16_distinct", _Q16_ORACLE, doc="SELECT DISTINCT multi-column")
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --- q17/q18: UNION / UNION ALL --------------------------------------------

_Q17_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
"""


@query("q17_union", _Q17_ORACLE, doc="UNION (dedup across branches)")
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("custkey"))
    b = orders.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    return a.union(b).distinct()


_Q18_ORACLE = """
SELECT src, COUNT(*) AS n FROM (
  SELECT 'cust' AS src, c_custkey AS k FROM customer WHERE c_acctbal > 5000
  UNION ALL
  SELECT 'ord' AS src, o_custkey AS k FROM orders WHERE o_totalprice > 200000
) GROUP BY src
"""


@query("q18_union_all", _Q18_ORACLE, doc="UNION ALL (concat, no dedup)")
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_acctbal") > 5000).select(
        F.lit("cust").alias("src"), F.col("c_custkey").alias("k")
    )
    b = orders.filter(F.col("o_totalprice") > 200000).select(
        F.lit("ord").alias("src"), F.col("o_custkey").alias("k")
    )
    return a.unionAll(b).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


# --- q19: ORDER BY + LIMIT + OFFSET ----------------------------------------
# Unique tie-break keys make the selected window deterministic across engines.

_Q19_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
"""


@query("q19_limit_offset", _Q19_ORACLE, doc="ORDER BY + LIMIT/OFFSET")
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
    )


# --- q20: GROUP BY + HAVING -------------------------------------------------
# Reference applies HAVING as a post-aggregation filter inside operator_group
# (`operator_group.cpp`); Spark expresses it as .filter after .agg.

_Q20_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_cust
FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 55
"""


@query("q20_having", _Q20_ORACLE, doc="GROUP BY + HAVING")
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") > 55)
    )


# --- q21: CASE / COALESCE as GROUP BY keys ----------------------------------
# Reference group_key_t supports plain columns, COALESCE and CASE WHEN
# expressions as keys (`operator_group.hpp:16-90`).

_Q21_ORACLE = """
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 250000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COALESCE(NULLIF(o_orderstatus, 'P'), '?') AS status,
       COUNT(*) AS n,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
FROM orders
GROUP BY 1, 2
"""


@query("q21_case_coalesce_keys", _Q21_ORACLE, doc="CASE/COALESCE expression group keys")
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("?")).alias("status")
    return orders.groupBy(bucket, status).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").cast("double").alias("min_price"),
    )


# --- q22: COUNT(*) vs COUNT(col) null semantics -----------------------------
# Reference test: `integration/cpp/test/test_sql_features.cpp:55-62`.

_Q22_ORACLE = """
SELECT COUNT(*) AS n_rows,
       COUNT(NULLIF(o_orderstatus, 'F')) AS n_not_f,
       COUNT(DISTINCT NULLIF(o_orderstatus, 'F')) AS n_distinct_not_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
FROM orders
"""


@query("q22_null_count_semantics", _Q22_ORACLE, doc="COUNT(*) vs COUNT(col) with NULLs")
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    not_f = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(not_f).alias("n_not_f"),
        F.countDistinct(not_f).alias("n_distinct_not_f"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
    )


# --- q23: ORDER BY computed key --------------------------------------------
# Reference operator_sort supports arithmetic sort keys (`operator_sort.hpp`).

_Q23_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net
FROM lineitem
ORDER BY net DESC, l_orderkey, l_linenumber
LIMIT 15
"""


@query("q23_sort_computed_key", _Q23_ORACLE, doc="ORDER BY arithmetic expression + top-k")
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .orderBy(F.col("net").desc(), "l_orderkey", "l_linenumber")
        .limit(15)
    )


# --- q24: string functions --------------------------------------------------
# Byte-length semantics per the reference's `length` kernel
# (`string_functions.cpp:179-253`): Spark octet_length == DuckDB strlen.

_Q24_ORACLE = """
SELECT p_partkey,
       SUBSTRING(p_name, 1, 4) AS pfx,
       UPPER(p_name) AS uc, LOWER(p_brand) AS lc,
       CAST(strlen(p_name) AS INT) AS byte_len,
       CAST(LENGTH(p_name) AS INT) AS char_len,
       REPLACE(p_name, ' ', '_') AS snake,
       REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS devowel,
       CONCAT(p_brand, ':', p_type) AS tagged
FROM part WHERE p_partkey < 100
"""


@query("q24_string_functions", _Q24_ORACLE, doc="substring/length(bytes)/regexp_replace/concat")
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") < 100).select(
        "p_partkey",
        F.substring("p_name", 1, 4).alias("pfx"),
        F.upper("p_name").alias("uc"),
        F.lower("p_brand").alias("lc"),
        F.octet_length("p_name").alias("byte_len"),
        F.length("p_name").alias("char_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devowel"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("tagged"),
    )


# --- q25: arithmetic / math / bitwise scalar functions ----------------------
# Reference scalar + update-expression surface: abs/round/floor/ceil/mod/pow/
# sqrt/cbrt/factorial + bitwise AND/OR/XOR/shifts
# (`expressions/forward.hpp:42-71`, `update_expression.hpp:17-39`).

_Q25_ORACLE = """
SELECT c_custkey,
       ABS(c_acctbal) AS abs_bal,
       CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)), 1) AS DOUBLE) AS round_bal,
       CAST(FLOOR(c_acctbal) AS DOUBLE) AS floor_bal,
       CAST(CEIL(c_acctbal) AS DOUBLE) AS ceil_bal,
       c_custkey % 7 AS mod7,
       POW(c_custkey % 5, 3) AS pow53,
       SQRT(ABS(c_acctbal)) AS sqrt_bal,
       CAST(FACTORIAL(CAST(c_custkey % 10 AS INT)) AS BIGINT) AS fact10,
       c_custkey & 255 AS band,
       c_custkey | 16 AS bor,
       XOR(c_custkey, 5) AS bxor,
       c_custkey << 2 AS shl,
       c_custkey >> 1 AS shr
FROM customer WHERE c_custkey < 200
"""


@query("q25_math_bitwise", _Q25_ORACLE, doc="abs/round/pow/sqrt/cbrt/factorial + bitwise ops")
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    bal = F.col("c_acctbal")
    return cust.filter(k < 200).select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        # round over an exact decimal, not a double: double-rounding tie
        # behaviour differs between engines; decimal HALF_UP matches DuckDB.
        F.round(bal.cast("decimal(18,2)"), 1).cast("double").alias("round_bal"),
        F.floor(bal).cast("double").alias("floor_bal"),
        F.ceil(bal).cast("double").alias("ceil_bal"),
        (k % 7).alias("mod7"),
        F.pow(k % 5, F.lit(3)).alias("pow53"),
        # sqrt is IEEE-correctly-rounded (portable); cbrt is libm-dependent
        # (Java vs C differ in the last ulp) and deliberately excluded.
        F.sqrt(F.abs(bal)).alias("sqrt_bal"),
        F.factorial((k % 10).cast("int")).alias("fact10"),
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(16)).alias("bor"),
        k.bitwiseXOR(F.lit(5)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
    )


# --- q26: date/time parts + truncation --------------------------------------

_Q26_ORACLE = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(MONTH(o_orderdate) AS INT) AS mth,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mstart,
       COUNT(*) AS n,
       {total}
FROM orders GROUP BY 1, 2, 3
""".format(total=oracle_dsum("o_totalprice", "total"))


@query("q26_date_parts", _Q26_ORACLE, doc="year/month extraction + date_trunc group")
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mth"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("mstart"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice"), "total"))
    )


# --- q27: interval arithmetic ----------------------------------------------
# Reference temporal rules: date ± interval (`types.hpp:351-382`).

_Q27_ORACLE = """
SELECT CAST(DATE_TRUNC('month', l_shipdate + INTERVAL 90 DAY) AS DATE) AS due_month,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate + INTERVAL 90 DAY < TIMESTAMP '1997-06-01'
GROUP BY 1
"""


@query("q27_interval_arith", _Q27_ORACLE, doc="timestamp + INTERVAL arithmetic")
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    due = F.col("l_shipdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.filter(due < F.lit("1997-06-01").cast("timestamp_ntz"))
        .groupBy(F.date_trunc("month", due).cast("date").alias("due_month"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- q28/q29: recursive CTEs (driver-side fixpoint) -------------------------

_Q28_ORACLE = """
WITH RECURSIVE t(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM t WHERE n < 25
)
SELECT n, n * n AS sq FROM t
"""


@query("q28_recursive_series", _Q28_ORACLE, doc="WITH RECURSIVE series generation")
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    anchor = spark.createDataFrame([(1,)], "n: bigint")

    def step(prev: DataFrame) -> DataFrame:
        return prev.filter(F.col("n") < 25).select((F.col("n") + 1).alias("n"))

    acc = recursive_cte(anchor, step, max_iter=50)
    return acc.select("n", (F.col("n") * F.col("n")).alias("sq"))


_Q29_ORACLE = """
WITH RECURSIVE tree(id, depth) AS (
  SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
  UNION ALL
  SELECT p.p_partkey, t.depth + 1
  FROM part p JOIN tree t ON (p.p_partkey - 1) // 2 = t.id
  WHERE p.p_partkey >= 1
)
SELECT depth, COUNT(*) AS n, MIN(id) AS min_id, MAX(id) AS max_id
FROM tree GROUP BY depth
"""


@query("q29_recursive_tree", _Q29_ORACLE, doc="WITH RECURSIVE graph traversal (heap-tree over part)")
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # edges: child p_partkey (>=1) -> parent (p_partkey-1) // 2, heap layout
    edges = part.filter(F.col("p_partkey") >= 1).select(
        F.col("p_partkey").alias("child"),
        F.floor((F.col("p_partkey") - 1) / 2).cast("bigint").alias("parent"),
    )
    anchor = spark.createDataFrame([(0, 0)], "id: bigint, depth: int")

    def step(prev: DataFrame) -> DataFrame:
        return (
            prev.join(edges, prev.id == edges.parent)
            .select(F.col("child").alias("id"), (F.col("depth") + 1).alias("depth"))
        )

    tree = recursive_cte(anchor, step, max_iter=64)
    return tree.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


# --- q30: ROLLUP (Spark-first extension; absent in reference §2.4) ----------

_Q30_ORACLE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       {oracle_dsum('l_quantity', 'qty')}
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@query("q30_rollup", _Q30_ORACLE, doc="GROUP BY ROLLUP subtotals (extension)")
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("l_quantity"), "qty")
    )


# --- q31: window top-k per group (Spark-first extension; §2.5 absent) -------

_Q31_ORACLE = """
SELECT c_nationkey, c_custkey, c_acctbal, rk FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer
) WHERE rk <= 3
"""


@query("q31_window_topk", _Q31_ORACLE, doc="ROW_NUMBER window top-k per group (extension)")
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --- q32: view expansion ----------------------------------------------------
# Reference expands views by re-parsing body SQL and splicing the subplan
# (`services/collection/executor.cpp:600-665`); Spark temp views resolve in
# the analyzer.

_Q32_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_rich
FROM customer WHERE c_acctbal > 8000
GROUP BY c_nationkey
"""


@query("q32_view", _Q32_ORACLE, doc="temp view definition + query-through")
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cust.filter(F.col("c_acctbal") > 8000).createOrReplaceTempView("otx_rich_customers")
    return spark.sql(
        "SELECT c_nationkey, COUNT(*) AS n_rich FROM otx_rich_customers GROUP BY c_nationkey"
    )


# --- q33: literal VALUES source (operator_raw_data) -------------------------

_Q33_ORACLE = """
SELECT r.r_name, t.bonus
FROM region r JOIN (VALUES (0, 10), (1, 20), (2, 30), (3, 40), (4, 50)) AS t(rk, bonus)
  ON r.r_regionkey = t.rk
"""


@query("q33_values_source", _Q33_ORACLE, doc="literal VALUES rows joined to a table")
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    vals = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 30), (3, 40), (4, 50)], "rk: int, bonus: int"
    )
    return region.join(F.broadcast(vals), region.r_regionkey == vals.rk).select(
        "r_name", "bonus"
    )


# --- q34: table-less SELECT -------------------------------------------------
# Reference full_scan doubles as the 1-synthetic-row source for `SELECT 2+3`
# (`full_scan.hpp:12-50`); Spark: range(1) + literal projection.

_Q34_ORACLE = "SELECT 5 AS v, 'ok' AS tag, CAST(2.5 * 4 AS DOUBLE) AS x"


@query("q34_select_noscan", _Q34_ORACLE, doc="table-less SELECT of constants")
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(
        F.lit(2 + 3).alias("v"),
        F.lit("ok").alias("tag"),
        F.lit(2.5 * 4).alias("x"),
    )
