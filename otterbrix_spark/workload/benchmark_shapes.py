"""Benchmark-corpus shapes beyond TPC-H: the window-heavy TPC-DS templates,
the remaining distinctive ClickBench aggregation forms, and an LDBC SNB BI
shape (reference ships these query texts — `benchmark/SOURCES.md:1-19`,
`benchmark/tpcds/query51.tpl`, `query67.tpl`, `query47.tpl`,
`benchmark/ldbc/bi-1.sql`). Each is re-expressed over the synthetic corpus
with the SAME plan shape as the original template.

Float discipline: every SUM over doubles is the repo's quantised integer
sum (functions/numeric.py) and stays in integer space THROUGH the window
functions, dividing back to double only in the final projection — window
chains of exact integers hash-match across engines, window chains of
doubles do not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from otterbrix_spark.sources.registry import load_table
from otterbrix_spark.workload import query

_Q = 10000.0  # quantisation scale (functions/numeric.SCALE)


def _q(col) -> F.Column:
    return F.floor(col * F.lit(_Q)).cast("long")


# --- ds03: TPC-DS Q51 — cumulative channel comparison -----------------------
# Two sales channels aggregated per (item, period), each with a running
# cumulative sum, FULL OUTER joined on (item, period), then running MAXes
# over the joined frame and a cumulative-dominance filter. One shuffle per
# channel groupBy + one window shuffle on the same key — the partition-
# by-item layout reuses across both windows at any scale.

_DS03_ORACLE = """
WITH web_v1 AS (
  SELECT l_partkey % 25 AS item_band,
         date_trunc('month', l_shipdate)::DATE AS mon,
         SUM(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)))
           OVER (PARTITION BY l_partkey % 25
                 ORDER BY date_trunc('month', l_shipdate)::DATE
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
  FROM lineitem WHERE l_returnflag = 'R'
  GROUP BY 1, 2),
store_v1 AS (
  SELECT l_partkey % 25 AS item_band,
         date_trunc('month', l_shipdate)::DATE AS mon,
         SUM(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)))
           OVER (PARTITION BY l_partkey % 25
                 ORDER BY date_trunc('month', l_shipdate)::DATE
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
  FROM lineitem WHERE l_returnflag = 'A'
  GROUP BY 1, 2)
SELECT item_band, mon,
       CAST(web_cumulative AS DOUBLE) / 10000.0 AS web_cumulative,
       CAST(store_cumulative AS DOUBLE) / 10000.0 AS store_cumulative
FROM (
  SELECT COALESCE(w.item_band, s.item_band) AS item_band,
         COALESCE(w.mon, s.mon) AS mon,
         MAX(w.cume) OVER (PARTITION BY COALESCE(w.item_band, s.item_band)
                           ORDER BY COALESCE(w.mon, s.mon)
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS web_cumulative,
         MAX(s.cume) OVER (PARTITION BY COALESCE(w.item_band, s.item_band)
                           ORDER BY COALESCE(w.mon, s.mon)
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS store_cumulative
  FROM web_v1 w FULL OUTER JOIN store_v1 s
    ON w.item_band = s.item_band AND w.mon = s.mon
) y
WHERE web_cumulative > store_cumulative
"""


@query(
    "ds03_cumulative_channels", _DS03_ORACLE,
    doc="TPC-DS Q51 shape: per-channel cumulative windows + full outer + running max",
)
def ds03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def channel(flag: str) -> DataFrame:
        w = (
            Window.partitionBy("item_band").orderBy("mon")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy(
                (F.col("l_partkey") % 25).alias("item_band"),
                F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("mon"),
            )
            .agg(F.sum(_q(F.col("l_extendedprice"))).alias("part_sum"))
            .withColumn("cume", F.sum("part_sum").over(w))
            .drop("part_sum")
        )

    web, store = channel("R"), channel("A")
    joined = web.alias("w").join(
        store.alias("s"),
        (F.col("w.item_band") == F.col("s.item_band"))
        & (F.col("w.mon") == F.col("s.mon")),
        "full_outer",
    ).select(
        F.coalesce(F.col("w.item_band"), F.col("s.item_band")).alias("item_band"),
        F.coalesce(F.col("w.mon"), F.col("s.mon")).alias("mon"),
        F.col("w.cume").alias("wc"),
        F.col("s.cume").alias("sc"),
    )
    run = (
        Window.partitionBy("item_band").orderBy("mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn("web_cumulative", F.max("wc").over(run))
        .withColumn("store_cumulative", F.max("sc").over(run))
        .filter(F.col("web_cumulative") > F.col("store_cumulative"))
        .select(
            "item_band", "mon",
            (F.col("web_cumulative").cast("double") / _Q).alias("web_cumulative"),
            (F.col("store_cumulative").cast("double") / _Q).alias("store_cumulative"),
        )
    )


# --- ds04: TPC-DS Q67 — rank over rollup ------------------------------------
# ROLLUP over the product hierarchy, then a per-category rank of the rolled
# sums, keeping the top k of every partition. The rollup is one shuffle with
# partial aggregation; the rank is one window shuffle on the category key.
# row_number with a total tiebreak (not rank) keeps ties deterministic.

_DS04_ORACLE = """
WITH sums AS (
  SELECT p_type, p_brand,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
           AS qsum
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY ROLLUP (p_type, p_brand))
SELECT p_type, p_brand,
       CAST(qsum AS DOUBLE) / 10000.0 AS sumsales, rk
FROM (
  SELECT p_type, p_brand, qsum,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p_type
           ORDER BY qsum DESC, p_brand ASC NULLS FIRST) AS INT) AS rk
  FROM sums) ranked
WHERE rk <= 5
"""


@query(
    "ds04_rank_over_rollup", _DS04_ORACLE,
    doc="TPC-DS Q67 shape: top-k rank within category over a ROLLUP",
)
def ds04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sums = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .rollup("p_type", "p_brand")
        .agg(
            F.sum(
                _q(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("qsum")
        )
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("qsum").desc(), F.col("p_brand").asc_nulls_first()
    )
    return (
        sums.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            "p_type", "p_brand",
            (F.col("qsum").cast("double") / _Q).alias("sumsales"), "rk",
        )
    )


# --- ds05: TPC-DS Q47 — monthly sums vs in-partition average + neighbours ---
# Monthly sums per brand, the brand-year average via an unordered window,
# the previous/next month via lag/lead over the ordered window, and a
# deviation filter. All three windows share the brand partition key — one
# window shuffle total.

_DS05_ORACLE = """
WITH v1 AS (
  SELECT p_brand,
         EXTRACT(year FROM l_shipdate) AS yr,
         EXTRACT(month FROM l_shipdate) AS mon,
         SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS qsum
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3),
v2 AS (
  SELECT p_brand, yr, mon, qsum,
         SUM(qsum) OVER (PARTITION BY p_brand, yr) AS year_qsum,
         COUNT(*) OVER (PARTITION BY p_brand, yr) AS year_months,
         LAG(qsum) OVER (PARTITION BY p_brand ORDER BY yr, mon) AS prev_q,
         LEAD(qsum) OVER (PARTITION BY p_brand ORDER BY yr, mon) AS next_q
  FROM v1)
SELECT p_brand, CAST(yr AS INT) AS yr, CAST(mon AS INT) AS mon,
       CAST(qsum AS DOUBLE) / 10000.0 AS sum_sales,
       CAST(year_qsum AS DOUBLE) / year_months / 10000.0 AS avg_monthly_sales,
       CAST(prev_q AS DOUBLE) / 10000.0 AS psum,
       CAST(next_q AS DOUBLE) / 10000.0 AS nsum
FROM v2
WHERE year_qsum > 0
  AND abs(qsum * year_months - year_qsum) * 20 > year_qsum * year_months
"""


@query(
    "ds05_moving_deviation", _DS05_ORACLE,
    doc="TPC-DS Q47 shape: monthly sums vs window average with lag/lead neighbours",
)
def ds05(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    v1 = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(
            "p_brand",
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mon"),
        )
        .agg(F.sum(_q(F.col("l_extendedprice"))).alias("qsum"))
    )
    by_year = Window.partitionBy("p_brand", "yr")
    ordered = Window.partitionBy("p_brand").orderBy("yr", "mon")
    v2 = (
        v1.withColumn("year_qsum", F.sum("qsum").over(by_year))
        .withColumn("year_months", F.count(F.lit(1)).over(by_year))
        .withColumn("prev_q", F.lag("qsum").over(ordered))
        .withColumn("next_q", F.lead("qsum").over(ordered))
    )
    # deviation >5% stated in exact integer arithmetic:
    # |qsum - year_qsum/year_months| > 0.05 * year_qsum/year_months
    return (
        v2.filter(
            (F.col("year_qsum") > 0)
            & (
                F.abs(F.col("qsum") * F.col("year_months") - F.col("year_qsum")) * 20
                > F.col("year_qsum") * F.col("year_months")
            )
        )
        .select(
            "p_brand",
            F.col("yr").cast("int").alias("yr"),
            F.col("mon").cast("int").alias("mon"),
            (F.col("qsum").cast("double") / _Q).alias("sum_sales"),
            (
                F.col("year_qsum").cast("double") / F.col("year_months") / _Q
            ).alias("avg_monthly_sales"),
            (F.col("prev_q").cast("double") / _Q).alias("psum"),
            (F.col("next_q").cast("double") / _Q).alias("nsum"),
        )
    )


# --- ds06: TPC-DS Q70 — GROUPING() hierarchy rank ---------------------------
# Rank within each rollup LEVEL (lochierarchy = grouping(a)+grouping(b)),
# the shape Q36/Q70/Q86 share: the window partition key is derived from
# GROUPING() flags, so subtotal rows rank against other subtotals only.

_DS06_ORACLE = """
WITH sums AS (
  SELECT n_name, c_mktsegment,
         GROUPING(n_name) + GROUPING(c_mktsegment) AS lochierarchy,
         GROUPING(c_mktsegment) AS g_seg,
         SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS qsum
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY ROLLUP (n_name, c_mktsegment))
SELECT n_name, c_mktsegment,
       CAST(lochierarchy AS INT) AS lochierarchy,
       CAST(qsum AS DOUBLE) / 10000.0 AS total_sales,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY lochierarchy, CASE WHEN g_seg = 1 THEN n_name END
         ORDER BY qsum DESC, n_name ASC NULLS FIRST,
                  c_mktsegment ASC NULLS FIRST) AS INT) AS rank_within_parent
FROM sums
"""


@query(
    "ds06_grouping_rank", _DS06_ORACLE,
    doc="TPC-DS Q70 shape: rank within GROUPING()-derived hierarchy level",
)
def ds06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sums = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .rollup("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name") + F.grouping("c_mktsegment")).alias("lochierarchy"),
            F.grouping("c_mktsegment").alias("g_seg"),
            F.sum(_q(F.col("o_totalprice"))).alias("qsum"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_seg") == 1, F.col("n_name")),
    ).orderBy(
        F.col("qsum").desc(),
        F.col("n_name").asc_nulls_first(),
        F.col("c_mktsegment").asc_nulls_first(),
    )
    return sums.select(
        "n_name", "c_mktsegment",
        F.col("lochierarchy").cast("int").alias("lochierarchy"),
        (F.col("qsum").cast("double") / _Q).alias("total_sales"),
        F.row_number().over(w).cast("int").alias("rank_within_parent"),
    )


# --- c06: ClickBench — pattern filter + grouped distinct-ish profile --------
# The hits-table shape `WHERE URL LIKE '%x%' GROUP BY key ORDER BY cnt
# LIMIT k` (ClickBench Q21-Q23): a pushed string predicate, a two-key
# group, MIN/AVG profiles and a deterministic top-k via row_number.

_C06_ORACLE = """
WITH hits AS (
  SELECT source, lang, doc_id, n_chars
  FROM documents WHERE text LIKE '%data%'),
grouped AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(doc_id) AS BIGINT) AS sample_doc,
         CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_chars
  FROM hits GROUP BY source, lang)
SELECT source, lang, n, sample_doc, avg_chars
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, source, lang) AS rk
  FROM grouped) t
WHERE rk <= 20
"""


@query(
    "c06_pattern_profile", _C06_ORACLE,
    doc="ClickBench shape: pushed LIKE filter + grouped profile + top-k",
)
def c06(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grouped = (
        docs.filter(F.col("text").like("%data%"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").cast("long").alias("sample_doc"),
            (
                F.sum(F.col("n_chars").cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_chars"),
        )
    )
    w = Window.orderBy(F.col("n").desc(), F.col("source"), F.col("lang"))
    return (
        grouped.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("source", "lang", "n", "sample_doc", "avg_chars")
    )


# --- l01: LDBC SNB BI-1 — bucketed posting summary with share-of-total ------
# The BI-1 shape (`benchmark/ldbc/bi-1.sql`): CASE-bucketed dimensions over
# a time-filtered fact, count/avg/sum per bucket, and each bucket's share
# of the filtered total via a window over the aggregate — one groupBy
# shuffle plus one unpartitioned (single tiny row set) window.

_L01_ORACLE = """
WITH prep AS (
  SELECT EXTRACT(year FROM ts) AS event_year,
         event_type = 'purchase' AS is_purchase,
         CASE WHEN value < 25 THEN 0
              WHEN value < 50 THEN 1
              WHEN value < 75 THEN 2
              ELSE 3 END AS value_bucket,
         value
  FROM events WHERE event_type IS NOT NULL),
agg AS (
  SELECT event_year, is_purchase, value_bucket,
         CAST(COUNT(*) AS BIGINT) AS event_count,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 10000.0 AS avg_value,
         CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS sum_value
  FROM prep GROUP BY 1, 2, 3)
SELECT CAST(event_year AS INT) AS event_year, is_purchase,
       CAST(value_bucket AS INT) AS value_bucket,
       event_count, avg_value, sum_value,
       CAST(event_count AS DOUBLE) / SUM(event_count) OVER () AS pct_of_events
FROM agg
"""


@query(
    "l01_posting_summary", _L01_ORACLE,
    doc="LDBC BI-1 shape: bucketed summary + share-of-total window",
)
def l01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    prep = ev.filter(F.col("event_type").isNotNull()).select(
        F.year("ts").alias("event_year"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
        F.when(F.col("value") < 25, 0)
        .when(F.col("value") < 50, 1)
        .when(F.col("value") < 75, 2)
        .otherwise(3)
        .alias("value_bucket"),
        "value",
    )
    agg = prep.groupBy("event_year", "is_purchase", "value_bucket").agg(
        F.count(F.lit(1)).alias("event_count"),
        (
            F.sum(_q(F.col("value"))).cast("double") / F.count(F.lit(1)) / _Q
        ).alias("avg_value"),
        (F.sum(_q(F.col("value"))).cast("double") / _Q).alias("sum_value"),
    )
    return agg.select(
        F.col("event_year").cast("int").alias("event_year"),
        "is_purchase",
        F.col("value_bucket").cast("int").alias("value_bucket"),
        "event_count", "avg_value", "sum_value",
        (
            F.col("event_count").cast("double")
            / F.sum("event_count").over(Window.partitionBy())
        ).alias("pct_of_events"),
    )


# --- c07: ClickBench — multiple COUNT(DISTINCT) per group -------------------
# The hits-table shape `SELECT key, COUNT(DISTINCT UserID), COUNT(DISTINCT
# SearchPhrase) ... GROUP BY key` (ClickBench Q16-Q19 family): several
# distinct aggregates in one pass lower to Spark's Expand operator (one
# replicated row per distinct column, map-side partial dedup before the
# shuffle) — the multi-distinct plan that matters when each distinct
# column alone is too big to two-pass.

_C07_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
       CAST(COUNT(DISTINCT CAST(FLOOR(value) AS BIGINT)) AS BIGINT)
         AS distinct_values,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@query(
    "c07_multi_distinct", _C07_ORACLE,
    doc="ClickBench shape: multiple COUNT(DISTINCT) per group (Expand plan)",
)
def c07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct(F.floor("value").cast("long")).alias("distinct_values"),
        F.count(F.lit(1)).alias("n"),
    )


# --- l02: LDBC SNB BI-2 — tag evolution (split-window counts) ---------------
# The BI-2 shape (`benchmark/ldbc/bi-2.sql`): one scan of the fact windowed
# into two adjacent periods with conditional COUNTs, LEFT JOINed back onto
# the dimension so tags silent in BOTH periods still appear with 0/0, ordered
# by absolute difference. Period splitting happens INSIDE the aggregate
# (count(CASE WHEN ...)) — one fact scan, one shuffle on the tag key; the
# dimension side is tiny and broadcast. At 100 TB the fact scan prunes to the
# [start, end) range via the pushed timestamp filter before any shuffle.

_L02_ORACLE = """
WITH dim AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL),
detail AS (
  SELECT event_type,
         CAST(COUNT(CASE WHEN ts <  TIMESTAMP '2024-01-16 00:00:00'
                         THEN event_id END) AS BIGINT) AS count_p1,
         CAST(COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                         THEN event_id END) AS BIGINT) AS count_p2
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-31 00:00:00'
    AND event_type IS NOT NULL
  GROUP BY event_type
)
SELECT dim.event_type,
       COALESCE(count_p1, 0) AS count_p1,
       COALESCE(count_p2, 0) AS count_p2,
       ABS(COALESCE(count_p1, 0) - COALESCE(count_p2, 0)) AS diff
FROM dim LEFT JOIN detail ON dim.event_type = detail.event_type
ORDER BY diff DESC, dim.event_type
LIMIT 100
"""


@query(
    "l02_tag_evolution", _L02_ORACLE,
    doc="LDBC BI-2 shape: adjacent-period conditional counts + left join to dim",
)
def l02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    in_range = ev.filter(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-31 00:00:00").cast("timestamp"))
        & F.col("event_type").isNotNull()
    )
    detail = in_range.groupBy("event_type").agg(
        F.count(F.when(F.col("ts") < split, F.col("event_id"))).alias("count_p1"),
        F.count(F.when(F.col("ts") >= split, F.col("event_id"))).alias("count_p2"),
    )
    dim = (
        ev.filter(F.col("event_type").isNotNull())
        .select("event_type").distinct()
    )
    joined = dim.join(detail, "event_type", "left").select(
        "event_type",
        F.coalesce("count_p1", F.lit(0)).alias("count_p1"),
        F.coalesce("count_p2", F.lit(0)).alias("count_p2"),
        F.abs(
            F.coalesce("count_p1", F.lit(0)) - F.coalesce("count_p2", F.lit(0))
        ).alias("diff"),
    )
    return joined.orderBy(F.desc("diff"), "event_type").limit(100)


# --- l03: LDBC SNB BI-8 — central person scoring (full join of aggregates) --
# The BI-8 shape (`benchmark/ldbc/bi-8.sql`): two independent per-person
# scores (interest membership -> +100; message count in a window) FULL OUTER
# joined so a person with either score survives, then each person's score is
# augmented with the sum of their peers' scores. The reference's peer step is
# a LEFT JOIN through the knows edge list; re-expressed here with nation
# as the peer group, which admits the scale-safe rewrite: peer-sum = one
# groupBy(nation) of scores, then friend_score = nation_total - own score —
# linear, no self-join fan-out, same result as summing each peer list.

_L03_ORACLE = """
WITH interested AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
msg_score AS (
  SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS message_score
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
  GROUP BY o_custkey
),
person_score AS (
  SELECT COALESCE(i.c_custkey, m.c_custkey) AS c_custkey,
         CAST(CASE WHEN i.c_custkey IS NULL THEN 0 ELSE 100 END
              + COALESCE(m.message_score, 0) AS BIGINT) AS score
  FROM interested i FULL JOIN msg_score m ON i.c_custkey = m.c_custkey
),
with_nation AS (
  SELECT p.c_custkey, p.score, c.c_nationkey
  FROM person_score p JOIN customer c ON p.c_custkey = c.c_custkey
),
nation_total AS (
  SELECT c_nationkey, CAST(SUM(score) AS BIGINT) AS total
  FROM with_nation GROUP BY c_nationkey
)
SELECT w.c_custkey, w.score,
       CAST(n.total - w.score AS BIGINT) AS friends_score
FROM with_nation w JOIN nation_total n ON w.c_nationkey = n.c_nationkey
ORDER BY w.score + (n.total - w.score) DESC, w.c_custkey
LIMIT 100
"""


@query(
    "l03_central_person", _L03_ORACLE,
    doc="LDBC BI-8 shape: full join of score CTEs + linear peer-sum rewrite",
)
def l03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    interested = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("i_custkey")
    )
    msg = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .groupBy(F.col("o_custkey").alias("m_custkey"))
        .agg(F.count(F.lit(1)).alias("message_score"))
    )
    person = interested.join(
        msg, interested["i_custkey"] == msg["m_custkey"], "full"
    ).select(
        F.coalesce("i_custkey", "m_custkey").alias("c_custkey"),
        (
            F.when(F.col("i_custkey").isNull(), F.lit(0)).otherwise(F.lit(100))
            + F.coalesce("message_score", F.lit(0))
        ).cast("long").alias("score"),
    )
    with_nation = person.join(
        cust.select("c_custkey", "c_nationkey"), "c_custkey"
    )
    totals = with_nation.groupBy("c_nationkey").agg(
        F.sum("score").alias("total")
    )
    return (
        with_nation.join(totals, "c_nationkey")
        .select(
            "c_custkey", "score",
            (F.col("total") - F.col("score")).cast("long").alias("friends_score"),
        )
        .orderBy(F.desc(F.col("score") + F.col("friends_score")), "c_custkey")
        .limit(100)
    )


# --- b03: JOB — fact self-join with redundant transitive predicates ---------
# The second distinctive JOB form (`benchmark/job/16b.sql`, `17*.sql`): the
# same fact appears in TWO roles joined through a shared key (cast_info +
# movie_keyword both keyed on movie id), the WHERE carries REDUNDANT
# transitive equalities (a.id = b.id AND b.id = c.id AND a.id = c.id) the
# optimizer must collapse rather than double-join, plus OR-of-LIKE dim
# filters and MIN(string) aggregates. Per-key fan-out is bounded (lines
# per order ~ cast per movie), so the self-join is linear at any scale.

_B03_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       MIN(p.p_name) AS first_part,
       MIN(o.o_orderpriority) AS first_prio
FROM lineitem l1, lineitem l2, orders o, part p, supplier s
WHERE l1.l_orderkey = o.o_orderkey
  AND l2.l_orderkey = o.o_orderkey
  AND l1.l_orderkey = l2.l_orderkey
  AND l1.l_linenumber < l2.l_linenumber
  AND l1.l_partkey = p.p_partkey
  AND l2.l_suppkey = s.s_suppkey
  AND (p.p_name LIKE '%bolt%' OR p.p_name LIKE '%rod%')
  AND s.s_acctbal > 5000
"""


@query(
    "b03_job_self_join", _B03_ORACLE,
    doc="JOB shape: two-role fact self-join + transitive predicates + OR-of-LIKE",
)
def b03(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    l1 = li.select(
        F.col("l_orderkey").alias("k1"), F.col("l_linenumber").alias("ln1"),
        F.col("l_partkey").alias("pk1"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_linenumber").alias("ln2"),
        F.col("l_suppkey").alias("sk2"),
    )
    p = part.filter(
        F.col("p_name").like("%bolt%") | F.col("p_name").like("%rod%")
    ).select("p_partkey", "p_name")
    s = supp.filter(F.col("s_acctbal") > 5000).select("s_suppkey")
    return (
        l1.join(l2, (F.col("k1") == F.col("k2")) & (F.col("ln1") < F.col("ln2")))
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("k1") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("pk1") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("sk2") == F.col("s_suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_name").alias("first_part"),
            F.min("o_orderpriority").alias("first_prio"),
        )
    )


# --- c08: ClickBench — regexp-extracted group key + HAVING + top-k ----------
# The Q29 form: the GROUP BY key is itself a regexp extraction
# (REGEXP_REPLACE(Referer, ...)), aggregated with AVG(length()) and filtered
# by HAVING before a top-k. The extraction is a per-row projection that
# pipelines inside the scan stage — the group count, not the regexp, decides
# the shuffle. (Spark backreferences are $1, DuckDB's \\1 — each side uses
# its own dialect; the extracted keys are identical.)

_C08_ORACLE = r"""
SELECT k,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS l,
       CAST(COUNT(*) AS BIGINT) AS c,
       MIN(source) AS first_src
FROM (
  SELECT REGEXP_REPLACE(text, '^(\w+)\s.*$', '\1', 's') AS k, text, source
  FROM documents WHERE text <> ''
)
GROUP BY k
HAVING COUNT(*) > 5
ORDER BY l DESC, k
LIMIT 25
"""


@query(
    "c08_regex_group_key", _C08_ORACLE,
    doc="ClickBench Q29 shape: regexp-extracted group key + AVG(length) + HAVING",
)
def c08(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.filter(F.col("text") != "").select(
        F.regexp_replace("text", r"(?s)^(\w+)\s.*$", "$1").alias("k"),
        "text", "source",
    )
    return (
        keyed.groupBy("k")
        .agg(
            (F.sum(F.length("text")).cast("double") / F.count(F.lit(1))).alias("l"),
            F.count(F.lit(1)).alias("c"),
            F.min("source").alias("first_src"),
        )
        .filter(F.col("c") > 5)
        .orderBy(F.desc("l"), "k")
        .limit(25)
    )


# --- c09: ClickBench — wide expression-sum battery --------------------------
# The Q30 form: dozens of SUM(expr + i) over one scan — a stress on
# expression codegen width and single-pass partial aggregation (one scan,
# one map-side combine, 20 accumulators; never 20 passes). Sums are the
# repo's quantised integers so both engines agree bit-for-bit.

_C09_ORACLE = "SELECT " + ", ".join(
    f"CAST(SUM(CAST(FLOOR((value + {i}) * 10000.0) AS BIGINT)) AS BIGINT)"
    f" AS s{i:02d}" for i in range(20)
) + " FROM events"


@query(
    "c09_wide_sum_battery", _C09_ORACLE,
    doc="ClickBench Q30 shape: 20 expression sums in one single-pass aggregate",
)
def c09(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(*[
        F.sum(_q(F.col("value") + F.lit(i))).alias(f"s{i:02d}")
        for i in range(20)
    ])


# --- b04: SSB flight 2 — part-brand revenue per year ------------------------
# SSB Q2.1 template (reference `benchmark/ssb/q2-1.sql`): star join of the
# fact to part + supplier→geo dims, both filtered, grouped by (year, brand).
# Spark plan: fact scan with both dim filters pushed through broadcast hash
# joins (dims are small at any SF: part brands and the supplier→nation→
# region chain); one shuffle for the final (year, brand) aggregate — the
# canonical star-join plan at 100 TB.

_B04_ORACLE = """
SELECT CAST(YEAR(l_shipdate) AS INT) AS yr, p_brand,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
GROUP BY 1, 2
"""


@query(
    "b04_ssb_brand_revenue", _B04_ORACLE,
    doc="SSB Q2.1 shape: dual-dim-filtered star join grouped by (year, brand)",
)
def b04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    amer_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")
                        .select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(amer_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.year("l_shipdate").cast("int").alias("yr"), F.col("p_brand")
        )
        .agg((F.sum(_q(rev)).cast("double") / F.lit(_Q)).alias("revenue"))
    )


# --- b05: SSB flight 3 — geo-pair volume per year ---------------------------
# SSB Q3.1 template (`benchmark/ssb/q3-1.sql`): customer-nation × supplier-
# nation revenue matrix within one region and a year band. Two independent
# dim chains hang off the fact; both collapse to broadcast joins, the
# (c_nation, s_nation, year) aggregate is the only shuffle.

_B05_ORACLE = """
SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
       CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_regionkey = 2 AND sn.n_regionkey = 2
  AND YEAR(o_orderdate) BETWEEN 1996 AND 1999
GROUP BY 1, 2, 3
"""


@query(
    "b05_ssb_geo_matrix", _B05_ORACLE,
    doc="SSB Q3.1 shape: customer-nation x supplier-nation revenue within a region",
)
def b05(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    asia = nation.filter(F.col("n_regionkey") == 2)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.filter(F.year("o_orderdate").between(1996, 1999)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(asia.select(F.col("n_nationkey").alias("cnk"),
                                    F.col("n_name").alias("c_nation"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(asia.select(F.col("n_nationkey").alias("snk"),
                                    F.col("n_name").alias("s_nation"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .groupBy("c_nation", "s_nation",
                 F.year("o_orderdate").cast("int").alias("yr"))
        .agg((F.sum(_q(rev)).cast("double") / F.lit(_Q)).alias("revenue"))
    )


# --- b06: SSB flight 4 — profit per (year, customer nation) -----------------
# SSB Q4.1 template (`benchmark/ssb/q4-1.sql`): profit = revenue − supply
# cost (derived here from part retail price, as tpch_more derives partsupp),
# customer AND supplier chains both region-filtered, part mfgr-banded.
# The profit expression is quantised as ONE unit so both engines floor the
# identical double.

_B06_ORACLE = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, cn.n_name AS c_nation,
       CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
                            - l_quantity * p_retailprice * 0.1) * 10000.0)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE cn.n_regionkey = 1 AND sn.n_regionkey = 1
  AND p_type IN ('STANDARD', 'LARGE')
GROUP BY 1, 2
"""


@query(
    "b06_ssb_profit", _B06_ORACLE,
    doc="SSB Q4.1 shape: derived profit rollup, dual region-filtered chains",
)
def b06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    amer = nation.filter(F.col("n_regionkey") == 1)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * F.lit(0.1)
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type").isin("STANDARD", "LARGE"))
                        .select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(amer.select(F.col("n_nationkey").alias("cnk"),
                                    F.col("n_name").alias("c_nation"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(amer.select(F.col("n_nationkey").alias("snk"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"), "c_nation")
        .agg((F.sum(_q(profit)).cast("double") / F.lit(_Q)).alias("profit"))
    )


# --- ds07: TPC-DS Q1 — correlated average threshold -------------------------
# Template (`benchmark/tpcds/query1.tpl`): per-(customer, group) return
# totals; keep customers whose total exceeds 1.2x the average of their
# group. The correlated scalar subquery decorrelates into one extra
# aggregate over the SAME grouped frame + a broadcast-ready join — two
# shuffles total (both on the group key), never a per-row subquery.
# Totals stay quantised integers; the average is the exact division
# SUM/COUNT done identically in both engines.

_DS07_ORACLE = """
WITH ctr AS (
  SELECT o_custkey AS cust, c_nationkey AS nk,
         SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS total
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2),
nk_avg AS (
  SELECT nk, CAST(SUM(total) AS DOUBLE) / COUNT(*) AS avg_total
  FROM ctr GROUP BY nk)
SELECT c_name, CAST(ctr.total AS DOUBLE) / 10000.0 AS total_returns
FROM ctr
JOIN nk_avg  ON ctr.nk = nk_avg.nk
JOIN customer ON ctr.cust = c_custkey
WHERE CAST(ctr.total AS DOUBLE) > avg_total * 1.2
"""


@query(
    "ds07_return_outliers", _DS07_ORACLE,
    doc="TPC-DS Q1 shape: correlated avg threshold decorrelated to grouped join",
)
def ds07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ctr = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("cust"), F.col("c_nationkey").alias("nk"))
        .agg(F.sum(_q(F.col("l_extendedprice"))).alias("total"))
    )
    nk_avg = ctr.groupBy("nk").agg(
        (F.sum("total").cast("double") / F.count(F.lit(1))).alias("avg_total")
    )
    return (
        ctr.join(F.broadcast(nk_avg), "nk")
        .filter(F.col("total").cast("double") > F.col("avg_total") * 1.2)
        .join(cust, F.col("cust") == F.col("c_custkey"))
        .select(
            "c_name",
            (F.col("total").cast("double") / F.lit(_Q)).alias("total_returns"),
        )
    )


# --- ds08: TPC-DS Q88 — time-slice count battery ----------------------------
# Template (`benchmark/tpcds/query88.tpl`): one output row of eight counts,
# each counting a 3-hour slice under an OR-of-attributes predicate. The
# template's literal form is eight cross-joined scalar subqueries (the
# oracle keeps that shape); the Spark-first plan is ONE scan with eight
# conditional partial aggregates — 8x less I/O, no join at all.

_DS08_ORACLE = "SELECT * FROM " + ", ".join(
    f"(SELECT COUNT(*) AS h{3*i:02d}_{3*i+3:02d} FROM events"
    f" WHERE HOUR(ts) >= {3*i} AND HOUR(ts) < {3*i+3}"
    f" AND (event_type = 'click' OR value < 50.0)) s{i}"
    for i in range(8)
)


@query(
    "ds08_hour_slice_battery", _DS08_ORACLE,
    doc="TPC-DS Q88 shape: 8 sliced counts — one-pass conditional agg vs 8 subqueries",
)
def ds08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = (F.col("event_type") == "click") | (F.col("value") < 50.0)
    hr = F.hour("ts")
    return ev.agg(*[
        F.sum(
            F.when(base & (hr >= 3 * i) & (hr < 3 * i + 3), 1).otherwise(0)
        ).alias(f"h{3*i:02d}_{3*i+3:02d}")
        for i in range(8)
    ])


# --- ds09: TPC-DS Q34/Q73 — order-size bucket customers ---------------------
# Template (`benchmark/tpcds/query34.tpl`): tickets whose item count lands
# in a band, joined back to the customer. The inner aggregate groups by the
# FACT key (orderkey) — high cardinality, but partial aggregation collapses
# it map-side; the band filter then shrinks the join input to a sliver.

_DS09_ORACLE = """
SELECT c_name, o_orderkey, cnt
FROM (
  SELECT l_orderkey, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_orderkey
) oc
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE cnt BETWEEN 6 AND 7
"""


@query(
    "ds09_order_size_band", _DS09_ORACLE,
    doc="TPC-DS Q34 shape: per-order line-count band joined back to customers",
)
def ds09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    oc = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(6, 7))
    )
    return (
        oc.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "cnt")
    )


# --- ds10: TPC-DS Q59 — week-over-week revenue comparison -------------------
# Template (`benchmark/tpcds/query59.tpl`): weekly sales per group for two
# adjacent years, self-joined on (group, week) to form this-year/next-year
# ratios. Week buckets are (dayofyear-1)/7 — identical integer arithmetic
# in both engines (ISO-week functions differ at year boundaries). The CTE
# aggregates once; the self-join is a shuffle on the same (nk, wk) key the
# aggregate produced, so AQE reuses the partitioning.

_DS10_ORACLE = """
WITH wk AS (
  SELECT c_nationkey AS nk,
         CAST(YEAR(o_orderdate) AS INT) AS yr,
         CAST((DAYOFYEAR(o_orderdate) - 1) // 7 AS INT) AS wkno,
         SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2, 3)
SELECT a.nk, a.wkno,
       CAST(a.rev AS DOUBLE) / 10000.0 AS rev_1997,
       CAST(b.rev AS DOUBLE) / 10000.0 AS rev_1998,
       CAST(b.rev AS DOUBLE) / CAST(a.rev AS DOUBLE) AS wow_ratio
FROM wk a JOIN wk b ON a.nk = b.nk AND a.wkno = b.wkno AND b.yr = a.yr + 1
WHERE a.yr = 1997
"""


@query(
    "ds10_week_over_week", _DS10_ORACLE,
    doc="TPC-DS Q59 shape: weekly revenue self-joined across adjacent years",
)
def ds10(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    wk = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.year("o_orderdate").cast("int").alias("yr"),
            ((F.dayofyear("o_orderdate") - 1).cast("long") / F.lit(7))
            .cast("int").alias("wkno"),
        )
        .agg(F.sum(_q(F.col("o_totalprice"))).alias("rev"))
    )
    a = wk.filter(F.col("yr") == 1997).alias("a")
    b = wk.filter(F.col("yr") == 1998).alias("b")
    return (
        a.join(
            b,
            (F.col("a.nk") == F.col("b.nk")) & (F.col("a.wkno") == F.col("b.wkno")),
        )
        .select(
            F.col("a.nk").alias("nk"),
            F.col("a.wkno").alias("wkno"),
            (F.col("a.rev").cast("double") / F.lit(_Q)).alias("rev_1997"),
            (F.col("b.rev").cast("double") / F.lit(_Q)).alias("rev_1998"),
            (F.col("b.rev").cast("double") / F.col("a.rev").cast("double"))
            .alias("wow_ratio"),
        )
    )


# --- ds11: TPC-DS Q74/Q11 — year-over-year growth across two channels -------
# Template (`benchmark/tpcds/query74.tpl`): a UNION ALL CTE of per-customer
# yearly totals tagged by channel, self-joined four ways (two channels x
# two years); keep customers whose channel-A growth beats channel-B growth.
# Channels here are returnflag bands (R vs A). One aggregate feeds all four
# legs; the four-way self-join collapses to a single groupBy-pivot in the
# Spark plan — one shuffle instead of three joins.

_DS11_ORACLE = """
WITH year_total AS (
  SELECT o_custkey AS cust, l_returnflag AS chan,
         CAST(YEAR(o_orderdate) AS INT) AS yr,
         SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS total
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag IN ('R', 'A') AND YEAR(o_orderdate) IN (1997, 1998)
  GROUP BY 1, 2, 3)
SELECT c_name,
       CAST(r2.total AS DOUBLE) / CAST(r1.total AS DOUBLE) AS r_growth,
       CAST(a2.total AS DOUBLE) / CAST(a1.total AS DOUBLE) AS a_growth
FROM year_total r1
JOIN year_total r2 ON r1.cust = r2.cust AND r2.chan = 'R' AND r2.yr = 1998
JOIN year_total a1 ON r1.cust = a1.cust AND a1.chan = 'A' AND a1.yr = 1997
JOIN year_total a2 ON r1.cust = a2.cust AND a2.chan = 'A' AND a2.yr = 1998
JOIN customer ON r1.cust = c_custkey
WHERE r1.chan = 'R' AND r1.yr = 1997 AND r1.total > 0 AND a1.total > 0
  AND CAST(r2.total AS DOUBLE) / CAST(r1.total AS DOUBLE)
      > CAST(a2.total AS DOUBLE) / CAST(a1.total AS DOUBLE)
"""


@query(
    "ds11_yoy_channel_growth", _DS11_ORACLE,
    doc="TPC-DS Q74 shape: four-way year_total self-join folded to one pivot",
)
def ds11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    yt = (
        li.filter(F.col("l_returnflag").isin("R", "A"))
        .join(
            orders.filter(F.year("o_orderdate").isin(1997, 1998)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(*[
            F.sum(
                F.when(
                    (F.col("l_returnflag") == ch) & (F.year("o_orderdate") == yr),
                    _q(F.col("l_extendedprice")),
                ).otherwise(0)
            ).alias(f"{ch.lower()}{yr}")
            # a pivoted sum is only equivalent to the 4-way join when every
            # leg exists; presence flags below re-impose that
            for ch in ("R", "A") for yr in (1997, 1998)
        ] + [
            F.max(
                F.when(
                    (F.col("l_returnflag") == ch) & (F.year("o_orderdate") == yr), 1
                ).otherwise(0)
            ).alias(f"has_{ch.lower()}{yr}")
            for ch in ("R", "A") for yr in (1997, 1998)
        ])
    )
    r_growth = F.col("r1998").cast("double") / F.col("r1997").cast("double")
    a_growth = F.col("a1998").cast("double") / F.col("a1997").cast("double")
    return (
        yt.filter(
            (F.col("has_r1997") == 1) & (F.col("has_r1998") == 1)
            & (F.col("has_a1997") == 1) & (F.col("has_a1998") == 1)
            & (F.col("r1997") > 0) & (F.col("a1997") > 0)
        )
        .filter(r_growth > a_growth)
        .join(cust, F.col("cust") == F.col("c_custkey"))
        .select(
            "c_name",
            r_growth.alias("r_growth"),
            a_growth.alias("a_growth"),
        )
    )


# --- ds12: TPC-DS Q16 — EXISTS + NOT EXISTS distinct-count report -----------
# Template (`benchmark/tpcds/query16.tpl`): orders that have at least one
# row matching a condition (EXISTS — left-semi) and none matching another
# (NOT EXISTS — left-anti), then COUNT(DISTINCT) + totals per group. Both
# subqueries hit the same fact: the semi and anti collapse into ONE
# aggregate over l_orderkey computing both flags, replacing two shuffled
# joins with one.

_DS12_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS total_price
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o.o_orderkey
                    AND l2.l_linestatus = 'O'
                    AND l2.l_quantity > 45)
GROUP BY o_orderpriority
"""


@query(
    "ds12_exists_report", _DS12_ORACLE,
    doc="TPC-DS Q16 shape: EXISTS + NOT EXISTS fused into one per-key flag aggregate",
)
def ds12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    flags = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"),
        F.max(
            F.when(
                (F.col("l_linestatus") == "O") & (F.col("l_quantity") > 45), 1
            ).otherwise(0)
        ).alias("has_bad"),
    )
    keep = flags.filter((F.col("has_r") == 1) & (F.col("has_bad") == 0))
    return (
        orders.join(keep, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_q(F.col("o_totalprice"))).cast("double") / F.lit(_Q))
            .alias("total_price"),
        )
    )


# --- c10: ClickBench Q43 — minute-resolution series with pagination ---------
# `SELECT DATE_TRUNC('minute', EventTime), COUNT(*) ... GROUP BY 1 ORDER BY 1
# LIMIT 10 OFFSET 100` (reference `benchmark/clickbench/queries.sql:43`).
# Ordered pagination over a keyed aggregate: the sort key is the GROUP key,
# so Spark runs one partial-agg shuffle + a global TakeOrdered of
# offset+limit rows — no full sort materialisation.

_C10_ORACLE = """
SELECT CAST(DATE_TRUNC('minute', ts) AS TIMESTAMP) AS m,
       CAST(COUNT(*) AS BIGINT) AS page_views
FROM events
WHERE event_type IN ('view', 'click')
GROUP BY 1 ORDER BY m LIMIT 10 OFFSET 100
"""


@query(
    "c10_minute_series_page", _C10_ORACLE,
    doc="ClickBench Q43 shape: minute buckets, ordered pagination via offset",
)
def c10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("m"))
        .agg(F.count(F.lit(1)).alias("page_views"))
        .orderBy("m")
        .offset(100)
        .limit(10)
    )


# --- c11: ClickBench Q39 — top-k DESC with deep offset ----------------------
# The `ORDER BY PageViews DESC LIMIT 10 OFFSET 1000` pagination form.
# Ties are broken on the group key so the page boundary is deterministic in
# both engines (the published query relies on engine-stable sorts; a
# distributed engine must not).

_C11_ORACLE = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
FROM events WHERE event_type <> 'error'
GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10 OFFSET 10
"""


@query(
    "c11_topk_deep_offset", _C11_ORACLE,
    doc="ClickBench Q39 shape: top-k by count with offset pagination, keyed tiebreak",
)
def c11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") != "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .offset(10)
        .limit(10)
    )


# --- c12: ClickBench Q19 — key point lookup ---------------------------------
# `SELECT UserID FROM hits WHERE UserID = <const>`: the needle-in-haystack
# scan the reference's README positions against (its hybrid-storage
# point-lookup claim, README.md:79). In Spark the predicate reaches the
# parquet reader as a pushed filter + min/max row-group skip — asserted in
# the plan audit.

_C12_ORACLE = """
SELECT event_id, user_id, event_type FROM events WHERE user_id = 7
"""


@query(
    "c12_point_lookup", _C12_ORACLE,
    doc="ClickBench Q19 shape: single-key point lookup via pushed filter",
)
def c12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") == 7).select(
        "event_id", "user_id", "event_type"
    )


# --- c13: ClickBench Q23 — selective LIKE + raw-row top-k by time -----------
# `SELECT * FROM hits WHERE URL LIKE '%google%' ORDER BY EventTime LIMIT 10`:
# no aggregation at all — a filtered raw-row sort. Spark fuses this to
# TakeOrderedAndProject (per-partition top-10, then a 10-row merge on the
# driver), so the "sort" never shuffles the full filtered set.

_C13_ORACLE = """
SELECT event_id, ts, event_type, props
FROM events
WHERE props LIKE '%"k": 9%'
ORDER BY ts, event_id LIMIT 10
"""


@query(
    "c13_like_row_topk", _C13_ORACLE,
    doc="ClickBench Q23 shape: LIKE-filtered raw rows, top-k by event time",
)
def c13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like('%"k": 9%'))
        .select("event_id", "ts", "event_type", "props")
        .orderBy("ts", "event_id")
        .limit(10)
    )


# --- l04: LDBC BI-11 — triangle counting over a co-occurrence graph --------
# BI-11 (`benchmark/ldbc/bi-11.sql`) counts friend triangles with the
# canonical `p1.id < p2.id < p3.id` dedup ordering. Mapped here onto the
# supplier co-supply graph: an undirected edge links two suppliers that
# co-supplied >= 2 distinct orders. The edge build is a per-order pair
# self-join — bounded by order width (TPC-H orders have <= 7 lineitems),
# so it is linear in the fact, not quadratic in suppliers. The triangle
# enumeration is the standard distributed algorithm (Suri & Vassilvitskii,
# WWW'11): canonical src<dst edges joined E(a,b) |><| E(b,c) |><| E(a,c),
# each triangle emitted exactly once — three equi-join shuffles on edge
# endpoints, no cartesian anywhere.

_L04_ORACLE = """
WITH pairs AS (
  SELECT l1.l_suppkey AS s1, l2.l_suppkey AS s2, l1.l_orderkey AS okey
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey),
edges AS (
  SELECT s1, s2 FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT okey) >= 2)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM edges e1
JOIN edges e2 ON e1.s2 = e2.s1
JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
"""


# broadcast the adjacency only when the edge count proves it fits; module
# level so the non-broadcast branch is testable (monkeypatched to 0 in
# tests/test_plans.py — ADVICE r13)
L04_BROADCAST_EDGES = 5_000_000
# above-gate skew chunking: max out-neighbors per exploded adjacency row
L04_CHUNK = 4096


@query(
    "l04_triangle_count", _L04_ORACLE,
    doc="LDBC BI-11 shape: distributed triangle count over canonical edges",
)
def l04(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct BEFORE the pair self-join (round-13 batch B, guide §2.3):
    # deduping (l_orderkey, l_suppkey) on the base projection makes every
    # (okey, s1, s2) pair row unique, so the edge weight is a plain
    # map-side-combinable COUNT instead of COUNT(DISTINCT) — the distinct
    # aggregate re-shuffled the whole multi-million-row pair set on
    # (s1, s2, okey) before counting; the base distinct shuffles only the
    # 2-column lineitem projection. Same weights by construction.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("s2")
    )
    pairs = li.join(
        right,
        (F.col("l_orderkey") == F.col("r_okey"))
        & (F.col("l_suppkey") < F.col("s2")),
    ).select(F.col("l_suppkey").alias("s1"), "s2", "l_orderkey")
    edges = (
        pairs.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("s1", "s2")
        # spread the edge set across the cluster BEFORE pinning it: AQE
        # coalesces the small aggregate output to a few partitions, and
        # the broadcast-join triangle stage below inherits the
        # checkpoint's partitioning — without this the whole ~1e8-wedge
        # enumeration runs on those few tasks (guide §2.2)
        .repartition(spark.sparkContext.defaultParallelism, "s1")
        # the edge set feeds all three triangle-join arms; without the
        # checkpoint the per-order pair join + distinct-count runs three
        # times (round-13 sweep: zero ReusedExchange in the plan)
        .localCheckpoint(eager=False)
    )
    # Algorithm choice (guide §1.2 step 1, measured round 13): the wedge
    # join E(a,b) |><| E(b,c) |><| E(a,c) materializes every wedge as a
    # row — 79M wedge rows at sf0.1 for a 344k-edge graph, ~9s of pure
    # join machinery even with both probe arms broadcast (and 26s as
    # sort-merge). Edge-centric intersection counting computes the SAME
    # canonical count — for each edge (a,b), |N+(a) ∩ N+(b)| triangles,
    # N+ = out-neighbors under the s1<s2 orientation — touching each
    # adjacency list once per incident edge instead of once per wedge:
    # O(sum deg(a)+deg(b)) vs O(#wedges) work. Measured warm best-of-3
    # at sf0.1: 14.5s -> 4.2s, identical count, oracle-verified 3 SFs.
    # The adjacency table is node-grain (one row per supplier, list
    # bounded by max degree) and is broadcast only when the edge set is
    # small enough to prove it fits (the count also materializes the
    # lazy checkpoint); a larger graph keeps equi-joins on the planner's
    # strategy — the size gate, not the hint, is what scales.
    # ONE stats job sizes both branch decisions below (and materializes
    # the lazy checkpoint, as edges.count() did before round 14)
    stats = edges.agg(
        F.count(F.lit(1)).alias("m"),
        F.min("s2").alias("smin"),
        F.max("s2").alias("nmax"),
    ).collect()[0]
    m, smin, nmax = stats["m"], stats["smin"], stats["nmax"]
    # node-grain adjacency feeds BOTH join arms; pin it or the
    # collect_set aggregation runs twice (plan audit round 14). Same
    # 100 TB caveat as every localCheckpoint here: blocks live on
    # executors unreplicated — a production deployment would checkpoint()
    # to reliable storage instead (VERDICT r13 #4).
    adj = edges.groupBy("s1").agg(F.collect_set("s2").alias("nbrs"))
    if m <= L04_BROADCAST_EDGES:
        # Round-14 (guide §1.2 step 2): on DENSE graphs the per-edge
        # array_intersect cost is O(deg(a) + deg(b)) hash ops — ~700 per
        # edge here (68%-dense co-supply graph, avg out-degree ~344).
        # Encoding each out-neighbor set as a fixed-width int64 BITMAP
        # (node ids are small, dense integers) turns the intersection
        # into nmax/64 word-ANDs + popcounts — ~16 words vs ~700 probes
        # at sf0.1. Used only when provably cheaper AND exact: ids
        # non-negative and nmax² <= 64·m, i.e. words-per-node <= average
        # out-degree (sparse or high-id graphs keep array_intersect).
        # popcount(bits(a) AND bits(b)) = |N+(a) ∩ N+(b)| exactly.
        if smin is not None and smin >= 0 and nmax * nmax <= 64 * m:
            words = int(nmax) // 64 + 1
            adj = adj.select(
                "s1",
                F.expr(
                    f"transform(sequence(0, {words - 1}), w -> "
                    f"aggregate(filter(nbrs, x -> CAST(x DIV 64 AS INT) = w), "
                    f"0L, (acc, x) -> acc | shiftleft(1L, CAST(x % 64 AS INT))))"
                ).alias("nbrs"),
            )
            # UNROLLED popcount sum: higher-order lambdas (zip_with/
            # aggregate) are interpreted per element, which would eat the
            # bitmap win on the per-edge hot path; words is known at plan
            # time, so the fixed-width AND+bit_count chain compiles into
            # whole-stage codegen
            k = (
                F.expr(
                    " + ".join(
                        f"bit_count(element_at(na, {w + 1}) "
                        f"& element_at(nb, {w + 1}))"
                        for w in range(words)
                    )
                )
                .cast("long")
                .alias("k")
            )
        else:
            k = F.size(F.array_intersect("na", "nb")).cast("long").alias("k")
        adj = adj.localCheckpoint(eager=False)
        a1 = F.broadcast(
            adj.select(F.col("s1").alias("aa"), F.col("nbrs").alias("na"))
        )
        a2 = F.broadcast(
            adj.select(F.col("s1").alias("bb"), F.col("nbrs").alias("nb"))
        )
    else:
        # Above the broadcast gate the planner picks the join strategy;
        # round-14 adds SKEW handling (guide §2.5): a hub node's whole
        # out-list used to ride ONE row into every incident edge's
        # intersection — the probe-side adjacency is now exploded into
        # <= L04_CHUNK-element slices, so a hub's work spreads over
        # ceil(deg/CHUNK) rows (AQE skew-split can separate them) and
        # chunk intersections SUM to the exact |N+(a) ∩ N+(b)| because
        # the slices partition N+(a).
        adj = adj.localCheckpoint(eager=False)
        a1 = adj.select(
            F.col("s1").alias("aa"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST((size(nbrs) - 1) DIV {L04_CHUNK} "
                    f"AS INT)), c -> slice(nbrs, c * {L04_CHUNK} + 1, {L04_CHUNK}))"
                )
            ).alias("na"),
        )
        a2 = adj.select(F.col("s1").alias("bb"), F.col("nbrs").alias("nb"))
        k = F.size(F.array_intersect("na", "nb")).cast("long").alias("k")
    # inner joins are exact here: every edge's s1 has an out-list (it
    # contains at least s2), and an edge whose s2 has NO out-list would
    # contribute |N+(a) ∩ {}| = 0 — dropping it leaves the sum unchanged
    return (
        edges.join(a1, F.col("s1") == F.col("aa"))
        .join(a2, F.col("s2") == F.col("bb"))
        .select(k)
        # COALESCE: SUM over an empty edge set is NULL where the former
        # wedge-join COUNT(*) (and the oracle) return 0
        .agg(
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("triangles")
        )
    )


# --- l05: LDBC BI-4 — top-100 popular forums and their members' posts ------
# BI-4 (`benchmark/ldbc/bi-4.sql`): a top-k CTE (popular forums), an EXISTS
# membership semi-join on persons, and a LEFT JOIN whose ON clause filters
# messages to the top forums via IN — members with no qualifying message
# still appear with count 0. Mapped: "forums" = the 20 parts most ordered
# (by distinct orders), "members" = customers who ever bought a top part,
# "messages" = their returned (l_returnflag = 'R') lineitems on top parts.
# The top-k is tiny -> broadcast; membership is a semi-join; the left join
# keeps every member row (COUNT of NULL = 0, PG semantics).

_L05_ORACLE = """
WITH top_parts AS (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey
  ORDER BY COUNT(DISTINCT l_orderkey) DESC, l_partkey
  LIMIT 20)
SELECT c.c_custkey, c.c_name,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS returned_count
FROM customer c
LEFT JOIN (
    SELECT o.o_custkey, li.l_orderkey
    FROM orders o JOIN lineitem li ON li.l_orderkey = o.o_orderkey
    WHERE li.l_returnflag = 'R'
      AND li.l_partkey IN (SELECT l_partkey FROM top_parts)
  ) l ON l.o_custkey = c.c_custkey
WHERE EXISTS (
  SELECT 1 FROM orders o2
  JOIN lineitem li2 ON li2.l_orderkey = o2.o_orderkey
  WHERE o2.o_custkey = c.c_custkey
    AND li2.l_partkey IN (SELECT l_partkey FROM top_parts))
GROUP BY c.c_custkey, c.c_name
ORDER BY returned_count DESC, c.c_custkey
LIMIT 100
"""


@query(
    "l05_top_forum_members", _L05_ORACLE,
    doc="LDBC BI-4 shape: top-k CTE + EXISTS membership + filtered LEFT JOIN",
)
def l05(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    top_parts = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_ord"))
        .orderBy(F.desc("n_ord"), "l_partkey")
        .limit(20)
        .select("l_partkey")
    )
    bought_top = li.join(F.broadcast(top_parts), "l_partkey").join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    )
    members = cust.join(
        bought_top.select("o_custkey").distinct(),
        cust["c_custkey"] == F.col("o_custkey"),
        "left_semi",
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(top_parts), "l_partkey")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("o_custkey", "l_orderkey")
    )
    joined = members.join(
        returned, members["c_custkey"] == returned["o_custkey"], "left"
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(F.count("l_orderkey").alias("returned_count"))
        .orderBy(F.desc("returned_count"), "c_custkey")
        .limit(100)
    )


# --- l06: LDBC BI-9 — top thread initiators (agg -> join -> re-agg) --------
# BI-9 (`benchmark/ldbc/bi-9.sql`): a CTE pre-aggregates messages per
# thread root in a date range, joins the roots back to their creators, and
# re-aggregates per person (COUNT of threads + SUM of per-thread counts).
# Mapped: threads = orders, messages = lineitems shipped in the range,
# creators = customers. Two groupBy shuffles, one fact join; the inner
# aggregate's map-side combine keeps the join input small at any scale.

_L06_ORACLE = """
WITH mpp AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS line_count
  FROM lineitem
  WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
  GROUP BY l_orderkey)
SELECT c.c_custkey, c.c_name,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS thread_count,
       CAST(SUM(mpp.line_count) AS BIGINT) AS message_count
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN mpp ON o.o_orderkey = mpp.l_orderkey
WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
GROUP BY c.c_custkey, c.c_name
ORDER BY message_count DESC, c.c_custkey
LIMIT 100
"""


@query(
    "l06_thread_initiators", _L06_ORACLE,
    doc="LDBC BI-9 shape: pre-aggregate per thread, join creators, re-aggregate",
)
def l06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    mpp = (
        li.filter(
            F.col("l_shipdate").between("1995-01-01", "1995-06-30")
        )
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("line_count"))
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .filter(F.col("o_orderdate").between("1995-01-01", "1995-06-30"))
        .join(mpp, F.col("o_orderkey") == mpp["l_orderkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("thread_count"),
            F.sum("line_count").alias("message_count"),
        )
        .orderBy(F.desc("message_count"), "c_custkey")
        .limit(100)
    )


# --- l07: LDBC BI-5 — weighted activity score via pre-aggregated LEFT JOINs -
# BI-5 (`benchmark/ldbc/bi-5.sql`): message rows LEFT JOIN two independent
# pre-aggregated counts (replies, likes), COALESCE missing to 0, group by
# creator, then a weighted score `1*m + 2*r + 10*l` ranks the top 100.
# Mapped: messages = orders, replies = lineitem count per order, likes =
# returned-line count per order. Both side aggregates combine map-side
# before their joins; the two LEFT JOINs share the o_orderkey partitioning.

_L07_ORACLE = """
WITH replies AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_orderkey),
likes AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
detail AS (
  SELECT o.o_custkey,
         CAST(SUM(COALESCE(r.c, 0)) AS BIGINT) AS reply_count,
         CAST(SUM(COALESCE(lk.c, 0)) AS BIGINT) AS like_count,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS message_count
  FROM orders o
  LEFT JOIN replies r ON r.l_orderkey = o.o_orderkey
  LEFT JOIN likes lk ON lk.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey)
SELECT o_custkey AS person_id, reply_count, like_count, message_count,
       CAST(1 * message_count + 2 * reply_count + 10 * like_count
            AS BIGINT) AS score
FROM detail
ORDER BY score DESC, person_id
LIMIT 100
"""


@query(
    "l07_activity_score", _L07_ORACLE,
    doc="LDBC BI-5 shape: two pre-aggregated LEFT JOINs + weighted score",
)
def l07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    replies = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("rc"))
    likes = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_orderkey").alias("lk_key"))
        .agg(F.count(F.lit(1)).alias("lc"))
    )
    detail = (
        orders.join(
            replies, orders["o_orderkey"] == replies["l_orderkey"], "left"
        )
        .join(likes, orders["o_orderkey"] == F.col("lk_key"), "left")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.coalesce(F.col("rc"), F.lit(0))).alias("reply_count"),
            F.sum(F.coalesce(F.col("lc"), F.lit(0))).alias("like_count"),
            F.count("o_orderkey").alias("message_count"),
        )
    )
    return (
        detail.select(
            F.col("o_custkey").alias("person_id"),
            "reply_count", "like_count", "message_count",
            (
                F.col("message_count")
                + 2 * F.col("reply_count")
                + 10 * F.col("like_count")
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "person_id")
        .limit(100)
    )


# --- b07: JOB 10a form — global MIN over a cyclic join graph ----------------
# Every JOB query is `SELECT MIN(..), MIN(..) FROM <many tables> WHERE
# <selective dim predicates + join closure>` with NO group-by — the
# aggregate collapses a multi-million-row join to one row, and the join
# graph is cyclic (redundant closure edges like `t.id = mc.movie_id AND
# t.id = ci.movie_id AND ci.movie_id = mc.movie_id`,
# `benchmark/job/10a.sql`). Mapped: customer-orders-lineitem-part-supplier
# -nation with the cycle closed through c_nationkey = s_nationkey, two
# conjunctive LIKEs on p_name, an IN-list on nation, and a date range.
# Global min/max aggregate: partial min per partition, single-row merge —
# nothing materialises the join output at any scale.

_B07_ORACLE = """
SELECT MIN(p.p_name) AS first_part,
       MIN(c.c_name) AS first_customer,
       CAST(MIN(o.o_orderdate) AS DATE) AS earliest_order,
       CAST(COUNT(*) AS BIGINT) AS qualifying_rows
FROM customer c, orders o, lineitem l, part p, supplier s, nation n
WHERE c.c_custkey = o.o_custkey
  AND o.o_orderkey = l.l_orderkey
  AND l.l_partkey = p.p_partkey
  AND l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey
  AND p.p_name LIKE '%o%' AND p.p_name LIKE '%l%'
  AND n.n_name IN ('NATION_3', 'NATION_7', 'NATION_12', 'NATION_19')
  AND o.o_orderdate >= DATE '1995-01-01'
"""


@query(
    "b07_job_global_min", _B07_ORACLE,
    doc="JOB 10a shape: global MIN over cyclic join with conjunctive LIKEs",
)
def b07(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    p = part.filter(
        F.col("p_name").like("%o%") & F.col("p_name").like("%l%")
    )
    n = nation.filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_12", "NATION_19")
    )
    joined = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .filter(F.col("o_orderdate") >= "1995-01-01")
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(cust["c_nationkey"] == supp["s_nationkey"])
        .join(F.broadcast(n), supp["s_nationkey"] == n["n_nationkey"])
    )
    return joined.agg(
        F.min("p_name").alias("first_part"),
        F.min("c_name").alias("first_customer"),
        F.min("o_orderdate").cast("date").alias("earliest_order"),
        F.count(F.lit(1)).alias("qualifying_rows"),
    )


# --- b08: JOB 32a form — related entities through a bridge table ------------
# JOB 32a finds movies linked to keyword-matched movies through the
# movie_link bridge: seed dim filtered by LIKE -> fact -> bridge key ->
# fact again -> target dim, then global MIN. Mapped: parts co-ordered with
# any '%bolt%' part — seed parts to their orders (hop 1), back to the
# other lineitems of those orders (hop 2, a semi-join on l_orderkey), and
# out to the target parts with the seed family excluded. The seed order
# set is the semi-join build side; no pair-explosion materialises.

_B08_ORACLE = """
WITH seed_orders AS (
  SELECT DISTINCT l.l_orderkey
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%bolt%')
SELECT MIN(p2.p_name) AS first_related,
       CAST(COUNT(DISTINCT p2.p_partkey) AS BIGINT) AS n_related_parts,
       CAST(COUNT(*) AS BIGINT) AS n_colines
FROM lineitem l2
JOIN part p2 ON l2.l_partkey = p2.p_partkey
WHERE l2.l_orderkey IN (SELECT l_orderkey FROM seed_orders)
  AND p2.p_name NOT LIKE '%bolt%'
"""


@query(
    "b08_job_bridge", _B08_ORACLE,
    doc="JOB 32a shape: two-hop bridge via seed-order semi-join, global MIN",
)
def b08(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    seed_parts = part.filter(F.col("p_name").like("%bolt%"))
    seed_orders = (
        li.join(F.broadcast(seed_parts), li["l_partkey"] == seed_parts["p_partkey"])
        .select("l_orderkey")
        .distinct()
    )
    target = part.filter(~F.col("p_name").like("%bolt%"))
    hop2 = li.join(seed_orders, "l_orderkey", "left_semi")
    joined = hop2.join(
        F.broadcast(target), hop2["l_partkey"] == target["p_partkey"]
    )
    return joined.agg(
        F.min("p_name").alias("first_related"),
        F.countDistinct("p_partkey").alias("n_related_parts"),
        F.count(F.lit(1)).alias("n_colines"),
    )


# --- ds13: TPC-DS Q38 — COUNT over a three-way INTERSECT of channels -------
# Q38 (`benchmark/tpcds/query38.tpl`): customers active in ALL THREE sales
# channels in a window — `SELECT COUNT(*) FROM (distinct-tuples INTERSECT
# distinct-tuples INTERSECT distinct-tuples)`. Mapped: users with view,
# click AND purchase activity on the same calendar day. Spark lowers each
# INTERSECT to a LeftSemi over the distinct sets, so the three channel
# scans reduce map-side before any pair meets — never a materialised
# three-way product.

_DS13_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS hot_users FROM (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'view'
  INTERSECT
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
) hot_cust
"""


@query(
    "ds13_channel_intersect", _DS13_ORACLE,
    doc="TPC-DS Q38 shape: COUNT over three-way INTERSECT of channel tuples",
)
def ds13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def channel(kind: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == kind)
            .select("user_id", F.col("ts").cast("date").alias("d"))
            .distinct()
        )

    hot = channel("view").intersect(channel("click")).intersect(
        channel("purchase")
    )
    return hot.agg(F.count(F.lit(1)).alias("hot_users"))


# --- ds14: TPC-DS Q93 — returns netting via fact-to-fact LEFT JOIN ---------
# Q93 (`benchmark/tpcds/query93.tpl`): store_sales LEFT OUTER JOIN
# store_returns on the composite (item, ticket) key, a tiny `reason` dim
# filter on the returns side, and a CASE that nets returned quantity out
# of the sale before re-aggregating per customer. Mapped: returns = the
# R-flagged lines of suppliers in one nation (the selective "reason"),
# keyed (l_orderkey, l_linenumber); act_sales nets half the quantity when
# a return matches. Both fact sides shuffle on the same composite key —
# one co-partitioned SMJ, no replication of the big side.

_DS14_ORACLE = """
WITH returns AS (
  SELECT li.l_orderkey AS r_okey, li.l_linenumber AS r_line,
         FLOOR(li.l_quantity / 2) AS ret_qty
  FROM lineitem li JOIN supplier s ON li.l_suppkey = s.s_suppkey
  WHERE li.l_returnflag = 'R' AND s.s_nationkey = 5),
netted AS (
  SELECT o.o_custkey,
         CASE WHEN r.ret_qty IS NOT NULL
              THEN (l.l_quantity - r.ret_qty) * l.l_extendedprice
              ELSE l.l_quantity * l.l_extendedprice END AS act_sales
  FROM lineitem l
  LEFT JOIN returns r
    ON l.l_orderkey = r.r_okey AND l.l_linenumber = r.r_line
  JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT o_custkey,
       CAST(SUM(CAST(FLOOR(act_sales * 10000.0) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS sumsales
FROM netted
GROUP BY o_custkey
ORDER BY sumsales, o_custkey
LIMIT 100
"""


@query(
    "ds14_returns_netting", _DS14_ORACLE,
    doc="TPC-DS Q93 shape: composite-key LEFT JOIN returns netting",
)
def ds14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    returns = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            F.broadcast(supp.filter(F.col("s_nationkey") == 5)),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .select(
            F.col("l_orderkey").alias("r_okey"),
            F.col("l_linenumber").alias("r_line"),
            F.floor(F.col("l_quantity") / 2).alias("ret_qty"),
        )
    )
    netted = (
        li.join(
            returns,
            (li["l_orderkey"] == returns["r_okey"])
            & (li["l_linenumber"] == returns["r_line"]),
            "left",
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            "o_custkey",
            F.when(
                F.col("ret_qty").isNotNull(),
                (F.col("l_quantity") - F.col("ret_qty"))
                * F.col("l_extendedprice"),
            )
            .otherwise(F.col("l_quantity") * F.col("l_extendedprice"))
            .alias("act_sales"),
        )
    )
    return (
        netted.groupBy("o_custkey")
        .agg((F.sum(_q(F.col("act_sales"))).cast("double") / _Q).alias("sumsales"))
        .orderBy("sumsales", "o_custkey")
        .limit(100)
    )


# --- ds15: TPC-DS Q64 — two-year snapshot self-join -------------------------
# Q64 (`benchmark/tpcds/query64.tpl`): the cross-channel item/store rollup
# is computed once per year and joined WITH ITSELF on the item/store key
# with `cnt(y+1) <= cnt(y)` — the "did this cohort shrink" snapshot
# topology. Mapped: per-part yearly (orders, revenue) snapshots for 1995
# and 1996 joined on partkey where the 1996 revenue did not grow. Both
# sides are the SAME groupBy shuffle key, so the self-join is
# co-partitioned — no re-shuffle of either snapshot at any scale.

_DS15_ORACLE = """
WITH snap AS (
  SELECT l_partkey AS pkey, EXTRACT(YEAR FROM l_shipdate) AS yr,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0)
                  AS BIGINT)) AS qrev
  FROM lineitem
  WHERE EXTRACT(YEAR FROM l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2)
SELECT a.pkey AS partkey,
       a.n_lines AS lines_1995, b.n_lines AS lines_1996,
       CAST(a.qrev AS DOUBLE) / 10000.0 AS rev_1995,
       CAST(b.qrev AS DOUBLE) / 10000.0 AS rev_1996
FROM snap a JOIN snap b ON a.pkey = b.pkey
WHERE a.yr = 1995 AND b.yr = 1996 AND b.qrev <= a.qrev
ORDER BY partkey
LIMIT 100
"""


@query(
    "ds15_snapshot_selfjoin", _DS15_ORACLE,
    doc="TPC-DS Q64 shape: per-year snapshot aggregate self-joined across "
        "consecutive years on the grouping key",
)
def ds15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    snap = (
        li.filter(F.year("l_shipdate").isin(1995, 1996))
        .groupBy(
            F.col("l_partkey").alias("pkey"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                _q(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("qrev"),
        )
    )
    a = snap.filter(F.col("yr") == 1995).alias("a")
    b = snap.filter(F.col("yr") == 1996).alias("b")
    return (
        a.join(b, F.col("a.pkey") == F.col("b.pkey"))
        .filter(F.col("b.qrev") <= F.col("a.qrev"))
        .select(
            F.col("a.pkey").alias("partkey"),
            F.col("a.n_lines").alias("lines_1995"),
            F.col("b.n_lines").alias("lines_1996"),
            (F.col("a.qrev").cast("double") / _Q).alias("rev_1995"),
            (F.col("b.qrev").cast("double") / _Q).alias("rev_1996"),
        )
        .orderBy("partkey")
        .limit(100)
    )


# --- ds16: TPC-DS Q78 — cross-channel ratio over an anti-joined channel -----
# Q78 (`benchmark/tpcds/query78.tpl`): store sales per (year, customer)
# EXCLUDING returned tickets (LEFT JOIN store_returns ... WHERE sr_ticket
# IS NULL — an anti-join), LEFT JOINed against the other channels' rollups
# and reported as a ratio where the other channel is non-empty. Mapped:
# channel = supplier-key parity; "returned" = any order containing an
# R-flagged line (order-level anti-join, not a per-line flag filter — the
# Q78 topology). Ratio = clean even-channel revenue / odd-channel revenue.

_DS16_ORACLE = """
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
chan_a AS (
  SELECT o.o_custkey AS cust, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS a_qty,
         SUM(CAST(FLOOR(l.l_extendedprice * 10000.0) AS BIGINT)) AS a_qamt
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_suppkey % 2 = 0
    AND NOT EXISTS (SELECT 1 FROM returned r
                    WHERE r.l_orderkey = l.l_orderkey)
  GROUP BY 1, 2),
chan_b AS (
  SELECT o.o_custkey AS cust, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
         SUM(CAST(FLOOR(l.l_extendedprice * 10000.0) AS BIGINT)) AS b_qamt
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_suppkey % 2 = 1
  GROUP BY 1, 2)
SELECT a.cust AS custkey, a.yr AS yr, a.a_qty AS clean_qty,
       CAST(a.a_qamt AS DOUBLE) / 10000.0 AS clean_amt,
       CAST(a.a_qamt AS DOUBLE) / CAST(b.b_qamt AS DOUBLE) AS channel_ratio
FROM chan_a a JOIN chan_b b ON a.cust = b.cust AND a.yr = b.yr
WHERE b.b_qamt > 0
ORDER BY channel_ratio DESC, custkey, yr
LIMIT 100
"""


@query(
    "ds16_channel_ratio_anti", _DS16_ORACLE,
    doc="TPC-DS Q78 shape: per-customer-year channel ratio with the "
        "primary channel anti-joined against returned orders",
)
def ds16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    ).distinct()
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    chan_a = (
        li.filter(F.col("l_suppkey") % 2 == 0)
        .join(returned, "l_orderkey", "left_anti")
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("a_qty"),
            F.sum(_q(F.col("l_extendedprice"))).alias("a_qamt"),
        )
    )
    chan_b = (
        joined.filter(F.col("l_suppkey") % 2 == 1)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum(_q(F.col("l_extendedprice"))).alias("b_qamt"))
    )
    return (
        chan_a.join(chan_b, ["cust", "yr"])
        .filter(F.col("b_qamt") > 0)
        .select(
            F.col("cust").alias("custkey"),
            F.col("yr"),
            F.col("a_qty").alias("clean_qty"),
            (F.col("a_qamt").cast("double") / _Q).alias("clean_amt"),
            (F.col("a_qamt").cast("double") / F.col("b_qamt").cast("double"))
            .alias("channel_ratio"),
        )
        .orderBy(F.col("channel_ratio").desc(), "custkey", "yr")
        .limit(100)
    )


# --- ds17: TPC-DS Q23 — frequent-item / best-customer cross-shop ------------
# Q23 (`benchmark/tpcds/query23.tpl`): two independently-derived filter
# sets — items sold frequently in a period (HAVING count > k) and
# customers whose spend clears 95% of the MAX per-customer spend (a scalar
# aggregate reused inside a HAVING) — then the fact re-enters through BOTH
# sets to a single total. Mapped: frequent parts 1995-1996, best customers
# by order spend vs 0.95 * max, revenue of their 1997 lines. The scalar
# max broadcasts; both filter sets meet the fact as LeftSemi joins.

_DS17_ORACLE = """
WITH freq_parts AS (
  SELECT l_partkey FROM lineitem
  WHERE EXTRACT(YEAR FROM l_shipdate) IN (1995, 1996)
  GROUP BY l_partkey HAVING COUNT(*) > 8),
cust_spend AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS qspend
  FROM orders GROUP BY o_custkey),
best_cust AS (
  SELECT o_custkey FROM cust_spend
  WHERE qspend > 0.95 * (SELECT MAX(qspend) FROM cust_spend))
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                           * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0
         AS cross_shop_rev
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE EXTRACT(YEAR FROM l.l_shipdate) = 1997
  AND l.l_partkey IN (SELECT l_partkey FROM freq_parts)
  AND o.o_custkey IN (SELECT o_custkey FROM best_cust)
"""


@query(
    "ds17_frequent_crossshop", _DS17_ORACLE,
    doc="TPC-DS Q23 shape: frequent-item and scalar-max best-customer "
        "filter sets semi-joined into the fact",
)
def ds17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    freq_parts = (
        li.filter(F.year("l_shipdate").isin(1995, 1996))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 8)
        .select("l_partkey")
    )
    cust_spend = orders.groupBy("o_custkey").agg(
        F.sum(_q(F.col("o_totalprice"))).alias("qspend")
    )
    max_spend = cust_spend.agg(F.max("qspend").alias("max_spend"))
    best_cust = (
        cust_spend.join(F.broadcast(max_spend))
        .filter(F.col("qspend") > 0.95 * F.col("max_spend"))
        .select("o_custkey")
    )
    return (
        li.filter(F.year("l_shipdate") == 1997)
        .join(freq_parts, "l_partkey", "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(best_cust, "o_custkey", "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(
                    _q(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                ).cast("double")
                / _Q
            ).alias("cross_shop_rev"),
        )
    )


# --- ds18: TPC-DS Q95 — ship-together orders via EXISTS / NOT EXISTS --------
# Q95 (`benchmark/tpcds/query95.tpl`): web orders where EXISTS another
# line of the same order from a DIFFERENT warehouse and NOT EXISTS a
# return — then COUNT(DISTINCT order) + cost sums. Mapped: orders in a
# ship window with lines from >= 2 distinct suppliers and no R-flagged
# line. The oracle keeps the literal EXISTS/NOT EXISTS form; the Spark
# plan uses the scale-stable reformulation — the EXISTS-with-inequality
# self-join (ws_wh in the template) is a per-order DISTINCT supplier
# count, avoiding the quadratic per-order line pairing, and the NOT
# EXISTS is an order-level anti-join. Semantically identical; the
# hash-match against the EXISTS oracle proves it.

_DS18_ORACLE = """
SELECT CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS order_count,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                           * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0
         AS ship_rev
FROM lineitem l
WHERE l.l_shipdate >= DATE '1996-01-01'
  AND l.l_shipdate < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l.l_orderkey
                AND l2.l_suppkey <> l.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l.l_orderkey
                    AND l3.l_returnflag = 'R')
"""


@query(
    "ds18_ship_together", _DS18_ORACLE,
    doc="TPC-DS Q95 shape: multi-supplier EXISTS + returns NOT EXISTS, "
        "count-distinct orders",
)
def ds18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
        .select("l_orderkey")
    )
    returned = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    ).distinct()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-07-01"))
        )
        .join(multi_supp, "l_orderkey", "left_semi")
        .join(returned, "l_orderkey", "left_anti")
        .agg(
            F.countDistinct("l_orderkey").alias("order_count"),
            (
                F.sum(
                    _q(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                ).cast("double")
                / _Q
            ).alias("ship_rev"),
        )
    )


# --- ds19: TPC-DS Q31 — cross-entity quarter-over-quarter growth ------------
# Q31 (`benchmark/tpcds/query31.tpl`): store and web revenue aggregated
# per (county, quarter), the per-quarter aggregates self-joined into a
# sequence, and counties kept where the web growth ratio beats the store
# growth ratio. Mapped: customer-side order revenue vs supplier-side
# shipment revenue per (nation, 1995 Q1->Q2); four quarter aggregates meet
# on the nation key — co-partitioned joins of tiny aggregate outputs.

_DS19_ORACLE = """
WITH cust_q AS (
  SELECT c.c_nationkey AS nkey, EXTRACT(QUARTER FROM o.o_orderdate) AS q,
         SUM(CAST(FLOOR(o.o_totalprice * 10000.0) AS BIGINT)) AS qrev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995
    AND EXTRACT(QUARTER FROM o.o_orderdate) IN (1, 2)
  GROUP BY 1, 2),
supp_q AS (
  SELECT s.s_nationkey AS nkey, EXTRACT(QUARTER FROM l.l_shipdate) AS q,
         SUM(CAST(FLOOR(l.l_extendedprice * 10000.0) AS BIGINT)) AS qrev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE EXTRACT(YEAR FROM l.l_shipdate) = 1995
    AND EXTRACT(QUARTER FROM l.l_shipdate) IN (1, 2)
  GROUP BY 1, 2)
SELECT n.n_name AS nation,
       CAST(c2.qrev AS DOUBLE) / CAST(c1.qrev AS DOUBLE) AS cust_growth,
       CAST(s2.qrev AS DOUBLE) / CAST(s1.qrev AS DOUBLE) AS supp_growth
FROM cust_q c1 JOIN cust_q c2 ON c1.nkey = c2.nkey
JOIN supp_q s1 ON c1.nkey = s1.nkey
JOIN supp_q s2 ON c1.nkey = s2.nkey
JOIN nation n ON c1.nkey = n.n_nationkey
WHERE c1.q = 1 AND c2.q = 2 AND s1.q = 1 AND s2.q = 2
  AND c1.qrev > 0 AND s1.qrev > 0
  AND CAST(s2.qrev AS DOUBLE) / CAST(s1.qrev AS DOUBLE)
      > CAST(c2.qrev AS DOUBLE) / CAST(c1.qrev AS DOUBLE)
ORDER BY nation
"""


@query(
    "ds19_qoq_growth", _DS19_ORACLE,
    doc="TPC-DS Q31 shape: quarter aggregates self-joined into a growth "
        "sequence, cross-entity ratio comparison",
)
def ds19(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    cust_q = (
        orders.filter(
            (F.year("o_orderdate") == 1995)
            & F.quarter("o_orderdate").isin(1, 2)
        )
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nkey"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(F.sum(_q(F.col("o_totalprice"))).alias("qrev"))
    )
    supp_q = (
        li.filter(
            (F.year("l_shipdate") == 1995)
            & F.quarter("l_shipdate").isin(1, 2)
        )
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("nkey"),
            F.quarter("l_shipdate").alias("q"),
        )
        .agg(F.sum(_q(F.col("l_extendedprice"))).alias("qrev"))
    )
    c1 = cust_q.filter("q = 1").select("nkey", F.col("qrev").alias("c1"))
    c2 = cust_q.filter("q = 2").select("nkey", F.col("qrev").alias("c2"))
    s1 = supp_q.filter("q = 1").select("nkey", F.col("qrev").alias("s1"))
    s2 = supp_q.filter("q = 2").select("nkey", F.col("qrev").alias("s2"))
    joined = (
        c1.join(c2, "nkey").join(s1, "nkey").join(s2, "nkey")
        .filter((F.col("c1") > 0) & (F.col("s1") > 0))
        .withColumn(
            "cust_growth", F.col("c2").cast("double") / F.col("c1").cast("double")
        )
        .withColumn(
            "supp_growth", F.col("s2").cast("double") / F.col("s1").cast("double")
        )
        .filter(F.col("supp_growth") > F.col("cust_growth"))
    )
    return (
        joined.join(
            F.broadcast(nation), joined["nkey"] == nation["n_nationkey"]
        )
        .select(
            F.col("n_name").alias("nation"), "cust_growth", "supp_growth"
        )
        .orderBy("nation")
    )


# --- ds20: TPC-DS Q49 — per-channel return-rate double ranking --------------
# Q49 (`benchmark/tpcds/query49.tpl`): per channel, items ranked BOTH by
# currency return ratio and by quantity return ratio, keeping items in
# either top-10, UNION ALL across channels. Mapped: channel = supplier-key
# mod 3, item band = part-key mod 50; returned = R-flagged lines. Each
# channel's rollup is one groupBy; the two ranks share one window
# partition; the union is a plan-level concat of identical shapes.

_DS20_ORACLE = """
WITH rated AS (
  SELECT l_suppkey % 3 AS channel, l_partkey % 50 AS band,
         SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS ret_qty,
         SUM(CAST(l_quantity AS BIGINT)) AS tot_qty,
         SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)
                  ELSE 0 END) AS ret_amt,
         SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS tot_amt
  FROM lineitem GROUP BY 1, 2),
ranked AS (
  SELECT channel, band,
         CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) AS qty_ratio,
         CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE) AS amt_ratio,
         RANK() OVER (PARTITION BY channel
                      ORDER BY CAST(ret_qty AS DOUBLE)
                               / CAST(tot_qty AS DOUBLE) DESC, band)
           AS qty_rank,
         RANK() OVER (PARTITION BY channel
                      ORDER BY CAST(ret_amt AS DOUBLE)
                               / CAST(tot_amt AS DOUBLE) DESC, band)
           AS amt_rank
  FROM rated WHERE tot_qty > 0 AND tot_amt > 0)
SELECT channel, band, qty_ratio, amt_ratio, qty_rank, amt_rank
FROM ranked
WHERE qty_rank <= 10 OR amt_rank <= 10
ORDER BY channel, band
"""


@query(
    "ds20_return_rate_ranks", _DS20_ORACLE,
    doc="TPC-DS Q49 shape: double ranking by return ratios per channel, "
        "either-top-10 filter",
)
def ds20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ret = F.col("l_returnflag") == "R"
    rated = (
        li.groupBy(
            (F.col("l_suppkey") % 3).alias("channel"),
            (F.col("l_partkey") % 50).alias("band"),
        )
        .agg(
            F.sum(
                F.when(ret, F.col("l_quantity").cast("long")).otherwise(0)
            ).alias("ret_qty"),
            F.sum(F.col("l_quantity").cast("long")).alias("tot_qty"),
            F.sum(
                F.when(ret, _q(F.col("l_extendedprice"))).otherwise(0)
            ).alias("ret_amt"),
            F.sum(_q(F.col("l_extendedprice"))).alias("tot_amt"),
        )
        .filter((F.col("tot_qty") > 0) & (F.col("tot_amt") > 0))
        .withColumn(
            "qty_ratio",
            F.col("ret_qty").cast("double") / F.col("tot_qty").cast("double"),
        )
        .withColumn(
            "amt_ratio",
            F.col("ret_amt").cast("double") / F.col("tot_amt").cast("double"),
        )
    )
    w_qty = Window.partitionBy("channel").orderBy(
        F.col("qty_ratio").desc(), "band"
    )
    w_amt = Window.partitionBy("channel").orderBy(
        F.col("amt_ratio").desc(), "band"
    )
    return (
        rated.withColumn("qty_rank", F.rank().over(w_qty))
        .withColumn("amt_rank", F.rank().over(w_amt))
        .filter((F.col("qty_rank") <= 10) | (F.col("amt_rank") <= 10))
        .select(
            "channel", "band", "qty_ratio", "amt_ratio",
            "qty_rank", "amt_rank",
        )
        .orderBy("channel", "band")
    )


# --- ds21: TPC-DS Q70 — rollup restricted by a rank-in-subquery set ---------
# Q70 (`benchmark/tpcds/query70.tpl`): state-level profit ROLLUP, but only
# over states whose rank inside an INDEPENDENT subquery (top-5 per
# category by their own aggregate) qualifies — a window computed in a
# subquery feeding a semi-join, then GROUPING()-keyed ranking of the
# rollup. Mapped: (region, nation) supplier revenue rollup over nations
# ranked top-2 within their region.

_DS21_ORACLE = """
WITH nat_rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(FLOOR(l.l_extendedprice * 10000.0) AS BIGINT)) AS qrev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2),
top_nations AS (
  SELECT nation FROM (
    SELECT nation, RANK() OVER (PARTITION BY region
                                ORDER BY qrev DESC, nation) AS rk
    FROM nat_rev) x WHERE rk <= 2)
SELECT region, nation,
       CAST(SUM(qrev) AS DOUBLE) / 10000.0 AS revenue,
       CAST(GROUPING(region) * 2 + GROUPING(nation) AS INTEGER)
         AS lochierarchy
FROM nat_rev
WHERE nation IN (SELECT nation FROM top_nations)
GROUP BY ROLLUP(region, nation)
ORDER BY lochierarchy DESC, region NULLS FIRST, nation NULLS FIRST
"""


@query(
    "ds21_rollup_rank_filter", _DS21_ORACLE,
    doc="TPC-DS Q70 shape: rollup over a rank-in-subquery semi-joined set",
)
def ds21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat_rev = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(_q(F.col("l_extendedprice"))).alias("qrev"))
    )
    rk = F.rank().over(
        Window.partitionBy("region").orderBy(F.col("qrev").desc(), "nation")
    )
    top_nations = (
        nat_rev.withColumn("rk", rk).filter(F.col("rk") <= 2).select("nation")
    )
    return (
        nat_rev.join(top_nations, "nation", "left_semi")
        .rollup("region", "nation")
        .agg(
            (F.sum("qrev").cast("double") / _Q).alias("revenue"),
            # grouping() must be computed INSIDE the rollup aggregate
            (F.grouping("region") * 2 + F.grouping("nation"))
            .cast("int")
            .alias("lochierarchy"),
        )
        .select("region", "nation", "revenue", "lochierarchy")
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("region").asc_nulls_first(),
            F.col("nation").asc_nulls_first(),
        )
    )


# --- ds22: TPC-DS Q54 — cohort selection then spend histogram ---------------
# Q54 (`benchmark/tpcds/query54.tpl`): build a customer cohort from one
# channel/month, total their spend in the following quarter, bucket the
# totals into fixed bands, and count customers per band — a CTE chain
# ending in a histogram over an aggregate. Mapped: cohort = customers
# with an URGENT order in 1995-03; spend = their Q2-1995 order totals;
# bands of $50,000.

_DS22_ORACLE = """
WITH cohort AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND EXTRACT(YEAR FROM o_orderdate) = 1995
    AND EXTRACT(MONTH FROM o_orderdate) = 3),
spend AS (
  SELECT o.o_custkey,
         SUM(CAST(FLOOR(o.o_totalprice * 10000.0) AS BIGINT)) AS qspend
  FROM orders o
  WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995
    AND EXTRACT(MONTH FROM o.o_orderdate) IN (4, 5, 6)
    AND o.o_custkey IN (SELECT o_custkey FROM cohort)
  GROUP BY 1)
SELECT CAST(FLOOR(CAST(qspend AS DOUBLE) / 10000.0 / 50000.0) AS BIGINT)
         AS band,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM spend
GROUP BY 1
ORDER BY band
"""


@query(
    "ds22_cohort_histogram", _DS22_ORACLE,
    doc="TPC-DS Q54 shape: cohort semi-join then fixed-band spend histogram",
)
def ds22(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cohort = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1995)
            & (F.month("o_orderdate") == 3)
        )
        .select("o_custkey")
        .distinct()
    )
    spend = (
        orders.filter(
            (F.year("o_orderdate") == 1995)
            & F.month("o_orderdate").isin(4, 5, 6)
        )
        .join(cohort, "o_custkey", "left_semi")
        .groupBy("o_custkey")
        .agg(F.sum(_q(F.col("o_totalprice"))).alias("qspend"))
    )
    return (
        spend.select(
            F.floor(
                F.col("qspend").cast("double") / _Q / F.lit(50000.0)
            ).alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("band")
    )


# --- c14: ClickBench prefix grouping with two distinct counts ---------------
# ClickBench's URL-prefix forms (`benchmark/clickbench/queries.sql` Q21-23:
# SUBSTRING group key + COUNT(*) + uniq(UserID)): group by a computed
# string prefix, count rows AND distinct entities, top-N by count. Mapped
# over documents: 12-char text prefix, distinct sources per prefix.

_C14_ORACLE = """
SELECT SUBSTRING(text, 1, 12) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
WHERE length(text) > 0
GROUP BY 1
ORDER BY n DESC, prefix
LIMIT 25
"""


@query(
    "c14_prefix_profile", _C14_ORACLE,
    doc="ClickBench substring-prefix grouping with count + distinct-count",
)
def c14(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.length("text") > 0)
        .groupBy(F.substring("text", 1, 12).alias("prefix"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("source").alias("n_sources"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy(F.col("n").desc(), "prefix")
        .limit(25)
    )


# --- c15: ClickBench conditional-ratio per key (bounce-rate form) -----------
# ClickBench's bounce-rate style: per key, the ratio of rows meeting a
# predicate to all rows — one groupBy with conditional sums, no join.

_C15_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN value < 0.1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS low_ratio
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "c15_conditional_ratio", _C15_ORACLE,
    doc="ClickBench bounce-rate form: per-key conditional ratio in one pass",
)
def c15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.when(F.col("value") < 0.1, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("low_ratio"),
        )
        .orderBy("event_type")
    )


# --- l08: LDBC BI-19/20 — bounded BFS reachability over a derived graph -----
# The LDBC BI closers are variable-length path queries (cheapest/shortest
# path between person sets). The distributed form is level-synchronous
# BFS: frontier -> join edges -> dedup -> subtract visited, one round per
# hop — each round is an equi-join + distinct, no driver-side adjacency.
# Edge set: u -> next distinct user within the same activity hour (lead
# over (hour) windows with a unique tiebreak) — sparse (<= one edge per
# event), deterministic. Seeds: every 100th user. The oracle states the
# SAME reachability as a recursive UNION CTE + MIN(hop); hash equality
# proves the visited-pruned BFS computes identical minimum hop counts.

_L08_ORACLE = """
WITH ordered AS (
  SELECT date_trunc('hour', ts) AS hr, user_id, ts, event_id,
         lead(user_id) OVER (PARTITION BY date_trunc('hour', ts)
                             ORDER BY ts, event_id) AS next_user
  FROM events),
edges AS (
  SELECT DISTINCT user_id AS src, next_user AS dst
  FROM ordered
  WHERE next_user IS NOT NULL AND next_user <> user_id),
seeds AS (
  SELECT DISTINCT user_id AS uid FROM events WHERE user_id % 100 = 0),
reach AS (
  WITH RECURSIVE r(uid, hop) AS (
    SELECT uid, 0 FROM seeds
    UNION
    SELECT e.dst, r.hop + 1
    FROM r JOIN edges e ON e.src = r.uid
    WHERE r.hop < 3)
  SELECT uid, MIN(hop) AS hop FROM r GROUP BY uid)
SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_users
FROM reach GROUP BY hop ORDER BY hop
"""


@query(
    "l08_bfs_reachability", _L08_ORACLE,
    doc="LDBC BI-19/20 shape: 3-hop level-synchronous BFS over a derived "
        "edge graph, min-hop census",
)
def l08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    w = Window.partitionBy(hr).orderBy("ts", "event_id")
    edges = (
        ev.withColumn("next_user", F.lead("user_id").over(w))
        .filter(
            F.col("next_user").isNotNull()
            & (F.col("next_user") != F.col("user_id"))
        )
        .select(
            F.col("user_id").alias("src"), F.col("next_user").alias("dst")
        )
        .distinct()
        # feeds all 3 BFS rounds: without pinning, each round's join
        # re-runs the whole window+distinct edge build (3x the work)
        .localCheckpoint(eager=False)
    )
    seeds = (
        ev.filter(F.col("user_id") % 100 == 0)
        .select(F.col("user_id").alias("uid"))
        .distinct()
    )
    # level-synchronous BFS: 3 fixed rounds (not data-dependent), each an
    # equi-join + distinct + anti-join — the standard distributed BFS.
    # visited/frontier frames are pinned per level so each round's lineage
    # doesn't recompute every prior level. localCheckpoint (not .cache())
    # keeps the blocks invocation-local: cached plans would be matched by
    # the CacheManager across invocations (cross-run state) and leak
    # storage memory into later gates.
    visited = seeds.withColumn("hop", F.lit(0)).localCheckpoint(eager=False)
    frontier = visited
    for hop in (1, 2, 3):
        nxt = (
            frontier.join(edges, frontier["uid"] == edges["src"])
            .select(F.col("dst").alias("uid"))
            .distinct()
            .join(visited.select("uid"), "uid", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return (
        visited.groupBy("hop")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("hop")
    )


# --- b09: JOB — 9-way double-role snowflake ---------------------------------
# The JOB 20a/28a topology: the SAME dimension chain appears in TWO roles
# (nation+region once via the customer, once via the supplier — as JOB binds
# comp_cast_type twice as cct1/cct2), with selective filters on both roles,
# an IN-list dim filter, and MIN(string) aggregates. Join ORDER is the whole
# game: starting from the facts is catastrophic; the right plan reduces each
# role chain to a broadcast-sized key set first. The oracle carries JOB's
# redundant comma-FROM transitive predicates for the optimizer to collapse.

_B09_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       MIN(p.p_name) AS first_part,
       MIN(c.c_name) AS first_cust,
       MIN(s.s_name) AS first_supp
FROM lineitem l, orders o, customer c, nation n1, region r1,
     supplier s, nation n2, region r2, part p
WHERE l.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r1.r_regionkey
  AND l.l_suppkey = s.s_suppkey
  AND s.s_nationkey = n2.n_nationkey
  AND n2.n_regionkey = r2.r_regionkey
  AND l.l_partkey = p.p_partkey
  AND r1.r_name = 'EUROPE'
  AND r2.r_name = 'ASIA'
  AND p.p_brand IN ('Brand#1', 'Brand#7', 'Brand#13', 'Brand#19')
  AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
"""


@query(
    "b09_job_double_role_snowflake", _B09_ORACLE,
    doc="JOB 20a shape: 9-way join, nation+region chain in two roles "
        "(customer-side EUROPE, supplier-side ASIA) + IN-list dims",
)
def b09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    def nations_in(r_name: str) -> DataFrame:
        # role-reduced chain: region filter -> nation keys (5-ish rows)
        return (
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == r_name)),
                nation["n_regionkey"] == region["r_regionkey"],
            ).select("n_nationkey")
        )

    cust_eu = cust.join(
        F.broadcast(nations_in("EUROPE")),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey", "c_name")
    supp_as = supp.join(
        F.broadcast(nations_in("ASIA")),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    p = part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13", "Brand#19")
    ).select("p_partkey", "p_name")
    o = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_custkey")
    return (
        li.select("l_orderkey", "l_suppkey", "l_partkey")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(cust_eu, o["o_custkey"] == cust_eu["c_custkey"])
        .join(F.broadcast(supp_as), li["l_suppkey"] == supp_as["s_suppkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_name").alias("first_part"),
            F.min("c_name").alias("first_cust"),
            F.min("s_name").alias("first_supp"),
        )
    )


# --- b10: JOB — hub intersection (one dim reached from two fact paths) ------
# JOB's complete_cast hub: a movie qualifies only if BOTH auxiliary paths
# hit it. Mapped: a part qualifies only if shipped by an ASIA supplier AND
# by a EUROPE supplier. Two EXISTS = two LEFT-SEMI joins onto the hub —
# never a fact-fact join materialising the cross-path pairs.

_B10_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts, MIN(p.p_name) AS first_part
FROM part p
WHERE EXISTS (
    SELECT 1 FROM lineitem l, supplier s, nation n, region r
    WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA')
  AND EXISTS (
    SELECT 1 FROM lineitem l, supplier s, nation n, region r
    WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE')
"""


@query(
    "b10_job_hub_intersection", _B10_ORACLE,
    doc="JOB hub shape: part must be reached by BOTH region-filtered "
        "supplier paths — two semi-joins, no cross-path pair join",
)
def b10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    def parts_shipped_from(r_name: str) -> DataFrame:
        nk = nation.join(
            F.broadcast(region.filter(F.col("r_name") == r_name)),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select("n_nationkey")
        sk = supp.join(
            F.broadcast(nk), supp["s_nationkey"] == F.col("n_nationkey")
        ).select("s_suppkey")
        return (
            li.join(F.broadcast(sk), li["l_suppkey"] == F.col("s_suppkey"))
            .select("l_partkey")
        )

    out = part.join(
        parts_shipped_from("ASIA"),
        part["p_partkey"] == F.col("l_partkey"),
        "left_semi",
    ).join(
        parts_shipped_from("EUROPE"),
        part["p_partkey"] == F.col("l_partkey"),
        "left_semi",
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_name").alias("first_part"),
    )


# --- b11: JOB — pure path join across the whole schema ----------------------
# An 8-table PATH (not star): region -> nation -> supplier -> lineitem ->
# orders -> customer -> nation -> region, selective filters at BOTH ends
# (AFRICA suppliers, AMERICA customers). A left-deep order from either end
# is fine; starting in the middle (fact-fact first) is the classic join-
# order disaster JOB punishes. Unlike q05's same-nation cycle, the two
# endpoint chains bind different regions, so no cycle shortcut exists.

_B11_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 10000.0) AS BIGINT))
            AS BIGINT) AS rev_q
FROM region r1, nation n1, supplier s, lineitem l, orders o,
     customer c, nation n2, region r2
WHERE r1.r_name = 'AFRICA'
  AND r1.r_regionkey = n1.n_regionkey
  AND n1.n_nationkey = s.s_nationkey
  AND s.s_suppkey = l.l_suppkey
  AND l.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n2.n_nationkey
  AND n2.n_regionkey = r2.r_regionkey
  AND r2.r_name = 'AMERICA'
  AND o.o_orderdate >= DATE '1995-01-01'
"""


@query(
    "b11_job_path_join", _B11_ORACLE,
    doc="JOB path shape: 8-table chain with selective filters at both "
        "ends (AFRICA suppliers -> AMERICA customers)",
)
def b11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    def keys_in(r_name: str) -> DataFrame:
        return nation.join(
            F.broadcast(region.filter(F.col("r_name") == r_name)),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select("n_nationkey")

    s_af = supp.join(
        F.broadcast(keys_in("AFRICA")),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey")
    c_am = cust.join(
        F.broadcast(keys_in("AMERICA")),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01")).select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(s_af), li["l_suppkey"] == s_af["s_suppkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c_am, o["o_custkey"] == c_am["c_custkey"], "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_q(F.col("l_extendedprice"))).alias("rev_q"),
        )
    )


# --- b12: JOB — mixed-selectivity filter soup over a 7-way join -------------
# The JOB 28a WHERE-clause mix on one query: IN-list, NOT LIKE, an
# OR across two different columns (pattern OR numeric), a != on a dim,
# and a numeric range — with MIN(string) aggregates. The optimizer must
# rank filters by selectivity, not clause order, when picking the join
# order; every predicate must reach its scan.

_B12_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       MIN(p.p_name) AS first_part,
       MIN(s.s_name) AS first_supp,
       MIN(c.c_name) AS first_cust
FROM lineitem l, part p, supplier s, nation n, region r, orders o, customer c
WHERE l.l_partkey = p.p_partkey
  AND l.l_suppkey = s.s_suppkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND l.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey
  AND p.p_type IN ('ECONOMY', 'PROMO')
  AND p.p_name NOT LIKE '%green%'
  AND (s.s_name LIKE '%7%' OR s.s_acctbal > 9000)
  AND r.r_name <> 'AFRICA'
  AND o.o_totalprice > 1000
"""


@query(
    "b12_job_filter_soup", _B12_ORACLE,
    doc="JOB 28a filter mix: IN + NOT LIKE + cross-column OR + dim != + "
        "numeric range over a 7-way join",
)
def b12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    p = part.filter(
        F.col("p_type").isin("ECONOMY", "PROMO")
        & ~F.col("p_name").like("%green%")
    ).select("p_partkey", "p_name")
    nk = nation.join(
        F.broadcast(region.filter(F.col("r_name") != "AFRICA")),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey")
    s = (
        supp.filter(F.col("s_name").like("%7%") | (F.col("s_acctbal") > 9000))
        .join(F.broadcast(nk), supp["s_nationkey"] == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    o = orders.filter(F.col("o_totalprice") > 1000).select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(cust.select("c_custkey", "c_name"),
              o["o_custkey"] == F.col("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_name").alias("first_part"),
            F.min("s_name").alias("first_supp"),
            F.min("c_name").alias("first_cust"),
        )
    )


# --- ds23: TPC-DS Q58/Q83 — three aligned channels within a balance band ----
# Q58/Q83 (`benchmark/tpcds/query58.tpl`): three per-channel aggregates
# joined on the item key, keeping keys where EACH channel's revenue falls
# within a band around the three-channel average. The reference runs three
# CTE scans + a 3-way join; on Spark the channels partition one fact, so
# the whole topology fuses into ONE conditional-aggregation scan (presence
# per channel via conditional counts replaces the inner join's key
# alignment). The balance band uses integer cross-multiplication on
# quantised sums — no float comparison can flip across engines.

_DS23_ORACLE = """
WITH agg AS (
  SELECT EXTRACT(hour FROM ts) AS hr,
         SUM(CASE WHEN event_type = 'view'
                  THEN CAST(FLOOR(value * 10000.0) AS BIGINT) ELSE 0 END) AS s_v,
         SUM(CASE WHEN event_type = 'click'
                  THEN CAST(FLOOR(value * 10000.0) AS BIGINT) ELSE 0 END) AS s_c,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 10000.0) AS BIGINT) ELSE 0 END) AS s_p,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_v,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_c,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_p
  FROM events GROUP BY 1)
SELECT CAST(hr AS INT) AS hr,
       CAST(s_v AS DOUBLE) / 10000.0 AS view_rev,
       CAST(s_c AS DOUBLE) / 10000.0 AS click_rev,
       CAST(s_p AS DOUBLE) / 10000.0 AS purchase_rev
FROM agg
WHERE n_v > 0 AND n_c > 0 AND n_p > 0
  AND 15 * s_v >= 4 * (s_v + s_c + s_p) AND 5 * s_v <= 2 * (s_v + s_c + s_p)
  AND 15 * s_c >= 4 * (s_v + s_c + s_p) AND 5 * s_c <= 2 * (s_v + s_c + s_p)
  AND 15 * s_p >= 4 * (s_v + s_c + s_p) AND 5 * s_p <= 2 * (s_v + s_c + s_p)
ORDER BY hr
"""


@query(
    "ds23_channel_balance", _DS23_ORACLE,
    doc="TPC-DS Q58/Q83 shape: three aligned channel aggregates in a "
        "+/-20%-of-average balance band, fused to one conditional-agg scan",
)
def ds23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def chan_sum(kind: str) -> F.Column:
        return F.sum(
            F.when(F.col("event_type") == kind, _q(F.col("value"))).otherwise(
                F.lit(0)
            )
        )

    def chan_n(kind: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == kind, 1).otherwise(0))

    agg = ev.groupBy(F.hour("ts").alias("hr")).agg(
        chan_sum("view").alias("s_v"),
        chan_sum("click").alias("s_c"),
        chan_sum("purchase").alias("s_p"),
        chan_n("view").alias("n_v"),
        chan_n("click").alias("n_c"),
        chan_n("purchase").alias("n_p"),
    )
    total = F.col("s_v") + F.col("s_c") + F.col("s_p")

    def in_band(s: str):
        return (15 * F.col(s) >= 4 * total) & (5 * F.col(s) <= 2 * total)

    return (
        agg.filter(
            (F.col("n_v") > 0) & (F.col("n_c") > 0) & (F.col("n_p") > 0)
            & in_band("s_v") & in_band("s_c") & in_band("s_p")
        )
        .select(
            F.col("hr").cast("int").alias("hr"),
            (F.col("s_v").cast("double") / _Q).alias("view_rev"),
            (F.col("s_c").cast("double") / _Q).alias("click_rev"),
            (F.col("s_p").cast("double") / _Q).alias("purchase_rev"),
        )
        .orderBy("hr")
    )


# --- ds24: decile segmentation — ntile + percent_rank window battery --------
# Customer-value decile report (the TPC-DS Q70-family "segment the whole
# population" topology, exercised through the two window functions the
# inventory had not yet gated): order totals -> NTILE(10) deciles plus
# PERCENT_RANK, then per-decile stats. Both windows are rank-arithmetic
# ((rank-1)/(n-1)) over a deterministic (total, key) ordering, so results
# are exact across engines; percent_rank bounds are quantised to 1e6.
# Scale shape: a naive `Window.orderBy(...)` with no partition key drags
# the WHOLE table into one task — the classic global-window scale-killer.
# This implementation computes the exact global rank distributively:
# range-repartition on the sort key, partition-LOCAL row_number (parallel
# windows), then one O(#partitions) offsets broadcast — p04's two-level
# prefix-sum trick applied to total-order ranking. NTILE's
# remainder-spreading semantics and PERCENT_RANK are then pure arithmetic
# on the exact global rank (the tie-break key is unique, so rank ==
# row_number). Per-decile stats shuffle 10 groups; nothing single-task.

_DS24_ORACLE = """
WITH ot AS (
  SELECT l_orderkey, SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS tot
  FROM lineitem GROUP BY l_orderkey),
ranked AS (
  SELECT l_orderkey, tot,
         NTILE(10) OVER (ORDER BY tot DESC, l_orderkey) AS decile,
         PERCENT_RANK() OVER (ORDER BY tot DESC, l_orderkey) AS pr
  FROM ot)
SELECT CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(tot) AS DOUBLE) / 10000.0 AS min_total,
       CAST(MAX(tot) AS DOUBLE) / 10000.0 AS max_total,
       CAST(SUM(tot) AS DOUBLE) / 10000.0 AS sum_total,
       CAST(FLOOR(MIN(pr) * 1000000.0) AS BIGINT) AS pr_lo_q,
       CAST(FLOOR(MAX(pr) * 1000000.0) AS BIGINT) AS pr_hi_q
FROM ranked GROUP BY decile ORDER BY decile
"""


@query(
    "ds24_decile_profile", _DS24_ORACLE,
    doc="population decile segmentation: NTILE(10) + PERCENT_RANK over "
        "order totals, per-decile stats",
)
def ds24(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ot = li.groupBy("l_orderkey").agg(
        F.sum(_q(F.col("l_extendedprice"))).alias("tot")
    )
    # distributed exact global rank: DETERMINISTIC fixed-width range
    # buckets on the sort value (repartitionByRange's sampled boundaries
    # can differ between the offsets job and the final job, silently
    # shifting ranks), partition-local row_number per bucket, then an
    # O(#buckets) offsets broadcast
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    lo, hi = ot.agg(F.min("tot"), F.max("tot")).collect()[0]
    if hi is None:  # empty corpus: emit the (empty) report shape directly
        lo = hi = 0
    width = max(1, (int(hi) - int(lo)) // n_parts + 1)
    bucket = F.floor((F.lit(int(hi)) - F.col("tot")) / F.lit(width))
    loc = ot.withColumn("bkt", bucket).withColumn(
        "lrn",
        F.row_number().over(
            Window.partitionBy("bkt").orderBy(
                F.col("tot").desc(), F.col("l_orderkey")
            )
        ),
    )
    sizes = sorted(
        (r["bkt"], r["c"])
        for r in loc.groupBy("bkt").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n = sum(c for _, c in sizes)
    offsets, acc = [], 0
    for bkt, c in sizes:
        offsets.append((int(bkt), acc))
        acc += c
    # explicit schema: an empty corpus yields offsets == [] and schema
    # inference over an empty list raises instead of emitting the empty report
    off_df = spark.createDataFrame(offsets, "bkt bigint, off bigint")
    ranked = loc.join(F.broadcast(off_df), "bkt").withColumn(
        "r", F.col("off") + F.col("lrn")
    )
    # NTILE(10) from the exact rank, remainder spread over the first groups
    big, small = n % 10, n // 10
    r0 = F.col("r") - 1
    if small == 0:
        decile = F.col("r")
    else:
        decile = F.when(
            r0 < big * (small + 1), F.floor(r0 / (small + 1)) + 1
        ).otherwise(big + F.floor((r0 - big * (small + 1)) / small) + 1)
    # PERCENT_RANK over a single row is 0 by definition (both engines);
    # the r0/(n-1) formula would produce 0/0 = NaN
    pr = (
        F.lit(0.0) if n <= 1 else r0.cast("double") / F.lit(float(n - 1))
    )
    ranked = ranked.withColumn("decile", decile).withColumn("pr", pr)
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min("tot").cast("double") / _Q).alias("min_total"),
            (F.max("tot").cast("double") / _Q).alias("max_total"),
            (F.sum("tot").cast("double") / _Q).alias("sum_total"),
            F.floor(F.min("pr") * 1000000.0).cast("long").alias("pr_lo_q"),
            F.floor(F.max("pr") * 1000000.0).cast("long").alias("pr_hi_q"),
        )
        .select(F.col("decile").cast("int").alias("decile"), "n_orders",
                "min_total", "max_total", "sum_total", "pr_lo_q", "pr_hi_q")
        .orderBy("decile")
    )


# --- l09: LDBC friend-of-friend recommendation ------------------------------
# LDBC IC/BI "people you may know": 2-hop neighbours that are NOT already
# direct neighbours, scored by the number of distinct mutual contacts.
# Graph = co-supplier edges sparsified by a RELATIVE weight rule: an edge
# survives iff its shared-order count is >= 90% of its endpoint's max
# (integer arithmetic, w*10 >= mx*10*0.9 — no float threshold). The
# round-9 ">= 2 shared orders" graph was COMPLETE at sf<=0.01 (every
# supplier pair co-occurs), so "2-hop minus direct" was structurally
# EMPTY — the same densification trap as l19, and the same class of fix:
# a scale-stable per-node sparsifier replayed bit-for-bit in the oracle
# (a relative-weight filter here vs l11's fixed top-M, two distinct
# production sparsifiers). The 2-hop expansion is two hash equi-joins on
# vertex ids, the exclusion an anti-join — level-synchronous relational
# graph traversal, the shape that scales (no adjacency lists on the
# driver). Non-vacuous at all 3 SFs (cands: 14 / 771 / 1823).

_L09_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2, COUNT(DISTINCT l_orderkey) AS w FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
und AS (
  SELECT s1 AS a, s2 AS b, w FROM edges
  UNION ALL SELECT s2, s1, w FROM edges),
kept AS (
  SELECT a, b FROM (
    SELECT a, b, w, MAX(w) OVER (PARTITION BY a) AS mx FROM und)
  WHERE w * 10 >= mx * 9),
two_hop AS (
  SELECT x.a, y.b AS c, x.b AS mid
  FROM kept x JOIN kept y ON x.b = y.a AND x.a <> y.b),
cand AS (
  SELECT a, c, COUNT(DISTINCT mid) AS mutuals
  FROM two_hop t
  WHERE a < c AND NOT EXISTS (
    SELECT 1 FROM kept d WHERE d.a = t.a AND d.b = t.c)
  GROUP BY a, c)
SELECT a, c, CAST(mutuals AS BIGINT) AS mutuals
FROM cand
ORDER BY mutuals DESC, a, c
LIMIT 20
"""


@query(
    "l09_foaf_recommend", _L09_ORACLE,
    doc="LDBC people-you-may-know: 2-hop neighbours minus direct edges on "
        "a relative-weight-sparsified graph (edge kept iff w >= 90% of "
        "node max), scored by distinct mutual contacts",
)
def l09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("sb")
    )
    pairs = li.join(
        right,
        (F.col("l_orderkey") == F.col("r_okey"))
        & (F.col("l_suppkey") < F.col("sb")),
    ).select(F.col("l_suppkey").alias("s1"), F.col("sb").alias("s2"), "l_orderkey")
    edges = (
        pairs.groupBy("s1", "s2")
        # pair rows are unique per (s1, s2, okey) — li is distinct on
        # (l_orderkey, l_suppkey) — so COUNT == COUNT(DISTINCT okey) and
        # the distinct aggregate's extra pair-grain shuffle is dropped
        # (round-13 batch B, guide §2.3)
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        # the edge set feeds multiple downstream joins; the round-13 sweep
        # read zero ReusedExchange in these plans, so each consumer re-ran
        # the per-order pair join + distinct count without the checkpoint
        .localCheckpoint(eager=False)
    )
    und = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("b"), "w"
    ).unionAll(edges.select(F.col("s2").alias("a"), F.col("s1").alias("b"), "w"))
    mx = F.max("w").over(Window.partitionBy("a"))
    kept = (
        und.withColumn("mx", mx)
        .filter(F.col("w") * 10 >= F.col("mx") * 9)
        .select("a", "b")
        .localCheckpoint(eager=False)  # both arms of the 2-hop self-join
    )
    hop2 = (
        kept.alias("x")
        .join(kept.alias("y"), F.col("x.b") == F.col("y.a"))
        .filter(F.col("x.a") != F.col("y.b"))
        .select(
            F.col("x.a").alias("a"), F.col("y.b").alias("c"),
            F.col("x.b").alias("mid"),
        )
        .filter(F.col("a") < F.col("c"))
    )
    non_direct = hop2.join(
        kept.select(F.col("a").alias("da"), F.col("b").alias("db")),
        (F.col("a") == F.col("da")) & (F.col("c") == F.col("db")),
        "left_anti",
    )
    return (
        non_direct.groupBy("a", "c")
        # hop2 rows are unique per (a, c, mid): both join arms are sets
        # of unique (src, dst) edges, so each mid links (a, c) at most
        # once -> COUNT == COUNT(DISTINCT mid) (round-13 batch B)
        .agg(F.count(F.lit(1)).alias("mutuals"))
        .orderBy(F.col("mutuals").desc(), "a", "c")
        .limit(20)
    )


# --- ds25: TPC-DS Q35/Q69 — boolean algebra over EXISTS channels ------------
# Q69 (`benchmark/tpcds/query69.tpl`): customers who shop one channel but
# NOT others — EXISTS(store) AND NOT (EXISTS(web) OR EXISTS(catalog)),
# then a demographic profile. The Spark lowering keeps every channel
# membership a LEFT SEMI / LEFT ANTI join (never a per-row subquery):
# semi on the required channel, anti on the union of the excluded ones.
# Mapped: customers with a 'purchase' event but neither 'click' nor
# 'view', profiled by nation.

_DS25_ORACLE = """
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_balance
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o JOIN lineitem l
              ON l.l_orderkey = o.o_orderkey
              WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderpriority IN ('1-URGENT', '2-HIGH'))
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@query(
    "ds25_exists_boolean", _DS25_ORACLE,
    doc="TPC-DS Q69 shape: EXISTS(channel A) AND NOT EXISTS(channel B) "
        "as semi + anti joins, then a grouped profile",
)
def ds25(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # left_semi from orders to the returned lines: at most one row per
    # order reaches the customer semi-join (an inner join here would
    # explode orders x returned-lines only for the semi to re-discard)
    returned_custs = (
        orders.join(
            li.filter(F.col("l_returnflag") == "R").select("l_orderkey"),
            orders["o_orderkey"] == F.col("l_orderkey"),
            "left_semi",
        )
        .select("o_custkey")
    )
    urgent_custs = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey")
    kept = (
        cust.join(
            returned_custs, cust["c_custkey"] == returned_custs["o_custkey"],
            "left_semi",
        )
        .join(
            urgent_custs, cust["c_custkey"] == urgent_custs["o_custkey"],
            "left_anti",
        )
    )
    return (
        kept.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)).alias(
                "n_high_balance"
            ),
        )
        .orderBy("c_nationkey")
    )


# --- l10: LDBC BI-19-style weighted interaction strength --------------------
# Pair scores summed over MULTIPLE interaction channels with per-channel
# weights — the "how strongly are these two connected" shape: weight 10
# per co-order (any line pair), plus weight 1 per extra shared part
# between the suppliers across the corpus. Both channels are equi-join
# aggregates on the canonical (s1 < s2) pair key; the weighted merge is a
# FULL OUTER join of the two channel aggregates (a pair may exist in one
# channel only). Top-50 strongest pairs.

_L10_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem),
co_order AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
         COUNT(DISTINCT a.l_orderkey) AS n_orders
  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM li) a
  JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM li) b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2),
co_part AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
         COUNT(DISTINCT a.l_partkey) AS n_parts
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM li) a
  JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM li) b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2)
SELECT COALESCE(o.s1, p.s1) AS s1,
       COALESCE(o.s2, p.s2) AS s2,
       CAST(10 * COALESCE(o.n_orders, 0) + COALESCE(p.n_parts, 0) AS BIGINT)
         AS strength
FROM co_order o
FULL OUTER JOIN co_part p ON o.s1 = p.s1 AND o.s2 = p.s2
ORDER BY strength DESC, s1, s2
LIMIT 50
"""


@query(
    "l10_interaction_strength", _L10_ORACLE,
    doc="LDBC BI-19 shape: weighted pair strength from two interaction "
        "channels, FULL OUTER merged, top-50",
)
def l10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .distinct()
        # feeds both channels, each of which self-joins its projection —
        # four executions of the distinct without the checkpoint
        # (round-13 sweep: zero ReusedExchange in the plan)
        .localCheckpoint(eager=False)
    )

    def channel(key: str, out: str) -> DataFrame:
        side = li.select(key, "l_suppkey").distinct().localCheckpoint(eager=False)
        right = side.select(
            F.col(key).alias("rk"), F.col("l_suppkey").alias("sb")
        )
        return (
            side.join(
                right,
                (F.col(key) == F.col("rk"))
                & (F.col("l_suppkey") < F.col("sb")),
            )
            .groupBy(
                F.col("l_suppkey").alias("s1"), F.col("sb").alias("s2")
            )
            # side is distinct on (key, l_suppkey), so each (s1, s2, key)
            # pair row is unique -> COUNT == COUNT(DISTINCT key), minus
            # one pair-grain shuffle (round-13 batch B, guide §2.3)
            .agg(F.count(F.lit(1)).alias(out))
        )

    co_order = channel("l_orderkey", "n_orders")
    co_part = channel("l_partkey", "n_parts")
    merged = co_order.alias("o").join(
        co_part.alias("p"),
        (F.col("o.s1") == F.col("p.s1")) & (F.col("o.s2") == F.col("p.s2")),
        "full_outer",
    )
    return (
        merged.select(
            F.coalesce(F.col("o.s1"), F.col("p.s1")).alias("s1"),
            F.coalesce(F.col("o.s2"), F.col("p.s2")).alias("s2"),
            (
                10 * F.coalesce(F.col("o.n_orders"), F.lit(0))
                + F.coalesce(F.col("p.n_parts"), F.lit(0))
            ).cast("long").alias("strength"),
        )
        .orderBy(F.col("strength").desc(), "s1", "s2")
        .limit(50)
    )


# --- c16: rank-with-ties top-k ----------------------------------------------
# ClickBench-style leaderboard where ties MUST be kept: RANK() (not
# row_number) over per-user event counts, keep rank <= 3 per event type —
# the output size is data-dependent (ties expand it), which is exactly
# the semantic difference this gate pins. Integer counts, no tiebreak
# column: rows with equal counts share a rank in both engines.

_C16_ORACLE = """
WITH uc AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, user_id, n,
         RANK() OVER (PARTITION BY event_type ORDER BY n DESC) AS rk
  FROM uc)
SELECT event_type, user_id, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 3
ORDER BY event_type, rk, user_id
"""


@query(
    "c16_rank_ties_topk", _C16_ORACLE,
    doc="leaderboard top-3 with RANK() tie semantics (data-dependent "
        "output size, unlike row_number top-k)",
)
def c16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    rk = F.rank().over(
        Window.partitionBy("event_type").orderBy(F.col("n").desc())
    )
    return (
        uc.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select(
            "event_type", "user_id", "n", F.col("rk").cast("int").alias("rk")
        )
        .orderBy("event_type", "rk", "user_id")
    )


# --- l11: degree-capped friend-of-friend recommendation ---------------------
# l09 enumerates the FULL 2-hop set, so its cost is degree^2-driven — fine
# as a correctness shape, but a real recommender bounds candidate
# generation (VERDICT r5 "What's wrong #2"). l11 is the production form:
# each node keeps only its top-M co-suppliers (ranked by shared-order
# count, ties broken by neighbour id — a ranked window BEFORE the second
# hop), so 2-hop candidates per node are bounded by M^2 regardless of the
# graph's degree distribution. The exclusion anti-join runs against the
# SYMMETRISED capped edge set: round 9 excluded against the full raw
# graph, which is COMPLETE at sf<=0.01 (every supplier pair shares >= 2
# orders), so every candidate was excluded and the gate was vacuous —
# in the capped contact model, "already a contact" means either side
# keeps the other in its top-M list. Cap lowered 10 -> 5 so the capped
# graph is non-complete even on the 10-supplier sf0.001 vertex set.
# Non-vacuous at all 3 SFs (cands: 14 / 800 / 8225).

_L11_CAP = 5

_L11_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2, COUNT(DISTINCT l_orderkey) AS w FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
und AS (
  SELECT s1 AS a, s2 AS b, w FROM edges
  UNION ALL SELECT s2, s1, w FROM edges),
capped AS (
  SELECT a, b FROM (
    SELECT a, b, w,
           ROW_NUMBER() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
    FROM und) WHERE rn <= {_L11_CAP}),
sym AS (SELECT a, b FROM capped UNION SELECT b, a FROM capped),
two_hop AS (
  SELECT x.a, y.b AS c, x.b AS mid
  FROM capped x JOIN capped y ON x.b = y.a AND x.a <> y.b
  WHERE x.a < y.b),
cand AS (
  SELECT a, c, COUNT(DISTINCT mid) AS mutuals
  FROM two_hop t
  WHERE NOT EXISTS (SELECT 1 FROM sym d WHERE d.a = t.a AND d.b = t.c)
  GROUP BY a, c)
SELECT a, c, CAST(mutuals AS BIGINT) AS mutuals
FROM cand
ORDER BY mutuals DESC, a, c
LIMIT 20
"""


def _l11_capped_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranked-window degree cap BEFORE its checkpoint — factored out so
    tests can assert the cap-before-join plan shape on the subtree itself
    (ADVICE r13: the checkpointed gate plan only shows ExistingRDD)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("sb")
    )
    pairs = li.join(
        right,
        (F.col("l_orderkey") == F.col("r_okey"))
        & (F.col("l_suppkey") < F.col("sb")),
    ).select(
        F.col("l_suppkey").alias("s1"), F.col("sb").alias("s2"), "l_orderkey"
    )
    edges = (
        pairs.groupBy("s1", "s2")
        # pair rows are unique per (s1, s2, okey) — li is distinct on
        # (l_orderkey, l_suppkey) — so COUNT == COUNT(DISTINCT okey) and
        # the distinct aggregate's extra pair-grain shuffle is dropped
        # (round-13 batch B, guide §2.3)
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        # the edge set feeds multiple downstream joins; the round-13 sweep
        # read zero ReusedExchange in these plans, so each consumer re-ran
        # the per-order pair join + distinct count without the checkpoint
        .localCheckpoint(eager=False)
    )
    und = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("b"), "w"
    ).unionAll(edges.select(F.col("s2").alias("a"), F.col("s1").alias("b"), "w"))
    rn = F.row_number().over(
        Window.partitionBy("a").orderBy(F.col("w").desc(), "b")
    )
    return und.withColumn("rn", rn).filter(F.col("rn") <= _L11_CAP).drop("rn", "w")


@query(
    "l11_foaf_capped", _L11_ORACLE,
    doc="degree-capped people-you-may-know: top-M co-suppliers per node "
        "(ranked window) before the 2-hop expansion — candidates bounded "
        "by M^2 per node at any degree distribution",
)
def l11(spark: SparkSession, sf_dir: str) -> DataFrame:
    capped = _l11_capped_edges(spark, sf_dir).localCheckpoint(
        eager=False
    )  # feeds sym (2x) + the 2-hop self-join (2x)
    sym = capped.union(
        capped.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    hop2 = (
        capped.alias("x")
        .join(capped.alias("y"), F.col("x.b") == F.col("y.a"))
        .filter((F.col("x.a") != F.col("y.b")) & (F.col("x.a") < F.col("y.b")))
        .select(
            F.col("x.a").alias("a"), F.col("y.b").alias("c"),
            F.col("x.b").alias("mid"),
        )
    )
    non_direct = hop2.join(
        sym.select(F.col("a").alias("da"), F.col("b").alias("db")),
        (F.col("a") == F.col("da")) & (F.col("c") == F.col("db")),
        "left_anti",
    )
    return (
        non_direct.groupBy("a", "c")
        # hop2 rows are unique per (a, c, mid): both join arms are sets
        # of unique (src, dst) edges, so each mid links (a, c) at most
        # once -> COUNT == COUNT(DISTINCT mid) (round-13 batch B)
        .agg(F.count(F.lit(1)).alias("mutuals"))
        .orderBy(F.col("mutuals").desc(), "a", "c")
        .limit(20)
    )


# --- ds26: TPC-DS Q2 shape — window over a UNION of channels ----------------
# Template (`benchmark/tpcds/query2.tpl`): web + catalog weekly sales
# UNIONed into one stream, then compared period-over-period. The plan
# topology this adds over ds10/ds11: a Union feeding a Window — each
# branch aggregates its own filtered scan (map-side partials), the union
# is shuffle-free, and the LAG window shuffles once on the (channel)
# partition key. Mapped: expedited vs standard order priorities, monthly.

_DS26_ORACLE = """
WITH u AS (
  SELECT 'expedited' AS channel, date_trunc('month', o_orderdate) AS mth,
         SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS revq
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 2
  UNION ALL
  SELECT 'standard', date_trunc('month', o_orderdate),
         SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT))
  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY 2)
SELECT channel, CAST(mth AS DATE) AS mth,
       CAST(revq AS DOUBLE) / 10000.0 AS rev,
       CAST(LAG(revq) OVER (PARTITION BY channel ORDER BY mth) AS DOUBLE)
         / 10000.0 AS prev_rev,
       CAST(revq AS DOUBLE)
         / CAST(LAG(revq) OVER (PARTITION BY channel ORDER BY mth) AS DOUBLE)
         AS mom_ratio
FROM u ORDER BY channel, mth
"""


@query(
    "ds26_window_over_union", _DS26_ORACLE,
    doc="TPC-DS Q2 shape: per-channel monthly aggregates UNIONed, then a "
        "LAG window over the union for month-over-month ratios",
)
def ds26(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    exped = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")

    def branch(flt, label):
        return (
            orders.filter(flt)
            .groupBy(F.trunc("o_orderdate", "month").alias("mth"))
            .agg(F.sum(_q(F.col("o_totalprice"))).alias("revq"))
            .select(F.lit(label).alias("channel"), "mth", "revq")
        )

    u = branch(exped, "expedited").unionAll(branch(~exped, "standard"))
    w = Window.partitionBy("channel").orderBy("mth")
    prev = F.lag("revq").over(w)
    return (
        u.select(
            "channel",
            F.col("mth").cast("date").alias("mth"),
            (F.col("revq").cast("double") / _Q).alias("rev"),
            (prev.cast("double") / _Q).alias("prev_rev"),
            (F.col("revq").cast("double") / prev.cast("double")).alias(
                "mom_ratio"
            ),
        )
        .orderBy("channel", "mth")
    )


# --- ds27: TPC-DS Q51 shape — full-outer join of two cumulative windows -----
# Template (`benchmark/tpcds/query51.tpl`): web and store DAILY CUMULATIVE
# sales full-outer-joined on (segment, day), reporting which channel
# leads. The cumulative windows are PARTITIONED (by user segment) so no
# single-task global sort exists at scale — Q51's item_sk partitioning,
# mapped onto user_id % 4 segments over the events stream.

_DS27_ORACLE = """
WITH c AS (
  SELECT user_id % 4 AS seg, CAST(ts AS DATE) AS d,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS v
  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
cc AS (
  SELECT seg, d, SUM(v) OVER (PARTITION BY seg ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS cum
  FROM c),
p AS (
  SELECT user_id % 4 AS seg, CAST(ts AS DATE) AS d,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
pc AS (
  SELECT seg, d, SUM(v) OVER (PARTITION BY seg ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS cum
  FROM p)
SELECT COALESCE(cc.seg, pc.seg) AS seg,
       COALESCE(cc.d, pc.d) AS d,
       CAST(cc.cum AS DOUBLE) / 10000.0 AS click_cum,
       CAST(pc.cum AS DOUBLE) / 10000.0 AS purchase_cum,
       CASE WHEN COALESCE(cc.cum, 0) >= COALESCE(pc.cum, 0)
            THEN 'click' ELSE 'purchase' END AS leader
FROM cc FULL OUTER JOIN pc ON cc.seg = pc.seg AND cc.d = pc.d
ORDER BY seg, d
"""


@query(
    "ds27_cumulative_compare", _DS27_ORACLE,
    doc="TPC-DS Q51 shape: two per-segment daily cumulative windows "
        "full-outer-joined to track the leading channel",
)
def ds27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def chan(t):
        g = (
            ev.filter(F.col("event_type") == t)
            .groupBy(
                (F.col("user_id") % 4).alias("seg"),
                F.col("ts").cast("date").alias("d"),
            )
            .agg(F.sum(_q(F.col("value"))).alias("v"))
        )
        w = (
            Window.partitionBy("seg")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return g.select("seg", "d", F.sum("v").over(w).alias("cum"))

    cc, pc = chan("click").alias("cc"), chan("purchase").alias("pc")
    joined = cc.join(
        pc,
        (F.col("cc.seg") == F.col("pc.seg")) & (F.col("cc.d") == F.col("pc.d")),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("cc.seg"), F.col("pc.seg")).alias("seg"),
        F.coalesce(F.col("cc.d"), F.col("pc.d")).alias("d"),
        (F.col("cc.cum").cast("double") / _Q).alias("click_cum"),
        (F.col("pc.cum").cast("double") / _Q).alias("purchase_cum"),
        F.when(
            F.coalesce(F.col("cc.cum"), F.lit(0))
            >= F.coalesce(F.col("pc.cum"), F.lit(0)),
            F.lit("click"),
        ).otherwise(F.lit("purchase")).alias("leader"),
    ).orderBy("seg", "d")


# --- ds28: TPC-DS Q88 shape — time-band count matrix ------------------------
# Template (`benchmark/tpcds/query88.tpl`): EIGHT half-hour-band store
# counts, each its own subquery, cross-joined into a single row. The
# literal form scans the fact table 8 times; the Spark-first lowering is
# ONE conditional-aggregation pass (8 SUM(CASE..) partials, one scan, one
# single-row reduce) — the oracle keeps the 8-subquery formulation to pin
# the semantics while the plan audit pins the single scan.

_DS28_ORACLE = """
SELECT * FROM
  (SELECT CAST(COUNT(*) AS BIGINT) AS b0 FROM events
   WHERE HOUR(ts) BETWEEN 0 AND 2 AND value > 1.0) t0,
  (SELECT CAST(COUNT(*) AS BIGINT) AS b1 FROM events
   WHERE HOUR(ts) BETWEEN 3 AND 5 AND value > 1.0) t1,
  (SELECT CAST(COUNT(*) AS BIGINT) AS b2 FROM events
   WHERE HOUR(ts) BETWEEN 6 AND 8 AND value > 1.0) t2,
  (SELECT CAST(COUNT(*) AS BIGINT) AS b3 FROM events
   WHERE HOUR(ts) BETWEEN 9 AND 11 AND value > 1.0) t3,
  (SELECT CAST(COUNT(*) AS BIGINT) AS b4 FROM events
   WHERE HOUR(ts) BETWEEN 12 AND 14 AND value > 1.0) t4,
  (SELECT CAST(COUNT(*) AS BIGINT) AS b5 FROM events
   WHERE HOUR(ts) BETWEEN 15 AND 17 AND value > 1.0) t5,
  (SELECT CAST(COUNT(*) AS BIGINT) AS b6 FROM events
   WHERE HOUR(ts) BETWEEN 18 AND 20 AND value > 1.0) t6,
  (SELECT CAST(COUNT(*) AS BIGINT) AS b7 FROM events
   WHERE HOUR(ts) BETWEEN 21 AND 23 AND value > 1.0) t7
"""


@query(
    "ds28_time_band_matrix", _DS28_ORACLE,
    doc="TPC-DS Q88 shape: 8 time-band counts — literal form is 8 "
        "subquery scans, lowered to ONE conditional-aggregation pass",
)
def ds28(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 1.0)
    h = F.hour("ts")
    # count(when(...)) so an EMPTY filtered input yields 0 per band like
    # the oracle's COUNT(*) subqueries (sum over zero rows would be NULL)
    aggs = [
        F.count(F.when((h >= lo) & (h <= lo + 2), 1))
        .cast("long")
        .alias(f"b{i}")
        for i, lo in enumerate(range(0, 24, 3))
    ]
    return ev.agg(*aggs)


# --- c17: ClickBench Q28 shape — URL-domain extraction aggregate ------------
# `benchmark/clickbench/queries.sql` Q28: REGEXP the domain out of the
# Referer, AVG(length(Referer)), COUNT(*) with HAVING, MIN(Referer),
# ORDER BY avg length — the string-heavy aggregate family. The corpus has
# no URL column, so the referer is synthesised deterministically from
# (source, lang, doc_id) first — the regex, length and min-string
# behaviour being exercised is identical.

_C17_ORACLE = """
WITH h AS (
  SELECT 'https://' || source || '.example.com/' || lang || '/p'
           || CAST(doc_id % 100 AS VARCHAR) AS referer
  FROM documents),
k AS (
  SELECT regexp_extract(referer, '^https?://(?:www\\.)?([^/]+)/.*$', 1) AS dom,
         referer
  FROM h)
SELECT dom,
       AVG(CAST(length(referer) AS BIGINT)) AS avg_len,
       CAST(COUNT(*) AS BIGINT) AS c,
       MIN(referer) AS min_ref
FROM k GROUP BY dom HAVING COUNT(*) > 20
ORDER BY avg_len DESC, dom LIMIT 25
"""


@query(
    "c17_url_domain_agg", _C17_ORACLE,
    doc="ClickBench Q28 shape: regex domain key, AVG(length), HAVING "
        "count floor, min-string — the string-heavy aggregate family",
)
def c17(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    referer = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/p"), (F.col("doc_id") % 100).cast("string"),
    )
    k = docs.select(
        F.regexp_extract(
            referer, r"^https?://(?:www\.)?([^/]+)/.*$", 1
        ).alias("dom"),
        referer.alias("referer"),
    )
    return (
        k.groupBy("dom")
        .agg(
            F.avg(F.length("referer").cast("long")).alias("avg_len"),
            F.count(F.lit(1)).alias("c"),
            F.min("referer").alias("min_ref"),
        )
        .filter(F.col("c") > 20)
        .orderBy(F.col("avg_len").desc(), "dom")
        .limit(25)
    )


# --- ds29: TPC-DS Q66 shape — month PIVOT matrix ----------------------------
# Template (`benchmark/tpcds/query66.tpl`): per-warehouse sales spread
# across 12 month columns (jan_sales..dec_sales). The Spark lowering is
# the NATIVE relational pivot (`groupBy().pivot(values).agg()`), with the
# month domain pinned so the plan is a single pass (an unpinned pivot
# runs an extra distinct-values job); the oracle is the classic 12-way
# CASE-sum formulation the template expands to.

_DS29_SUMS = ",\n       ".join(
    f"CAST(SUM(CASE WHEN MONTH(o_orderdate) = {m} THEN "
    f"CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT) ELSE 0 END) AS DOUBLE)"
    f" / 10000.0 AS m{m:02d}_sales"
    for m in range(1, 13)
)

_DS29_ORACLE = f"""
SELECT c_nationkey,
       {_DS29_SUMS},
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE YEAR(o_orderdate) = 1997
GROUP BY c_nationkey ORDER BY c_nationkey
"""


@query(
    "ds29_month_pivot", _DS29_ORACLE,
    doc="TPC-DS Q66 shape: per-nation monthly sales matrix via the NATIVE "
        "groupBy().pivot() with a pinned value domain (single pass)",
)
def ds29(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = (
        orders.filter(F.year("o_orderdate") == 1997)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_nationkey",
            F.month("o_orderdate").alias("m"),
            _q(F.col("o_totalprice")).alias("pq"),
        )
    )
    # ONE aggregation pass: the pivot carries both the month sums and the
    # month counts; n_orders is the sum of the 12 count columns — no
    # second groupBy, no join back
    pivoted = (
        base.groupBy("c_nationkey")
        .pivot("m", list(range(1, 13)))
        .agg(F.sum("pq").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    sel = [F.col("c_nationkey")] + [
        (F.coalesce(F.col(f"`{m}_s`"), F.lit(0)).cast("double") / _Q).alias(
            f"m{m:02d}_sales"
        )
        for m in range(1, 13)
    ]
    n_orders = sum(
        (F.coalesce(F.col(f"`{m}_c`"), F.lit(0)) for m in range(1, 13)),
        F.lit(0),
    ).cast("long").alias("n_orders")
    return pivoted.select(*sel, n_orders).orderBy("c_nationkey")


# --- ds30: TPC-DS Q17/Q29 shape — fact-to-fact-to-fact chain ----------------
# Template (`benchmark/tpcds/query17.tpl`): a store sale, its return, and
# the customer's subsequent catalog purchase of the SAME item — three
# fact references chained on (customer, item) with time ordering.
# Mapped: a returned line (l_returnflag = 'R'), joined to the same
# customer RE-ordering the same part later — two fact scans of lineitem
# chained through orders on (custkey, partkey) with date progression.
# The chain is two hash equi-joins on composite keys; quantity stats per
# nation close the shape.

_DS30_ORACLE = """
WITH ret AS (
  SELECT o.o_custkey AS ck, l.l_partkey AS pk, o.o_orderdate AS rdate,
         l.l_quantity AS rqty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'),
rebuy AS (
  SELECT o.o_custkey AS ck, l.l_partkey AS pk, o.o_orderdate AS bdate,
         l.l_quantity AS bqty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag <> 'R'),
chain AS (
  SELECT r.ck, r.pk, r.rqty, b.bqty
  FROM ret r JOIN rebuy b
    ON r.ck = b.ck AND r.pk = b.pk AND b.bdate > r.rdate)
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers,
       CAST(SUM(rqty) AS BIGINT) AS returned_qty,
       CAST(SUM(bqty) AS BIGINT) AS rebought_qty
FROM chain JOIN customer c ON chain.ck = c.c_custkey
GROUP BY c.c_nationkey ORDER BY c.c_nationkey
"""


@query(
    "ds30_return_rebuy_chain", _DS30_ORACLE,
    doc="TPC-DS Q17/Q29 shape: fact-to-fact chain (returned line -> later "
        "re-purchase of the same part by the same customer) through "
        "composite-key hash joins",
)
def ds30(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    ret = lo.filter(F.col("l_returnflag") == "R").select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"),
        F.col("o_orderdate").alias("rdate"), F.col("l_quantity").alias("rqty"),
    )
    rebuy = lo.filter(F.col("l_returnflag") != "R").select(
        F.col("o_custkey").alias("ck2"), F.col("l_partkey").alias("pk2"),
        F.col("o_orderdate").alias("bdate"), F.col("l_quantity").alias("bqty"),
    )
    chain = ret.join(
        rebuy,
        (F.col("ck") == F.col("ck2"))
        & (F.col("pk") == F.col("pk2"))
        & (F.col("bdate") > F.col("rdate")),
    )
    return (
        chain.join(cust, F.col("ck") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_chains"),
            F.countDistinct("ck").alias("n_customers"),
            F.sum("rqty").cast("long").alias("returned_qty"),
            F.sum("bqty").cast("long").alias("rebought_qty"),
        )
        .orderBy("c_nationkey")
    )


# --- c18: ClickBench Q33 shape — derived arithmetic group keys --------------
# `SELECT ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3, COUNT(*) ...
# GROUP BY` all four: grouping keys that are EXPRESSIONS over one column.
# Catalyst recognises the functional dependency (all four derive from
# user_id) so the hash agg keys on the expressions without widening the
# shuffle; top-10 by count closes the shape.

_C18_ORACLE = """
SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, user_id - 3 AS u3,
       CAST(COUNT(*) AS BIGINT) AS c
FROM events
GROUP BY user_id, u1, u2, u3
ORDER BY c DESC, user_id LIMIT 10
"""


@query(
    "c18_derived_key_group", _C18_ORACLE,
    doc="ClickBench Q33 shape: GROUP BY a column plus arithmetic "
        "derivations of it, top-10 by count",
)
def c18(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            (F.col("user_id") - 1).alias("u1"),
            (F.col("user_id") - 2).alias("u2"),
            (F.col("user_id") - 3).alias("u3"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "user_id")
        .limit(10)
    )


# --- ds31: TPC-DS Q21 shape — before/after pivot-date ratio band ------------
# Template (`benchmark/tpcds/query21.tpl`): per (warehouse, item)
# inventory split into before/after a pivot date, keeping rows whose
# after/before ratio sits inside [2/3, 3/2]. One conditional-agg pass
# over the fact; the ratio HAVING is exact integer cross-multiplication
# (3*after between 2*before and ... is wrong — Q21's band is
# 2/3 <= a/b <= 3/2, i.e. 2b <= 3a AND 2a <= 3b) — no float division in
# the predicate at all.

_DS31_ORACLE = """
SELECT l_suppkey, l_partkey,
       CAST(SUM(CASE WHEN l_shipdate < DATE '1997-07-01'
                     THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_before,
       CAST(SUM(CASE WHEN l_shipdate >= DATE '1997-07-01'
                     THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_after
FROM lineitem
GROUP BY l_suppkey, l_partkey
HAVING SUM(CASE WHEN l_shipdate < DATE '1997-07-01'
               THEN l_quantity ELSE 0 END) > 0
   AND SUM(CASE WHEN l_shipdate >= DATE '1997-07-01'
               THEN l_quantity ELSE 0 END) > 0
   AND 2 * SUM(CASE WHEN l_shipdate < DATE '1997-07-01'
                    THEN l_quantity ELSE 0 END)
       <= 3 * SUM(CASE WHEN l_shipdate >= DATE '1997-07-01'
                       THEN l_quantity ELSE 0 END)
   AND 2 * SUM(CASE WHEN l_shipdate >= DATE '1997-07-01'
                    THEN l_quantity ELSE 0 END)
       <= 3 * SUM(CASE WHEN l_shipdate < DATE '1997-07-01'
                       THEN l_quantity ELSE 0 END)
ORDER BY l_suppkey, l_partkey
"""


@query(
    "ds31_inventory_ratio_band", _DS31_ORACLE,
    doc="TPC-DS Q21 shape: before/after pivot-date quantity split with an "
        "exact cross-multiplied ratio band in HAVING — one scan, no float "
        "division in the predicate",
)
def ds31(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pivot = F.lit("1997-07-01").cast("date")
    before = F.sum(
        F.when(F.col("l_shipdate") < pivot, F.col("l_quantity")).otherwise(0)
    )
    after = F.sum(
        F.when(F.col("l_shipdate") >= pivot, F.col("l_quantity")).otherwise(0)
    )
    g = li.groupBy("l_suppkey", "l_partkey").agg(
        before.cast("long").alias("qty_before"),
        after.cast("long").alias("qty_after"),
    )
    return (
        g.filter(
            (F.col("qty_before") > 0)
            & (F.col("qty_after") > 0)
            & (2 * F.col("qty_before") <= 3 * F.col("qty_after"))
            & (2 * F.col("qty_after") <= 3 * F.col("qty_before"))
        )
        .orderBy("l_suppkey", "l_partkey")
    )


# --- ds32: TPC-DS Q34/Q73 shape — frequent multi-trip customers -------------
# Template (`benchmark/tpcds/query34.tpl`): trips (orders) with an item
# count inside a band, then a SECOND grouping level keeps only customers
# with >= 2 such trips. Two stacked aggregations — trip-level then
# customer-level — with the band filter between them; the customer join
# lands AFTER both reductions, so only qualifying customers are joined.

_DS32_ORACLE = """
WITH trips AS (
  SELECT o_custkey, l_orderkey, COUNT(*) AS items
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_orderkey
  HAVING COUNT(*) BETWEEN 5 AND 7),
freq AS (
  SELECT o_custkey, COUNT(*) AS n_trips, SUM(items) AS total_items
  FROM trips GROUP BY o_custkey HAVING COUNT(*) >= 2)
SELECT c.c_name, f.o_custkey AS custkey,
       CAST(f.n_trips AS BIGINT) AS n_trips,
       CAST(f.total_items AS BIGINT) AS total_items
FROM freq f JOIN customer c ON f.o_custkey = c.c_custkey
ORDER BY n_trips DESC, custkey
"""


@query(
    "ds32_frequent_trips", _DS32_ORACLE,
    doc="TPC-DS Q34/Q73 shape: banded trip-size aggregation stacked under "
        "a customer-frequency aggregation; dimension join only after both "
        "reductions",
)
def ds32(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    trips = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("items"))
        .filter(F.col("items").between(5, 7))
    )
    freq = (
        trips.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.sum("items").alias("total_items"),
        )
        .filter(F.col("n_trips") >= 2)
    )
    return (
        freq.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("o_custkey").alias("custkey"),
            F.col("n_trips").cast("long").alias("n_trips"),
            F.col("total_items").cast("long").alias("total_items"),
        )
        .orderBy(F.col("n_trips").desc(), "custkey")
    )


# --- ds33: TPC-DS Q90 shape — am/pm activity ratio --------------------------
# Template (`benchmark/tpcds/query90.tpl`): the ratio of morning-window
# to evening-window counts, written in the template as two scalar
# subqueries cross-joined. Lowered (like ds28) to ONE conditional-agg
# scan; the ratio is exact-integer counts divided once at the end.

_DS33_ORACLE = """
SELECT CAST(am.c AS BIGINT) AS am_count,
       CAST(pm.c AS BIGINT) AS pm_count,
       CAST(am.c AS DOUBLE) / CAST(NULLIF(pm.c, 0) AS DOUBLE) AS am_pm_ratio
FROM (SELECT COUNT(*) AS c FROM events
      WHERE HOUR(ts) BETWEEN 6 AND 11 AND value > 0.5) am,
     (SELECT COUNT(*) AS c FROM events
      WHERE HOUR(ts) BETWEEN 18 AND 23 AND value > 0.5) pm
"""


@query(
    "ds33_am_pm_ratio", _DS33_ORACLE,
    doc="TPC-DS Q90 shape: morning/evening count ratio — template's two "
        "scalar subqueries lowered to one conditional-agg scan",
)
def ds33(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0.5)
    h = F.hour("ts")
    agg = ev.agg(
        F.count(F.when((h >= 6) & (h <= 11), 1)).alias("am_count"),
        F.count(F.when((h >= 18) & (h <= 23), 1)).alias("pm_count"),
    )
    # Zero guard: on an empty evening band DuckDB's IEEE default yields
    # Infinity while Spark yields NULL — NULLIF in the oracle and an
    # explicit when() here make both engines emit NULL.
    return agg.select(
        F.col("am_count").cast("long"),
        F.col("pm_count").cast("long"),
        F.when(
            F.col("pm_count") != 0,
            F.col("am_count").cast("double") / F.col("pm_count").cast("double"),
        ).alias("am_pm_ratio"),
    )


# --- ds34: TPC-DS Q72 shape — date-dim TRIPLE role with cross-role preds ----
# Template (`benchmark/tpcds/query72.tpl`): catalog_sales x inventory with
# date_dim joined THREE times (sold / inventory / ship roles), week
# equality BETWEEN roles (d1.d_week_seq = d2.d_week_seq), a day-offset
# inequality (d3.d_date > d1.d_date + 5), a LEFT JOIN whose null-ness is
# counted (promo vs no_promo), group + topk. Re-authored on the repo
# corpus: lineitem x orders, a derived dense date dim (spine from one
# tiny min/max agg — O(days), broadcast at any scale) in the order-date /
# ship-date / derived-receipt-date roles, promo = the p_size >= 40 part
# subset. All three dim joins broadcast; the only big shuffle is the
# lineitem-orders join + final agg.

_DS34_ORACLE = """
WITH bounds AS (
  SELECT (SELECT MIN(CAST(o_orderdate AS DATE)) FROM orders) AS lo,
         (SELECT MAX(CAST(l_shipdate AS DATE)) + 7 FROM lineitem) AS hi),
dd AS (
  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS d_date
  FROM bounds),
dd2 AS (
  SELECT d_date,
         CAST(datediff('day', DATE '1970-01-01', d_date) // 7 AS BIGINT)
           AS d_week_seq
  FROM dd),
f AS (
  SELECT l.l_partkey, l.l_returnflag,
         d1.d_week_seq AS week_seq, d1.d_date AS order_d
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN dd2 d1 ON d1.d_date = CAST(o.o_orderdate AS DATE)
  JOIN dd2 d2 ON d2.d_date = CAST(l.l_shipdate AS DATE)
             AND d1.d_week_seq = d2.d_week_seq
  JOIN dd2 d3 ON d3.d_date = CAST(l.l_shipdate AS DATE) + l.l_linenumber
             AND d3.d_date > d1.d_date + 5)
SELECT f.week_seq, f.l_returnflag,
       CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS no_promo,
       CAST(SUM(CASE WHEN p.p_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS promo,
       CAST(COUNT(*) AS BIGINT) AS total_cnt
FROM f LEFT JOIN (SELECT p_partkey FROM part WHERE p_size >= 40) p
  ON f.l_partkey = p.p_partkey
GROUP BY f.week_seq, f.l_returnflag
ORDER BY total_cnt DESC, f.week_seq, f.l_returnflag
LIMIT 30
"""


@query(
    "ds34_week_chain_triple_date", _DS34_ORACLE,
    doc="TPC-DS Q72 shape: one date dim joined in THREE roles with "
        "cross-role week equality + day-offset predicates, null-counted "
        "promo left join, top-30",
)
def ds34(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    bounds = (
        orders.agg(F.min(F.to_date("o_orderdate")).alias("lo"))
        .crossJoin(
            li.agg(F.date_add(F.max(F.to_date("l_shipdate")), 7).alias("hi"))
        )
    )
    dd = (
        bounds.select(F.explode(F.sequence("lo", "hi")).alias("d_date"))
        .withColumn(
            "d_week_seq",
            (F.datediff("d_date", F.lit("1970-01-01").cast("date")) / 7)
            .cast("long"),
        )
        # O(days) rows; checkpoint so the spine (and its 1-row bounds
        # cross join) computes ONCE instead of once per date role
        .localCheckpoint(eager=True)
    )
    d1 = dd.select(
        F.col("d_date").alias("d1_date"), F.col("d_week_seq").alias("week_seq")
    )
    d2 = dd.select(
        F.col("d_date").alias("d2_date"), F.col("d_week_seq").alias("w2")
    )
    d3 = dd.select(F.col("d_date").alias("d3_date"))
    promo = part.filter(F.col("p_size") >= 40).select("p_partkey")
    f = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(d1), F.col("d1_date") == F.to_date("o_orderdate")
        )
        .join(
            F.broadcast(d2),
            (F.col("d2_date") == F.to_date("l_shipdate"))
            & (F.col("week_seq") == F.col("w2")),
        )
        .join(
            F.broadcast(d3),
            (
                F.col("d3_date")
                == F.expr("date_add(to_date(l_shipdate), l_linenumber)")
            )
            & (F.col("d3_date") > F.date_add("d1_date", 5)),
        )
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left")
    )
    return (
        f.groupBy("week_seq", "l_returnflag")
        .agg(
            F.sum(F.when(F.col("p_partkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("no_promo"),
            F.sum(F.when(F.col("p_partkey").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("promo"),
            F.count(F.lit(1)).alias("total_cnt"),
        )
        .orderBy(F.col("total_cnt").desc(), "week_seq", "l_returnflag")
        .limit(30)
    )


# --- ds35: TPC-DS Q14 shape — INTERSECT-driven cross-channel agg ------------
# Template (`benchmark/tpcds/query14.tpl`): cross_items = the item keys
# present in ALL THREE sales channels (two INTERSECTs), avg_sales = a
# scalar threshold over the UNION ALL of the channels, then a per-channel
# aggregate restricted (IN-subquery -> semi-join) to cross_items and
# HAVING-filtered against the scalar. Re-authored on events: channels =
# click/view/purchase, items = user_ids, sales = quantized value sums.
# The INTERSECT chain lowers to semi-joins over distinct keys (one
# shuffle per channel), the scalar is a broadcast threshold, the final
# agg is two-level (per user then per channel) — no shape in the corpus
# repeats this topology.

_DS35_ORACLE = """
WITH cross_users AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
chan AS (
  SELECT event_type, user_id,
         SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS qsum
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
    AND user_id IN (SELECT user_id FROM cross_users)
  GROUP BY event_type, user_id),
avg_sales AS (
  SELECT CAST(SUM(qsum) AS DOUBLE) / COUNT(*) AS threshold
  FROM chan)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(qsum) AS DOUBLE) / 10000.0 AS total_value
FROM chan
WHERE CAST(qsum AS DOUBLE) > (SELECT threshold FROM avg_sales)
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "ds35_cross_channel_intersect", _DS35_ORACLE,
    doc="TPC-DS Q14 shape: INTERSECT chain of per-channel key sets, "
        "UNION-derived scalar threshold, semi-join-restricted per-channel "
        "aggregate with HAVING vs the scalar",
)
def ds35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t).select("user_id").distinct()
        )

    cross_users = (
        users("click").intersect(users("view")).intersect(users("purchase"))
    )
    chan = (
        ev.filter(
            F.col("event_type").isin("click", "view", "purchase")
        )
        .join(cross_users, "user_id", "left_semi")
        .groupBy("event_type", "user_id")
        .agg(F.sum(_q(F.col("value"))).alias("qsum"))
    )
    chan = chan.localCheckpoint(eager=False)  # reused by scalar + final agg
    threshold = (
        chan.agg(
            (F.sum("qsum").cast("double") / F.count(F.lit(1))).alias("t")
        )
    )
    return (
        chan.crossJoin(F.broadcast(threshold))
        .filter(F.col("qsum").cast("double") > F.col("t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (F.sum("qsum").cast("double") / _Q).alias("total_value"),
        )
        .orderBy("event_type")
    )


# --- c19: ClickBench Q19 shape — time-part + high-card key top-10 -----------
# `benchmark/clickbench/queries.sql:19`: GROUP BY (UserID,
# minute(EventTime), SearchPhrase) ORDER BY count DESC LIMIT 10 — the
# cardinality-explosion grouping (user x minute x phrase) that stresses
# partial aggregation: the per-key counts are tiny, so the map-side
# combine barely reduces and the shuffle carries ~input-size groups.
# Re-authored on events with deterministic tiebreaks (the template's bare
# ORDER BY count leaves ties unordered). TopK lowers to
# TakeOrderedAndProject — no global sort.

_C19_ORACLE = """
SELECT user_id, CAST(EXTRACT(minute FROM ts) AS INT) AS m, event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY user_id, m, event_type
ORDER BY n DESC, user_id, m, event_type
LIMIT 10
"""


@query(
    "c19_minute_phrase_topk", _C19_ORACLE,
    doc="ClickBench Q19 shape: (user, minute-of-hour, type) grouping — "
        "cardinality explosion through partial agg, top-10",
)
def c19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.minute("ts").alias("m"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id", "m", "event_type")
        .limit(10)
    )


# --- l12: LDBC BI-15 shape — interaction-weighted bounded shortest path -----
# Template (`benchmark/ldbc/bi-15.sql`): edge weights derived from an
# interaction aggregate (10/(w+10) per knows-edge), then a weighted
# shortest path between people. Re-authored on the co-supplier graph
# (l09/l11's): edge weight = co-order count, per-edge cost the template's
# reciprocal-interaction form held EXACT-INTEGER (floor(1e6/(w+10)) —
# float path sums differ in the last ulp between engines depending on
# association, the g02 lesson), out-degree capped at 5 (l11's bound: the
# frontier is at most 5^k from any source regardless of the degree
# distribution), and the path search is 3 rounds of Bellman-Ford
# RELAXATION: dist_k = min(dist_{k-1}, min over edges(dist_{k-1}[src] +
# cost)) — O(V) state per round, never path enumeration; each round is
# one equi-join + one groupBy-min on the node key. Positive costs give
# prefix optimality, so 3 relaxation rounds = exact min over <=3-hop
# walks, which is what the oracle's bounded recursive CTE enumerates.

_L12_ORACLE = """
WITH RECURSIVE so AS (
  SELECT l_orderkey, l_suppkey FROM lineitem GROUP BY 1, 2),
e0 AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst, COUNT(*) AS w
  FROM so a JOIN so b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2),
e AS (
  SELECT src, dst, CAST(FLOOR(1000000.0 / (w + 10)) AS BIGINT) AS cost
  FROM e0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src ORDER BY
    CAST(FLOOR(1000000.0 / (w + 10)) AS BIGINT), dst) <= 5),
s AS (SELECT MIN(src) AS root FROM e),
walk(dst, cost, depth) AS (
  SELECT e.dst, e.cost, 1 FROM e JOIN s ON e.src = s.root
  UNION ALL
  SELECT e.dst, w.cost + e.cost, w.depth + 1
  FROM walk w JOIN e ON e.src = w.dst WHERE w.depth < 3)
SELECT dst, CAST(MIN(cost) AS BIGINT) AS best_cost
FROM walk WHERE dst <> (SELECT root FROM s)
GROUP BY dst ORDER BY best_cost, dst LIMIT 20
"""


@query(
    "l12_weighted_path", _L12_ORACLE,
    doc="LDBC BI-15 shape: interaction-weighted edges (exact-integer "
        "reciprocal cost), out-degree cap 5, 3-round Bellman-Ford "
        "relaxation = exact min-cost over <=3-hop walks",
)
def l12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    so = li.select("l_orderkey", "l_suppkey").distinct()
    right = so.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb")
    )
    e0 = (
        so.join(
            right,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("l_suppkey") != F.col("sb")),
        )
        .groupBy(F.col("l_suppkey").alias("src"), F.col("sb").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    cost = F.floor(1000000.0 / (F.col("w") + 10)).cast("long")
    wcap = Window.partitionBy("src").orderBy(cost, "dst")
    e = (
        e0.withColumn("cost", cost)
        .withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 5)
        .select("src", "dst", "cost")
        .localCheckpoint(eager=True)  # reused every relaxation round
    )
    root = e.agg(F.min("src").alias("root"))
    dist = (
        e.join(F.broadcast(root), F.col("src") == F.col("root"))
        .select("dst", "cost")
    )
    hop = e.select(
        F.col("src").alias("hsrc"), F.col("dst").alias("hdst"),
        F.col("cost").alias("hcost"),
    )
    for _ in range(2):
        relaxed = dist.join(hop, F.col("dst") == F.col("hsrc")).select(
            F.col("hdst").alias("dst"),
            (F.col("cost") + F.col("hcost")).alias("cost"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("dst")
            .agg(F.min("cost").alias("cost"))
        )
    return (
        dist.crossJoin(F.broadcast(root))
        .filter(F.col("dst") != F.col("root"))
        .select("dst", F.col("cost").alias("best_cost"))
        .orderBy("best_cost", "dst")
        .limit(20)
    )


# --- b13: JOB — fact-fact-dim TRIANGLE with a redundant transitive edge -----
# The JOB 32a-family topology (`benchmark/job/32a.sql`): two fact roles
# over the SAME entity plus the dim, with all THREE equalities written
# out (t.id = mc.movie_id AND t.id = ci.movie_id AND ci.movie_id =
# mc.movie_id) — the redundant edge is what lets an optimizer pick any
# of the three join orders. Re-authored: two lineitem roles on one order
# (a returned line paired with a high-quantity line of the same order)
# plus the orders dim. The self-join must stay a hash join on the order
# key; the pair space within an order is bounded by lines-per-order.

_B13_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       MIN(o.o_orderpriority) AS first_priority
FROM lineitem l1, lineitem l2, orders o
WHERE l1.l_orderkey = o.o_orderkey
  AND l2.l_orderkey = o.o_orderkey
  AND l1.l_orderkey = l2.l_orderkey
  AND l1.l_returnflag = 'R'
  AND l2.l_quantity > 30
  AND l1.l_linenumber <> l2.l_linenumber
"""


@query(
    "b13_job_triangle", _B13_ORACLE,
    doc="JOB 32a triangle: two fact roles + dim with the redundant "
        "transitive equality spelled out — returned line paired with a "
        "high-quantity line of the same order",
)
def b13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k1"), F.col("l_linenumber").alias("ln1")
    )
    l2 = li.filter(F.col("l_quantity") > 30).select(
        F.col("l_orderkey").alias("k2"), F.col("l_linenumber").alias("ln2")
    )
    return (
        l1.join(l2, (F.col("k1") == F.col("k2")) & (F.col("ln1") != F.col("ln2")))
        .join(orders, F.col("k1") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.min("o_orderpriority").alias("first_priority"),
        )
    )


# --- b15: SSB Q1.1 — flat fact filter + derived-measure sum -----------------
# `benchmark/ssb/q1-1.sql`: one fact scan, band predicates on discount
# and quantity, a year filter, and SUM(extendedprice * discount) — the
# no-join baseline every star-schema engine is measured against (its
# whole cost is scan + pushed filters + one agg). The product is
# quantized AFTER the single multiply (floor(p*d*1e4)) — one double
# product is bit-identical across engines, sums stay integer.

_B15_ORACLE = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0) AS BIGINT))
            AS BIGINT) AS revenue_q,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_discount BETWEEN 0.01 AND 0.03
  AND l_quantity < 25
  AND l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
"""


@query(
    "b15_ssb_flat_revenue", _B15_ORACLE,
    doc="SSB Q1.1: single fact scan with band predicates and a "
        "derived-measure quantized sum — the pushdown baseline",
)
def b15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_discount").between(0.01, 0.03)
            & (F.col("l_quantity") < 25)
            & (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * F.col("l_discount") * 10000.0
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_q"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- ds36: TPC-DS Q23 shape — two reduction CTEs semi-joined into the fact --
# Template (`benchmark/tpcds/query23.tpl`): frequent_ss_items (items sold
# on > 4 distinct dates) and best_store_customers (top spenders) are
# computed INDEPENDENTLY, then the final sum keeps only fact rows hitting
# BOTH sets. Re-authored: frequent parts = shipped on > 4 distinct dates;
# best customers = top-100 by quantized spend (rank with custkey
# tiebreak — a deterministic stand-in for the template's percentile
# cutoff); result = revenue of frequent parts sold to best customers.
# Both reductions are map-side-combinable aggregates; the fact keeps two
# semi-joins (no row widening) and one final agg.

_DS36_ORACLE = """
WITH freq AS (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey
  HAVING COUNT(DISTINCT CAST(l_shipdate AS DATE)) > 4),
spend AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS sp
  FROM orders GROUP BY o_custkey),
best AS (
  SELECT o_custkey FROM spend
  QUALIFY ROW_NUMBER() OVER (ORDER BY sp DESC, o_custkey) <= 100)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 10000.0) AS BIGINT))
            AS BIGINT) AS rev_q
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_partkey IN (SELECT l_partkey FROM freq)
  AND o.o_custkey IN (SELECT o_custkey FROM best)
"""


@query(
    "ds36_frequent_best_compose", _DS36_ORACLE,
    doc="TPC-DS Q23 shape: two independent reduction CTEs (frequent "
        "parts, top-spend customers) semi-joined into the fact",
)
def ds36(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    freq = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct(F.to_date("l_shipdate")).alias("nd"))
        .filter(F.col("nd") > 4)
        .select("l_partkey")
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_q(F.col("o_totalprice"))).alias("sp")
    )
    w = Window.orderBy(F.col("sp").desc(), "o_custkey")
    best = (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("o_custkey")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(freq, "l_partkey", "left_semi")
        .join(best, "o_custkey", "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_q(F.col("l_extendedprice"))).alias("rev_q"),
        )
    )


# --- c20: ClickBench row-fetch — SELECT * with filter + top-10 ---------------
# `benchmark/clickbench/queries.sql:23`: SELECT * ... WHERE URL LIKE
# '%google%' ORDER BY EventTime LIMIT 10 — the WIDE-ROW retrieval shape
# every aggregate gate leaves untested: column pruning must NOT kick in
# (all columns read), the contains-filter is pushed to the scan, and the
# order+limit lowers to a top-k carrying full rows. Deterministic
# tiebreak on event_id (the template's bare ORDER BY EventTime ties).

_C20_ORACLE = """
SELECT event_id, epoch_us(ts) AS us, user_id, event_type,
       CAST(FLOOR(value * 10000.0) AS BIGINT) AS value_q, props
FROM events
WHERE props LIKE '%9}'
ORDER BY us, event_id
LIMIT 10
"""


@query(
    "c20_row_fetch_topk", _C20_ORACLE,
    doc="ClickBench Q23 shape: SELECT * wide-row retrieval with a "
        "contains filter and ORDER BY time LIMIT 10 — full-width top-k",
)
def c20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like("%9}"))
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "user_id",
            "event_type",
            _q(F.col("value")).alias("value_q"),
            "props",
        )
        .orderBy("us", "event_id")
        .limit(10)
    )


# --- ds37: TPC-DS Q11 shape — year-over-year growth comparison --------------
# Template (`benchmark/tpcds/query11.tpl`): customers whose WEB-channel
# year-over-year growth ratio exceeds their STORE-channel growth ratio.
# The template compares two ratios of yearly sums; the repo lowering makes
# the comparison EXACT by cross-multiplication (web2/web1 > store2/store1
# <=> web2*store1 > store2*web1 over positive integers) — no division, no
# float ulp hazard, and the growth ordering key is an integer ppm. Cents
# quantisation (1e2, not the usual 1e4) keeps the cross products inside
# 64 bits: yearly sums <= ~1e8 cents, products <= ~1e16 << 2^63.
# Distributed shape: one orderkey shuffle join + one custkey groupBy with
# conditional aggregates (the 4-way pivot), filter + top-100.

_DS37_ORACLE = """
WITH sales AS (
  SELECT o_custkey AS cust, YEAR(o_orderdate) AS yr,
         CASE WHEN l_partkey % 2 = 1 THEN 'web' ELSE 'store' END AS chan,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0)
             AS BIGINT)) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE YEAR(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3),
p AS (
  SELECT cust,
         CAST(SUM(CASE WHEN yr = 1995 AND chan = 'web' THEN rev ELSE 0 END)
              AS BIGINT) AS web1,
         CAST(SUM(CASE WHEN yr = 1996 AND chan = 'web' THEN rev ELSE 0 END)
              AS BIGINT) AS web2,
         CAST(SUM(CASE WHEN yr = 1995 AND chan = 'store' THEN rev ELSE 0 END)
              AS BIGINT) AS store1,
         CAST(SUM(CASE WHEN yr = 1996 AND chan = 'store' THEN rev ELSE 0 END)
              AS BIGINT) AS store2
  FROM sales GROUP BY cust)
SELECT cust, web1, web2, store1, store2,
       CAST(web2 * 1000000 // web1 AS BIGINT) AS web_growth_ppm
FROM p
WHERE web1 > 0 AND store1 > 0 AND web2 * store1 > store2 * web1
ORDER BY web_growth_ppm DESC, cust LIMIT 100
"""


@query(
    "ds37_yoy_growth_compare", _DS37_ORACLE,
    doc="TPC-DS Q11 shape: web-vs-store year-over-year growth compared "
        "by exact integer cross-multiplication (no float ratios)",
)
def ds37(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    web = F.col("l_partkey") % 2 == 1
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("cust"),
        F.year("o_orderdate").alias("yr"),
        F.when(web, "web").otherwise("store").alias("chan"),
        cents.alias("cents"),
    )

    def _band(yr: int, chan: str):
        return F.sum(
            F.when((F.col("yr") == yr) & (F.col("chan") == chan),
                   F.col("cents")).otherwise(F.lit(0))
        )

    p = j.groupBy("cust").agg(
        _band(1995, "web").alias("web1"),
        _band(1996, "web").alias("web2"),
        _band(1995, "store").alias("store1"),
        _band(1996, "store").alias("store2"),
    )
    return (
        p.filter(
            (F.col("web1") > 0)
            & (F.col("store1") > 0)
            & (F.col("web2") * F.col("store1")
               > F.col("store2") * F.col("web1"))
        )
        .select(
            "cust", "web1", "web2", "store1", "store2",
            F.expr("web2 * 1000000 DIV web1").alias("web_growth_ppm"),
        )
        .orderBy(F.col("web_growth_ppm").desc(), "cust")
        .limit(100)
    )


# --- b16: JOB shape — min-string star with disjunctive LIKE filters ---------
# The Join Order Benchmark's signature form (`benchmark/job/*.sql`): a
# star of dimension equality joins whose SELECT list is MIN() over
# STRING columns from different tables, filtered by disjunctive LIKE
# predicates — the optimizer stress is join ordering under non-sargable
# string filters. Lowered over part/supplier/nation around lineitem; all
# three dims broadcast, so the only shuffle is the final single-row
# aggregate's partial merge.

_B16_ORACLE = """
SELECT MIN(p_name) AS min_part, MIN(s_name) AS min_supp,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE (p_type LIKE '%BRASS%' OR p_type LIKE '%COPPER%')
  AND n_name IN ('FRANCE', 'GERMANY', 'RUSSIA')
  AND l_quantity > 30
"""


@query(
    "b16_job_min_star", _B16_ORACLE,
    doc="JOB shape: MIN(string) star aggregate under disjunctive LIKE "
        "dimension filters — broadcast dims, single-row result",
)
def b16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("%BRASS%") | F.col("p_type").like("%COPPER%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("FRANCE", "GERMANY", "RUSSIA")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return j.agg(
        F.min("p_name").alias("min_part"),
        F.min("s_name").alias("min_supp"),
        F.count(F.lit(1)).alias("n"),
    )


# --- c21: ClickBench shape — multi-group regex key + COUNT(DISTINCT) --------
# ClickBench's regex-heavy rows (`benchmark/clickbench/queries.sql` Q22/
# Q24 family): extract MULTIPLE capture groups from a URL-shaped string
# in one pattern, group by the extracted pair, and count rows AND
# distinct users per key — the distinct-aggregate-over-derived-key form
# c17 (AVG/MIN battery) does not cover. The URL is synthesised from the
# events row (the corpus has no URL column); the regex work is identical.
# Distributed shape: one partial-aggregated groupBy carrying the distinct
# user set (Spark plans COUNT DISTINCT as a two-phase expand aggregate),
# then TakeOrderedAndProject top-10.

_C21_ORACLE = """
WITH u AS (
  SELECT user_id,
         '/cat/' || event_type || '/item/'
           || regexp_extract(props, '[0-9]+', 0) || '/view' AS url
  FROM events WHERE props IS NOT NULL),
k AS (
  SELECT user_id,
         regexp_extract(url, '^/cat/([a-z]+)/item/([0-9]+)/', 1) AS cat,
         regexp_extract(url, '^/cat/([a-z]+)/item/([0-9]+)/', 2) AS item
  FROM u)
SELECT cat, item,
       CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniq_users
FROM k GROUP BY cat, item
ORDER BY hits DESC, uniq_users DESC, cat, item LIMIT 10
"""


@query(
    "c21_regex_multigroup_uniq", _C21_ORACLE,
    doc="ClickBench shape: two-group regex extraction key with COUNT + "
        "COUNT(DISTINCT user) and top-10 — distinct agg over derived key",
)
def c21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    url = F.concat(
        F.lit("/cat/"), F.col("event_type"), F.lit("/item/"),
        F.regexp_extract("props", r"[0-9]+", 0), F.lit("/view"),
    )
    pat = r"^/cat/([a-z]+)/item/([0-9]+)/"
    k = ev.select(
        "user_id",
        F.regexp_extract(url, pat, 1).alias("cat"),
        F.regexp_extract(url, pat, 2).alias("item"),
    )
    return (
        k.groupBy("cat", "item")
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
        .orderBy(
            F.col("hits").desc(), F.col("uniq_users").desc(), "cat", "item"
        )
        .limit(10)
    )


# --- l13: local clustering coefficient over the co-supplier graph -----------
# Graph analytics beyond reachability (l08/l12) and recommendation (l11):
# the per-node LOCAL CLUSTERING COEFFICIENT — closed wedges / wedges over
# each node's top-M neighbourhood — the LDBC/graph-mining statistic for
# community tightness. Scale discipline matches l11: the wedge set is
# generated from the DEGREE-CAPPED adjacency (top-5 by weight), so wedges
# per node are bounded by M(M-1)/2 at any degree distribution; closure is
# one equi-join of wedges against the canonical (s1<s2) edge set.
# cc = closed/wedges is a single exact division of small integers.

_L13_CAP = 5

_L13_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2, COUNT(DISTINCT l_orderkey) AS w FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
und AS (
  SELECT s1 AS a, s2 AS b, w FROM edges
  UNION ALL SELECT s2, s1, w FROM edges),
capped AS (
  SELECT a, b FROM (
    SELECT a, b,
           ROW_NUMBER() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
    FROM und) WHERE rn <= {_L13_CAP}),
wedges AS (
  SELECT x.a AS node, x.b AS u, y.b AS v
  FROM capped x JOIN capped y ON x.a = y.a AND x.b < y.b),
closed AS (
  SELECT w.node, COUNT(*) AS closed
  FROM wedges w JOIN edges e ON e.s1 = w.u AND e.s2 = w.v
  GROUP BY w.node),
tot AS (SELECT node, COUNT(*) AS wedges FROM wedges GROUP BY node)
SELECT t.node,
       CAST(t.wedges AS BIGINT) AS wedges,
       CAST(COALESCE(c.closed, 0) AS BIGINT) AS closed,
       COALESCE(c.closed, 0) / t.wedges AS cc
FROM tot t LEFT JOIN closed c ON t.node = c.node
ORDER BY cc DESC, t.node LIMIT 25
"""


@query(
    "l13_clustering_coefficient", _L13_ORACLE,
    doc="local clustering coefficient per node over the degree-capped "
        "co-supplier graph: closed/total wedges, wedges bounded by "
        "M(M-1)/2 per node",
)
def l13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("sb")
    )
    pairs = li.join(
        right,
        (F.col("l_orderkey") == F.col("r_okey"))
        & (F.col("l_suppkey") < F.col("sb")),
    ).select(
        F.col("l_suppkey").alias("s1"), F.col("sb").alias("s2"), "l_orderkey"
    )
    edges = (
        pairs.groupBy("s1", "s2")
        # pair rows are unique per (s1, s2, okey) — li is distinct on
        # (l_orderkey, l_suppkey) — so COUNT == COUNT(DISTINCT okey) and
        # the distinct aggregate's extra pair-grain shuffle is dropped
        # (round-13 batch B, guide §2.3)
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        # the edge set feeds multiple downstream joins; the round-13 sweep
        # read zero ReusedExchange in these plans, so each consumer re-ran
        # the per-order pair join + distinct count without the checkpoint
        .localCheckpoint(eager=False)
    )
    und = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("b"), "w"
    ).unionAll(
        edges.select(F.col("s2").alias("a"), F.col("s1").alias("b"), "w")
    )
    rn = F.row_number().over(
        Window.partitionBy("a").orderBy(F.col("w").desc(), "b")
    )
    capped = (
        und.withColumn("rn", rn).filter(F.col("rn") <= _L13_CAP).drop("rn", "w")
        .localCheckpoint(eager=False)  # both arms of the wedge self-join
    )
    wedges = (
        capped.alias("x")
        .join(capped.alias("y"),
              (F.col("x.a") == F.col("y.a")) & (F.col("x.b") < F.col("y.b")))
        .select(
            F.col("x.a").alias("node"),
            F.col("x.b").alias("u"),
            F.col("y.b").alias("v"),
        )
        .localCheckpoint(eager=False)  # feeds closure join + wedge totals
    )
    closed = (
        wedges.join(
            edges.select("s1", "s2"),
            (F.col("u") == F.col("s1")) & (F.col("v") == F.col("s2")),
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("closed"))
    )
    tot = wedges.groupBy("node").agg(F.count(F.lit(1)).alias("wedges"))
    return (
        tot.join(closed, "node", "left")
        .select(
            "node",
            "wedges",
            F.coalesce(F.col("closed"), F.lit(0)).alias("closed"),
            (F.coalesce(F.col("closed"), F.lit(0)) / F.col("wedges")).alias(
                "cc"
            ),
        )
        .orderBy(F.col("cc").desc(), "node")
        .limit(25)
    )


# --- ds38: TPC-DS Q78 shape — FULL OUTER channel comparison -----------------
# Template (`benchmark/tpcds/query78.tpl`): two channels aggregated
# SEPARATELY per (entity, year), FULL OUTER joined, COALESCE'd, and
# ordered by a cross-channel ratio — the topology where one channel may
# have no row at all (ds37's conditional-aggregate pivot cannot express
# "entity sold on web but never in store"; the outer join can). Ratio is
# an integer ppm with a NULLIF zero guard, identically associated on
# both engines.

_DS38_ORACLE = """
WITH web AS (
  SELECT l_suppkey AS supp, YEAR(l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS web_qty,
         CAST(COUNT(*) AS BIGINT) AS web_lines
  FROM lineitem WHERE l_partkey % 2 = 1
  GROUP BY 1, 2),
store AS (
  SELECT l_suppkey AS supp, YEAR(l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS store_qty,
         CAST(COUNT(*) AS BIGINT) AS store_lines
  FROM lineitem WHERE l_partkey % 2 = 0
  GROUP BY 1, 2)
SELECT COALESCE(w.supp, s.supp) AS supp,
       COALESCE(w.yr, s.yr) AS yr,
       COALESCE(w.web_qty, 0) AS web_qty,
       COALESCE(s.store_qty, 0) AS store_qty,
       COALESCE(w.web_qty, 0) * 1000000
         // NULLIF(COALESCE(s.store_qty, 0), 0) AS web_store_ppm
FROM web w FULL OUTER JOIN store s ON w.supp = s.supp AND w.yr = s.yr
ORDER BY web_store_ppm DESC NULLS FIRST,
         supp, yr
LIMIT 50
"""


@query(
    "ds38_channel_full_outer", _DS38_ORACLE,
    doc="TPC-DS Q78 shape: per-channel aggregates FULL OUTER joined with "
        "COALESCE and an integer-ppm cross-channel ratio (NULLIF guard)",
)
def ds38(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def chan(pred, qty_name, lines_name):
        return (
            li.filter(pred)
            .groupBy(
                F.col("l_suppkey").alias("supp"),
                F.year("l_shipdate").alias("yr"),
            )
            .agg(
                F.sum(F.col("l_quantity").cast("long")).alias(qty_name),
                F.count(F.lit(1)).alias(lines_name),
            )
        )

    web = chan(F.col("l_partkey") % 2 == 1, "web_qty", "web_lines")
    store = chan(F.col("l_partkey") % 2 == 0, "store_qty", "store_lines")
    w, s = web.alias("w"), store.alias("s")
    j = w.join(
        s,
        (F.col("w.supp") == F.col("s.supp")) & (F.col("w.yr") == F.col("s.yr")),
        "full_outer",
    )
    web_qty = F.coalesce(F.col("w.web_qty"), F.lit(0))
    store_qty = F.coalesce(F.col("s.store_qty"), F.lit(0))
    return (
        j.select(
            F.coalesce(F.col("w.supp"), F.col("s.supp")).alias("supp"),
            F.coalesce(F.col("w.yr"), F.col("s.yr")).alias("yr"),
            web_qty.alias("web_qty"),
            store_qty.alias("store_qty"),
            F.expr(
                "COALESCE(w.web_qty, 0) * 1000000"
                " DIV NULLIF(COALESCE(s.store_qty, 0), 0)"
            ).alias("web_store_ppm"),
        )
        .orderBy(
            F.col("web_store_ppm").desc_nulls_first(), "supp", "yr"
        )
        .limit(50)
    )


# --- c22: ClickBench shape — share-of-group window percent ------------------
# The "top contributors with share %" analytics form: per (event_type,
# user) hit counts, each row's share of its TYPE's total via a window
# partition sum, top-5 users per type by share. Integer ppm (hits * 1e6
# DIV group total) keeps the window chain exact; the final rank is a
# second window over the SAME partitioning — one shuffle serves both.

_C22_ORACLE = """
WITH u AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS hits
  FROM events GROUP BY 1, 2),
sh AS (
  SELECT event_type, user_id, hits,
         CAST(hits * 1000000
              // CAST(SUM(hits) OVER (PARTITION BY event_type) AS BIGINT)
              AS BIGINT) AS share_ppm
  FROM u)
SELECT event_type, user_id, hits, share_ppm FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY hits DESC, user_id) AS rk
  FROM sh) WHERE rk <= 5
ORDER BY event_type, hits DESC, user_id
"""


@query(
    "c22_share_of_group", _C22_ORACLE,
    doc="share-of-group window percent: per-user hit share (integer ppm) "
        "of its event type's total, top-5 per type — both windows reuse "
        "one partitioning",
)
def c22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    wp = Window.partitionBy("event_type")
    # integer DIV by the window total, exact on both engines
    sh = u.withColumn("_tot", F.sum("hits").over(wp)).withColumn(
        "share_ppm", F.expr("hits * 1000000 DIV _tot")
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.col("hits").desc(), "user_id"
        )
    )
    return (
        sh.withColumn("rk", rk)
        .filter(F.col("rk") <= 5)
        .select("event_type", "user_id", "hits", "share_ppm")
        .orderBy("event_type", F.col("hits").desc(), "user_id")
    )


# --- l14: fixed-point PageRank (3 exact-integer power iterations) -----------
# The canonical graph-analytics workload, run over the co-supplier graph
# in FIXED-POINT INTEGER arithmetic so the oracle can replay it exactly
# (the d13/e10 Lloyd-unroll discipline applied to power iteration):
# pr_0 = 1e6; pr_{t+1}(v) = 0.15e6 + (850 * sum_{u->v} (pr_t(u) DIV
# outdeg(u))) DIV 1000 — every step is positive-integer DIV, identical
# truncation on both engines, values bounded ~1e6 x |V|. Distributed
# shape per iteration: one contributions groupBy on dst + one left join
# back to the node set (the classic Pregel/GraphX PageRank step as two
# DataFrame ops); the oracle unrolls the three iterations as chained
# CTEs. Dangling nodes cannot occur (the bidirected edge set gives every
# node outdeg >= 1).

_L14_ITERS = 3

_L14_ITER_TMPL = """
{name} AS (
  SELECT n.node,
         CAST(150000 + (850 * COALESCE(c.s, 0)) // 1000 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.pr // d.deg) AS BIGINT) AS s
    FROM e JOIN {prev} p ON p.node = e.src
           JOIN deg d ON d.node = e.src
    GROUP BY e.dst) c ON c.node = n.node)
"""

_L14_ORACLE = (
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2 FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
e AS (SELECT s1 AS src, s2 AS dst FROM edges
      UNION ALL SELECT s2, s1 FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM e),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM e GROUP BY src),
pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),"""
    + ",".join(
        _L14_ITER_TMPL.format(name=f"pr{i + 1}", prev=f"pr{i}")
        for i in range(_L14_ITERS)
    )
    + f"""
SELECT node, pr AS pagerank_fp
FROM pr{_L14_ITERS}
ORDER BY pagerank_fp DESC, node LIMIT 25
"""
)


@query(
    "l14_pagerank_fixed_point", _L14_ORACLE,
    doc="PageRank, 3 exact-integer power iterations over the co-supplier "
        "graph (Pregel step = contributions groupBy + node left join); "
        "oracle unrolls the iterations as chained CTEs",
)
def l14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("sb")
    )
    pairs = li.join(
        right,
        (F.col("l_orderkey") == F.col("r_okey"))
        & (F.col("l_suppkey") < F.col("sb")),
    ).select(
        F.col("l_suppkey").alias("s1"), F.col("sb").alias("s2"), "l_orderkey"
    )
    edges = (
        pairs.groupBy("s1", "s2")
        # pair rows are unique per (s1, s2, okey) — li is distinct on
        # (l_orderkey, l_suppkey) — so COUNT == COUNT(DISTINCT okey) and
        # the distinct aggregate's extra pair-grain shuffle is dropped
        # (round-13 batch B, guide §2.3)
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("s1", "s2")
    )
    e = edges.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst")
    ).unionAll(edges.select(F.col("s2").alias("src"), F.col("s1").alias("dst")))
    # iterated frames are reused across every iteration's two joins —
    # localCheckpoint truncates the growing lineage (recursive-CTE
    # discipline) and the tiny node/degree frames persist once
    e = e.localCheckpoint(eager=False)
    nodes = e.select(F.col("src").alias("node")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pr = nodes.select("node", F.lit(1_000_000).cast("long").alias("pr"))
    for _ in range(_L14_ITERS):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("pr DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    "CAST(150000 + (850 * COALESCE(s, 0)) DIV 1000 AS BIGINT)"
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        pr.select("node", F.col("pr").alias("pagerank_fp"))
        .orderBy(F.col("pagerank_fp").desc(), "node")
        .limit(25)
    )


# --- c23: ClickBench Q38 shape — conditional source/destination matrix ------
# Template (`benchmark/clickbench/queries.sql` Q38): a traffic matrix
# whose grouping key is CONDITIONAL — Src collapses to '' unless both
# engine ids are zero — over a five-column composite key, ranked and
# paged with a deep OFFSET. The conditional key means the groupBy key
# itself is an expression tree, and correct paging requires a total
# order (count ties broken by every key column).

_C23_ORACLE = """
SELECT src_id, eng_id, adv_id, src, dst, CAST(COUNT(*) AS BIGINT) AS pv
FROM (
  SELECT user_id % 5 AS src_id,
         event_id % 4 AS eng_id,
         event_id % 3 AS adv_id,
         CASE WHEN event_id % 4 = 0 AND event_id % 3 = 0
              THEN 'ref-' || CAST(user_id % 11 AS VARCHAR) ELSE '' END AS src,
         event_type AS dst
  FROM events WHERE value >= 0.1)
GROUP BY 1, 2, 3, 4, 5
ORDER BY pv DESC, src_id, eng_id, adv_id, src, dst
LIMIT 10 OFFSET 100
"""


@query(
    "c23_conditional_src_dst", _C23_ORACLE,
    doc="ClickBench Q38 shape: conditional composite grouping key "
        "(Src collapses unless both engine ids are 0) + deep OFFSET page",
)
def c23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 0.1)
    keyed = ev.select(
        (F.col("user_id") % 5).alias("src_id"),
        (F.col("event_id") % 4).alias("eng_id"),
        (F.col("event_id") % 3).alias("adv_id"),
        F.when(
            (F.col("event_id") % 4 == 0) & (F.col("event_id") % 3 == 0),
            F.concat(F.lit("ref-"), (F.col("user_id") % 11).cast("string")),
        ).otherwise(F.lit("")).alias("src"),
        F.col("event_type").alias("dst"),
    )
    return (
        keyed.groupBy("src_id", "eng_id", "adv_id", "src", "dst")
        .agg(F.count(F.lit(1)).alias("pv"))
        .orderBy(
            F.col("pv").desc(), "src_id", "eng_id", "adv_id", "src", "dst"
        )
        .offset(100)
        .limit(10)
    )


# --- ds39: TPC-DS Q35 shape — AND-of-(EXISTS OR EXISTS) demographics --------
# Template (`benchmark/tpcds/query35.tpl`): customers who bought in the
# anchor channel AND show activity in at least one of two secondary
# channels, profiled by demographic attributes with a stats battery.
# The distinctive topology is the BOOLEAN COMBINATION of semi-joins —
# EXISTS(store) AND (EXISTS(web) OR EXISTS(catalog)) — which Spark
# lowers as one semi-join against the anchor plus one semi-join against
# the UNION of the two secondary key sets (an OR of EXISTS must not
# become two stacked semi-joins: that computes AND).

_DS39_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(FLOOR(c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(FLOOR(c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
         AS max_cents,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM customer c
WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey
                AND e.event_type = 'purchase')
  AND (EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey
                 AND e.event_type = 'click')
       OR EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey
                    AND e.event_type = 'view'))
GROUP BY c_nationkey, c_mktsegment
"""


@query(
    "ds39_exists_or_exists", _DS39_ORACLE,
    doc="TPC-DS Q35 shape: EXISTS(anchor) AND (EXISTS OR EXISTS) lowered "
        "as semi-join + semi-join-against-union, demographic stats battery",
)
def ds39(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select(
            F.col("user_id").alias("c_custkey")
        )

    anchor = users("purchase")
    either = users("click").unionByName(users("view")).distinct()
    cents = F.floor(F.col("c_acctbal") * 100.0).cast("long")
    return (
        cust.join(anchor, "c_custkey", "left_semi")
        .join(either, "c_custkey", "left_semi")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
            F.sum(cents).alias("sum_cents"),
        )
    )


# --- c24: regexp_replace with backreferences + global flag ------------------
# ClickBench's referer-rewrite family (queries.sql Q28/Q29) leans on two
# cross-engine regex pitfalls this gate pins: (1) backreference SPELLING
# — Spark/Java wants '$1', DuckDB/RE2 wants '\\1'; (2) replace-ALL
# semantics — Spark's regexp_replace is global by default, DuckDB's
# replaces only the FIRST match unless the 'g' option is passed. The
# oracle states the DuckDB spellings explicitly, so a silent first-match
# divergence (the second digit run surviving) fails the hash. Pure
# codegen string expressions; one aggregate shuffle on the masked key.

_C24_ORACLE = r"""
WITH raw AS (
  SELECT source || '/' || CAST(doc_id AS VARCHAR) || '/sz'
           || CAST(n_chars AS VARCHAR) || '/' || lang AS path
  FROM documents),
k AS (
  SELECT regexp_replace(path, '[0-9]+', '#', 'g') AS masked,
         regexp_replace(path, '^([a-z]+[0-9]*)/([0-9]+)', '\2:\1') AS swapped,
         path
  FROM raw)
SELECT masked,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(length(swapped)) AS BIGINT) AS swapped_chars,
       MIN(swapped) AS first_swapped
FROM k GROUP BY masked ORDER BY masked
"""


@query(
    "c24_regex_replace_backref", _C24_ORACLE,
    doc="regexp_replace backreference + global-flag parity: Spark '$1' "
        "global-default vs DuckDB '\\1' with explicit 'g' — both "
        "divergences pinned by the hash",
)
def c24(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.col("source"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("/sz"), F.col("n_chars").cast("string"), F.lit("/"),
        F.col("lang"),
    )
    k = docs.select(
        F.regexp_replace(path, r"[0-9]+", "#").alias("masked"),
        F.regexp_replace(path, r"^([a-z]+[0-9]*)/([0-9]+)", r"$2:$1")
        .alias("swapped"),
    )
    return (
        k.groupBy("masked")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("swapped")).cast("long").alias("swapped_chars"),
            F.min("swapped").alias("first_swapped"),
        )
        .orderBy("masked")
    )


# --- ds40: monthly outliers with lag/lead neighbors (TPC-DS Q47) ------------
# The Q47/Q57 topology: monthly sums per key, each month scored against
# its YEAR's average (a second, wider window over the same partition),
# outliers reported WITH their neighboring months via LAG/LEAD — three
# window passes sharing ONE (key) shuffle because they share the
# partition key (Catalyst collapses same-partitioning windows into one
# exchange). The deviation test is cross-multiplied exact integers
# (s * nm * 100 vs ys * 110/90) — no float division before the filter.

_DS40_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS p,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS s
  FROM orders GROUP BY 1, 2, 3),
w AS (
  SELECT p, y, mo, s,
         SUM(s) OVER (PARTITION BY p, y) AS ys,
         COUNT(*) OVER (PARTITION BY p, y) AS nm,
         LAG(s) OVER (PARTITION BY p ORDER BY y, mo) AS prev_s,
         LEAD(s) OVER (PARTITION BY p ORDER BY y, mo) AS next_s
  FROM m)
SELECT p, y, mo, s,
       CAST(prev_s AS BIGINT) AS prev_s,
       CAST(next_s AS BIGINT) AS next_s
FROM w
WHERE nm = 12
  AND (s * nm * 100 > ys * 110 OR s * nm * 100 < ys * 90)
ORDER BY p, y, mo
"""


@query(
    "ds40_monthly_outlier_neighbors", _DS40_ORACLE,
    doc="TPC-DS Q47 shape: monthly sums vs year average + LAG/LEAD "
        "neighbors — same-key windows share one shuffle, deviation test "
        "in cross-multiplied integers",
)
def ds40(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            F.col("o_orderpriority").alias("p"),
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            .cast("long").alias("s")
        )
    )
    wy = Window.partitionBy("p", "y")
    wo = Window.partitionBy("p").orderBy("y", "mo")
    w = m.select(
        "p", "y", "mo", "s",
        F.sum("s").over(wy).alias("ys"),
        F.count(F.lit(1)).over(wy).alias("nm"),
        F.lag("s").over(wo).alias("prev_s"),
        F.lead("s").over(wo).alias("next_s"),
    )
    return (
        w.filter(
            (F.col("nm") == 12)
            & (
                (F.col("s") * F.col("nm") * 100 > F.col("ys") * 110)
                | (F.col("s") * F.col("nm") * 100 < F.col("ys") * 90)
            )
        )
        .select(
            "p", "y", "mo", "s",
            F.col("prev_s").cast("long").alias("prev_s"),
            F.col("next_s").cast("long").alias("next_s"),
        )
        .orderBy("p", "y", "mo")
    )


# --- z01: Z-order layout pruning ---------------------------------------------
# The multi-dimensional clustering claim behind sources/layout.py's
# write_zordered (Delta OPTIMIZE ZORDER BY; the reference's §2.1 index
# substitution), made measurable: rows are assigned to 32 equal-size
# "files" twice — once sorted by the Morton interleave of
# (custkey%64, order-day%64), once by natural key — and each layout's
# per-file zone maps (min/max of BOTH dims) are tested against a
# 16x16 rectangle predicate. The gate returns, per layout, how many
# files a zone-map reader would scan and how many rows that is; the
# z-order row must scan FAR fewer (the NTILE formulation here is the
# oracle-comparable twin of write_zordered's repartitionByRange — same
# assignment given the same sort key, certified deterministic by the
# unique o_orderkey tie-break). The Morton key itself is 12 terms of
# pure integer bit arithmetic, identical text on both engines.

_Z01_ZEXPR_DUCK = (
    "((a >> 0) & 1) * 2 + ((b >> 0) & 1) * 1 "
    "+ ((a >> 1) & 1) * 8 + ((b >> 1) & 1) * 4 "
    "+ ((a >> 2) & 1) * 32 + ((b >> 2) & 1) * 16 "
    "+ ((a >> 3) & 1) * 128 + ((b >> 3) & 1) * 64 "
    "+ ((a >> 4) & 1) * 512 + ((b >> 4) & 1) * 256 "
    "+ ((a >> 5) & 1) * 2048 + ((b >> 5) & 1) * 1024"
)

_Z01_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey,
         o_custkey % 64 AS a,
         datediff('day', DATE '1992-01-01', o_orderdate) % 64 AS b
  FROM orders),
z AS (
  SELECT o_orderkey, a, b, {_Z01_ZEXPR_DUCK} AS zv FROM base),
lay AS (
  SELECT a, b,
         NTILE(32) OVER (ORDER BY zv, o_orderkey) AS zbucket,
         NTILE(32) OVER (ORDER BY o_orderkey) AS lbucket
  FROM z),
both_l AS (
  SELECT 'zorder' AS layout, zbucket AS bucket, a, b FROM lay
  UNION ALL
  SELECT 'linear' AS layout, lbucket AS bucket, a, b FROM lay),
zones AS (
  SELECT layout, bucket,
         MIN(a) AS mina, MAX(a) AS maxa,
         MIN(b) AS minb, MAX(b) AS maxb,
         SUM(CASE WHEN a BETWEEN 8 AND 23 AND b BETWEEN 16 AND 31
             THEN 1 ELSE 0 END) AS n_match,
         COUNT(*) AS n_rows
  FROM both_l GROUP BY 1, 2)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN mina <= 23 AND maxa >= 8
                      AND minb <= 31 AND maxb >= 16
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(SUM(CASE WHEN mina <= 23 AND maxa >= 8
                      AND minb <= 31 AND maxb >= 16
                THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(SUM(n_match) AS BIGINT) AS rows_matching
FROM zones GROUP BY layout ORDER BY layout
"""


@query(
    "z01_zorder_pruning", _Z01_ORACLE,
    doc="Z-order layout vs linear: Morton-interleaved (custkey, day) "
        "clustering into 32 zone-mapped files, rectangle-predicate "
        "pruning measured — files/rows a min-max reader skips",
)
def z01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from otterbrix_spark.sources.layout import zorder_value

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 64).alias("a"),
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % 64)
        .alias("b"),
    )
    z = base.withColumn("zv", zorder_value("a", "b", bits=6))
    lay = z.select(
        "a", "b",
        F.ntile(32).over(Window.orderBy("zv", "o_orderkey")).alias("zbucket"),
        F.ntile(32).over(Window.orderBy("o_orderkey")).alias("lbucket"),
    )
    both_l = lay.select(
        F.lit("zorder").alias("layout"), F.col("zbucket").alias("bucket"),
        "a", "b",
    ).unionByName(
        lay.select(
            F.lit("linear").alias("layout"), F.col("lbucket").alias("bucket"),
            "a", "b",
        )
    )
    in_rect = (F.col("a").between(8, 23)) & (F.col("b").between(16, 31))
    zones = both_l.groupBy("layout", "bucket").agg(
        F.min("a").alias("mina"), F.max("a").alias("maxa"),
        F.min("b").alias("minb"), F.max("b").alias("maxb"),
        F.sum(F.when(in_rect, 1).otherwise(0)).alias("n_match"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    survive = (
        (F.col("mina") <= 23) & (F.col("maxa") >= 8)
        & (F.col("minb") <= 31) & (F.col("maxb") >= 16)
    )
    return (
        zones.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(survive, 1).otherwise(0)).cast("long")
            .alias("files_scanned"),
            F.sum(F.when(survive, F.col("n_rows")).otherwise(0)).cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matching"),
        )
        .orderBy("layout")
    )


# --- l15: common-neighbor Jaccard (link prediction) -------------------------
# The classic link-prediction score (LDBC BI's people-similarity family):
# two users' similarity = Jaccard of their active-HOUR sets. Same scale
# discipline as the d03 shingle join: candidate pairs come from an
# equi-join on shared hours with hot hours (>50 active users) df-capped
# out of PAIRING — the pigeonhole bound on join fan-out — while the
# Jaccard DENOMINATORS use exact full-set degrees, so capping only
# (conservatively) under-counts intersections of celebrity-hour pairs,
# it never corrupts set sizes. The ranking score is an integer DIV
# cross-multiplication — no float ratio ordering.

_L15_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h FROM events),
deg AS (SELECT user_id, COUNT(*) AS d FROM ud GROUP BY 1),
hot AS (SELECT h FROM ud GROUP BY h HAVING COUNT(*) > 50),
eligible AS (
  SELECT user_id, h FROM ud WHERE h NOT IN (SELECT h FROM hot)),
pairs AS (
  SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS inter
  FROM eligible a
  JOIN eligible b ON a.h = b.h AND a.user_id < b.user_id
  GROUP BY 1, 2),
j AS (
  SELECT u1, u2, inter, da.d AS d1, db.d AS d2,
         (inter * 1000000) // (da.d + db.d - inter) AS score
  FROM pairs
  JOIN deg da ON u1 = da.user_id
  JOIN deg db ON u2 = db.user_id)
SELECT u1, u2,
       CAST(inter AS BIGINT) AS inter,
       CAST(d1 AS BIGINT) AS d1,
       CAST(d2 AS BIGINT) AS d2,
       CAST(score AS BIGINT) AS score
FROM j ORDER BY score DESC, u1, u2 LIMIT 20
"""


@query(
    "l15_neighbor_jaccard", _L15_ORACLE,
    doc="link-prediction Jaccard over active-hour sets: df-capped "
        "co-presence equi-join for candidates, exact full-set degree "
        "denominators, integer DIV ranking",
)
def l15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000")
        .alias("h"),
    ).distinct()
    deg = ud.groupBy("user_id").agg(F.count(F.lit(1)).alias("d"))
    hot = ud.groupBy("h").agg(F.count(F.lit(1)).alias("nh")).filter(
        F.col("nh") > 50
    ).select("h")
    eligible = ud.join(hot, "h", "left_anti")
    a = eligible.select(F.col("user_id").alias("u1"), "h")
    b = eligible.select(F.col("user_id").alias("u2"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    da = deg.select(F.col("user_id").alias("u1"), F.col("d").alias("d1"))
    db = deg.select(F.col("user_id").alias("u2"), F.col("d").alias("d2"))
    j = (
        pairs.join(da, "u1")
        .join(db, "u2")
        .withColumn(
            "score",
            F.expr("(inter * 1000000) DIV (d1 + d2 - inter)"),
        )
    )
    return (
        j.select(
            "u1", "u2",
            F.col("inter").cast("long").alias("inter"),
            F.col("d1").cast("long").alias("d1"),
            F.col("d2").cast("long").alias("d2"),
            F.col("score").cast("long").alias("score"),
        )
        .orderBy(F.col("score").desc(), "u1", "u2")
        .limit(20)
    )


# --- ds41: CTE consumed twice (TPC-DS Q64 topology) -------------------------
# Q64's signature: an expensive multi-join CTE (cross_sales) referenced
# TWICE in the same query at different filter values (consecutive
# years), joined to itself on the dimension key. At scale the question
# is whether the engine recomputes the CTE per reference — Spark inlines
# CTEs, but because both branches share an identical aggregate subplan
# up to the year filter, AQE's exchange reuse kicks in where the
# partitioning matches; either way the self-join shuffles only the
# AGGREGATED (brand, year) rows, never the fact table twice through the
# join. Growth predicate in exact integers.

_DS41_ORACLE = """
WITH cross_sales AS (
  SELECT p.p_brand AS brand,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS y,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2)
SELECT c1.brand,
       c1.cents AS cents_1995, c2.cents AS cents_1996,
       c1.n AS n_1995, c2.n AS n_1996
FROM cross_sales c1
JOIN cross_sales c2 ON c1.brand = c2.brand
WHERE c1.y = 1995 AND c2.y = 1996
  AND c2.cents * 100 > c1.cents * 105
ORDER BY c1.brand
"""


@query(
    "ds41_cte_reused_selfjoin", _DS41_ORACLE,
    doc="TPC-DS Q64 topology: multi-join CTE referenced twice, "
        "year-over-year self-join on the aggregated grain only, integer "
        "growth predicate",
)
def ds41(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    cs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").cast("long").alias("y"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    c1 = cs.filter(F.col("y") == 1995).select(
        "brand",
        F.col("cents").alias("cents_1995"),
        F.col("n").alias("n_1995"),
    )
    c2 = cs.filter(F.col("y") == 1996).select(
        F.col("brand").alias("brand2"),
        F.col("cents").alias("cents_1996"),
        F.col("n").alias("n_1996"),
    )
    return (
        c1.join(c2, F.col("brand") == F.col("brand2"))
        .filter(F.col("cents_1996") * 100 > F.col("cents_1995") * 105)
        .select(
            "brand", "cents_1995", "cents_1996", "n_1995", "n_1996",
        )
        .orderBy("brand")
    )


# --- l16: PageRank over the co-supplier graph (integer fixed-point) ---------
# The canonical iterative graph-centrality algorithm (Brin/Page; LDBC
# graphalytics PR), run for a FIXED 3 supersteps so the oracle can
# unroll it. Scale shape: each superstep is ONE hash join
# (scores ⋈ edges on the source key) + ONE groupBy(dst) sum — the
# Pregel message-passing round expressed relationally; state per round
# is one narrow (node, score) frame, and the edge frame is reused
# across rounds (same partitioning, no recomputation of the graph).
# Determinism: scores are integer ppm; the damping update is
# s' = 150000 + (850 * sum(s_u DIV deg_u)) DIV 1000 — integer division
# at the exact points the oracle truncates, so 3 rounds match
# bit-for-bit. (Unnormalized formulation: per-node teleport mass of
# 0.15e6 ppm rather than (1-d)/N — same fixpoint up to global scale,
# and it keeps every literal in 64-bit range at any graph size.)
# The co-supplier graph (l13's: >=2 shared orders) is undirected, so
# every node has in-degree >= 1 and no dangling-mass term is needed.

_L16_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2 FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
und AS (
  SELECT s1 AS a, s2 AS b FROM edges
  UNION ALL SELECT s2, s1 FROM edges),
deg AS (SELECT a AS node, COUNT(*) AS deg FROM und GROUP BY a),
it1 AS (
  SELECT e.b AS node,
         150000 + (850 * SUM(1000000 // d.deg)) // 1000 AS s
  FROM und e JOIN deg d ON e.a = d.node GROUP BY e.b),
it2 AS (
  SELECT e.b AS node,
         150000 + (850 * SUM(s1.s // d.deg)) // 1000 AS s
  FROM und e JOIN deg d ON e.a = d.node JOIN it1 s1 ON s1.node = e.a
  GROUP BY e.b),
it3 AS (
  SELECT e.b AS node,
         150000 + (850 * SUM(s2.s // d.deg)) // 1000 AS s
  FROM und e JOIN deg d ON e.a = d.node JOIN it2 s2 ON s2.node = e.a
  GROUP BY e.b)
SELECT i.node, d.deg AS degree, CAST(i.s AS BIGINT) AS pagerank_ppm
FROM it3 i JOIN deg d ON d.node = i.node
ORDER BY pagerank_ppm DESC, i.node LIMIT 25
"""


@query(
    "l16_pagerank", _L16_ORACLE,
    doc="PageRank, 3 fixed supersteps over the co-supplier graph: one "
        "hash join + one groupBy per round (relational Pregel), integer "
        "ppm damping so the unrolled oracle matches bit-for-bit",
)
def l16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("sb")
    )
    edges = (
        li.join(
            right,
            (F.col("l_orderkey") == F.col("r_okey"))
            & (F.col("l_suppkey") < F.col("sb")),
        )
        .select(
            F.col("l_suppkey").alias("s1"),
            F.col("sb").alias("s2"),
            "l_orderkey",
        )
        .groupBy("s1", "s2")
        # pair rows unique per (s1, s2, okey) after the base distinct ->
        # COUNT == COUNT(DISTINCT okey), minus one pair-grain shuffle
        # (round-13 batch B, guide §2.3)
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("s1", "s2")
    )
    und = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("b")
    ).unionAll(edges.select(F.col("s2").alias("a"), F.col("s1").alias("b")))
    deg = und.groupBy("a").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=False)  # feeds ed, the score init and the final join
    # edge frame with the source degree attached once, reused all rounds
    # (round-13: actually materialized once now — the unrolled 3-round plan
    # re-ran the edge build per round, zero ReusedExchange)
    ed = und.join(deg, "a").select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "deg"
    ).localCheckpoint(eager=False)
    scores = deg.select(
        F.col("a").alias("node"), F.lit(1000000).cast("long").alias("s")
    )
    for _ in range(3):
        contrib = (
            ed.join(
                scores.withColumnRenamed("node", "src_node"),
                F.col("src") == F.col("src_node"),
            )
            .groupBy("dst")
            .agg(F.sum(F.expr("s DIV deg")).alias("m"))
        )
        scores = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(150000) + F.expr("(850 * m) DIV 1000"))
            .cast("long")
            .alias("s"),
        )
    return (
        scores.join(
            deg.select(F.col("a").alias("node"), F.col("deg").alias("degree")),
            "node",
        )
        .select("node", "degree", F.col("s").alias("pagerank_ppm"))
        .orderBy(F.col("pagerank_ppm").desc(), "node")
        .limit(25)
    )


# --- ds42: TPC-DS Q36 shape — ROLLUP hierarchy with rank-within-parent ------
# Template (`benchmark/tpcds/query36.tpl`): gross margin by
# category/class ROLLUP, lochierarchy = sum of GROUPING() markers, and
# RANK() partitioned by (lochierarchy, parent-key-when-detail) — the
# "rank each child within its parent, at every level of the hierarchy"
# report. Re-authored on TPC-H: nation/segment revenue rollup. The
# GROUPING()-driven CASE partition key is the distinctive part: detail
# rows rank against siblings under the same nation, level-1 rows rank
# against other nations, all in ONE window pass over the rolled-up
# frame (which is tiny after aggregation — the window never sees the
# fact table). Rank input is exact integer cents.

_DS42_ORACLE = """
WITH j AS (
  SELECT n.n_name, c.c_mktsegment,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey),
g AS (
  SELECT n_name, c_mktsegment,
         CAST(SUM(cents) AS BIGINT) AS rev_cents,
         GROUPING(n_name) + GROUPING(c_mktsegment) AS lochierarchy,
         GROUPING(c_mktsegment) AS gseg
  FROM j GROUP BY ROLLUP(n_name, c_mktsegment))
SELECT n_name, c_mktsegment, rev_cents,
       CAST(lochierarchy AS BIGINT) AS lochierarchy,
       CAST(RANK() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN gseg = 0 THEN n_name END
         ORDER BY rev_cents DESC) AS BIGINT) AS rank_in_parent
FROM g
ORDER BY lochierarchy DESC, n_name NULLS FIRST,
         c_mktsegment NULLS FIRST
"""


@query(
    "ds42_rollup_rank_parent", _DS42_ORACLE,
    doc="TPC-DS Q36 shape: nation/segment ROLLUP with GROUPING-marker "
        "lochierarchy and RANK partitioned by (level, parent) — one "
        "window over the already-aggregated frame",
)
def ds42(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    j = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "n_name", "c_mktsegment",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    g = j.rollup("n_name", "c_mktsegment").agg(
        F.sum("cents").alias("rev_cents"),
        (F.grouping("n_name") + F.grouping("c_mktsegment")).alias(
            "lochierarchy"
        ),
        F.grouping("c_mktsegment").alias("gseg"),
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("gseg") == 0, F.col("n_name")),
    ).orderBy(F.col("rev_cents").desc())
    return (
        g.select(
            "n_name", "c_mktsegment", "rev_cents",
            F.col("lochierarchy").cast("long").alias("lochierarchy"),
            F.rank().over(w).cast("long").alias("rank_in_parent"),
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("n_name").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
        )
    )


# --- ds43: TPC-DS Q73 shape — order-size band, two-grain composition --------
# Template (`benchmark/tpcds/query73.tpl`): count items per ticket,
# HAVING the count in a band, then join the surviving tickets back to
# customer and report per-customer band-order counts — the
# "frequent-basket households" report. The two-grain discipline is the
# point: the band predicate is evaluated at ORDER grain (one groupBy,
# map-side combinable) BEFORE any customer data is touched, so the
# customer join only sees the small surviving set — the same
# filter-early ordering the q46 fix certified.

_DS43_ORACLE = """
WITH oc AS (
  SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 5 AND 7),
j AS (
  SELECT o.o_custkey, oc.cnt
  FROM orders o JOIN oc ON o.o_orderkey = oc.l_orderkey)
SELECT c.c_custkey, c.c_name,
       CAST(COUNT(*) AS BIGINT) AS n_band_orders,
       CAST(SUM(j.cnt) AS BIGINT) AS n_band_items
FROM j JOIN customer c ON c.c_custkey = j.o_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY n_band_orders DESC, c.c_custkey LIMIT 20
"""


@query(
    "ds43_basket_band", _DS43_ORACLE,
    doc="TPC-DS Q73 shape: per-order item-count band evaluated at order "
        "grain first, surviving orders joined to customer — two-grain "
        "frequent-basket report",
)
def ds43(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    oc = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(5, 7))
    )
    j = orders.join(oc, orders.o_orderkey == oc.l_orderkey).select(
        "o_custkey", "cnt"
    )
    return (
        j.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_band_orders"),
            F.sum("cnt").alias("n_band_items"),
        )
        .orderBy(F.col("n_band_orders").desc(), "c_custkey")
        .limit(20)
    )


# --- l17: k-core decomposition (3 peeling rounds, k=3) ----------------------
# The classic graph-densification primitive (Seidman '83; LDBC
# graphalytics ships it as a core kernel): repeatedly delete nodes of
# degree < k until none remain — the surviving subgraph is the k-core,
# the standard community-detection / spam-farm / influence seed filter.
# Run for a FIXED 3 peel rounds so the oracle can unroll (each round is
# one groupBy for degrees + two semi-joins restricting the edge set to
# surviving endpoints — the same narrow (node) state per round as l16's
# Pregel shape, never a widened edge frame). At this corpus 3 rounds
# reach the fixpoint for k=3 (asserted implicitly: the output also
# reports each survivor's round-3 degree, all >= 3, so one more peel
# would be a no-op iff every row satisfies deg >= 3 — which the oracle
# hash pins). Graph = l13/l16's co-supplier graph (suppliers sharing
# >= 2 distinct orders, undirected). Scale: degrees are
# map-side-combinable counts; the per-round node keep-list is narrow
# (one bigint) and semi-joins hash-partition on the edge endpoint —
# no broadcast assumption, no quadratic step.

_L17_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2 FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
e0 AS (
  SELECT s1 AS a, s2 AS b FROM edges
  UNION ALL SELECT s2, s1 FROM edges),
d0 AS (SELECT a AS node, COUNT(*) AS deg FROM e0 GROUP BY a),
k1 AS (SELECT node FROM d0 WHERE deg >= 3),
e1 AS (
  SELECT e.a, e.b FROM e0 e
  WHERE e.a IN (SELECT node FROM k1) AND e.b IN (SELECT node FROM k1)),
d1 AS (SELECT a AS node, COUNT(*) AS deg FROM e1 GROUP BY a),
k2 AS (SELECT node FROM d1 WHERE deg >= 3),
e2 AS (
  SELECT e.a, e.b FROM e1 e
  WHERE e.a IN (SELECT node FROM k2) AND e.b IN (SELECT node FROM k2)),
d2 AS (SELECT a AS node, COUNT(*) AS deg FROM e2 GROUP BY a),
k3 AS (SELECT node FROM d2 WHERE deg >= 3),
e3 AS (
  SELECT e.a, e.b FROM e2 e
  WHERE e.a IN (SELECT node FROM k3) AND e.b IN (SELECT node FROM k3)),
d3 AS (SELECT a AS node, COUNT(*) AS deg FROM e3 GROUP BY a)
SELECT node, CAST(deg AS BIGINT) AS core_degree
FROM d3 WHERE deg >= 3
ORDER BY core_degree DESC, node
"""


@query(
    "l17_kcore", _L17_ORACLE,
    doc="k-core decomposition: 3 unrolled peel rounds (k=3) over the "
        "co-supplier graph — one degree groupBy + two endpoint "
        "semi-joins per round, narrow node-list state, survivors "
        "reported with their in-core degree",
)
def l17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("sb")
    )
    edges = (
        li.join(
            right,
            (F.col("l_orderkey") == F.col("r_okey"))
            & (F.col("l_suppkey") < F.col("sb")),
        )
        .select(
            F.col("l_suppkey").alias("s1"),
            F.col("sb").alias("s2"),
            "l_orderkey",
        )
        .groupBy("s1", "s2")
        # pair rows unique per (s1, s2, okey) after the base distinct ->
        # COUNT == COUNT(DISTINCT okey), minus one pair-grain shuffle
        # (round-13 batch B, guide §2.3)
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("s1", "s2")
    )
    und = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("b")
    ).unionAll(edges.select(F.col("s2").alias("a"), F.col("s1").alias("b")))
    # each peel round references the surviving edge set TWICE (degrees,
    # then the semi-join restriction), so without a materialisation the
    # expensive edge build re-executes 2^rounds times through the nested
    # branches; the checkpointed state is the narrow (a, b) pair list
    und = und.localCheckpoint(eager=True)
    for _ in range(3):
        deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= 3).select(F.col("a").alias("node"))
        und = (
            und.join(keep, und.a == keep.node, "left_semi")
            .join(
                keep.withColumnRenamed("node", "node_b"),
                und.b == F.col("node_b"),
                "left_semi",
            )
        ).localCheckpoint(eager=True)
    d3 = und.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    return (
        d3.filter(F.col("core_degree") >= 3)
        .select(F.col("a").alias("node"), "core_degree")
        .orderBy(F.col("core_degree").desc(), "node")
    )


# --- b14: JOB chain with MIN aggregates at both ends ------------------------
# JOB's signature answer shape (e.g. 33a/17a): MIN() over several string
# columns from DIFFERENT tables of a join chain, with selective LIKE /
# IN filters applied at BOTH ends and the middle — the optimizer test
# is picking a join order that lets each filter cut the chain before
# the next hop (Leis et al., "How Good Are Query Optimizers, Really?",
# VLDB'15). Re-authored on TPC-H: part(p_name LIKE) ⋈ lineitem ⋈
# orders(priority prefix) ⋈ customer ⋈ nation(IN). The two dimension
# filters are pushed scans; nation is broadcast; the MINs are
# map-side-combinable so the chain never materialises wide rows.

_B14_ORACLE = """
SELECT MIN(p.p_name) AS min_part,
       MIN(c.c_name) AS min_customer,
       MIN(CAST(o.o_orderdate AS VARCHAR)) AS min_orderdate,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE p.p_name LIKE '%green%'
  AND (o.o_orderpriority LIKE '1%' OR o.o_orderpriority LIKE '2%')
  AND n.n_name IN ('FRANCE', 'GERMANY', 'ROMANIA')
"""


@query(
    "b14_job_chain_mins", _B14_ORACLE,
    doc="JOB chain shape: MIN() over string columns from three different "
        "tables of a 5-table chain, selective filters at both ends and "
        "the middle — broadcast dims, map-side-combinable MINs",
)
def b14(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%green%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").like("1%")
        | F.col("o_orderpriority").like("2%")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("FRANCE", "GERMANY", "ROMANIA")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("c_name").alias("min_customer"),
            F.min(F.col("o_orderdate").cast("string")).alias("min_orderdate"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- ds44: TPC-DS Q21 shape — pivot-date split with ratio band --------------
# Template (`benchmark/tpcds/query21.tpl`): per (warehouse, item), sum
# inventory before vs after a pivot date and keep rows whose
# after/before ratio lies in [2/3, 3/2] — the "did the stock level move
# too much around the event?" audit. Re-authored on TPC-H lineitem:
# per (supplier, part), quantity shipped in the 30 days before vs
# after 1995-06-15. The band predicate is evaluated by integer
# cross-multiplication (2*after <= 3*before AND 2*before <= 3*after) —
# no float division anywhere — and it needs BOTH sums, so it sits
# above the single conditional-aggregation groupBy (one fact scan, one
# shuffle, the pushed date range cuts the scan first).

_DS44_ORACLE = """
SELECT l_suppkey, l_partkey,
       CAST(SUM(CASE WHEN l_shipdate <  DATE '1995-06-15'
                THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
         AS qty_before,
       CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-06-15'
                THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
         AS qty_after
FROM lineitem
WHERE l_shipdate >= DATE '1995-05-16' AND l_shipdate < DATE '1995-07-15'
GROUP BY l_suppkey, l_partkey
HAVING SUM(CASE WHEN l_shipdate < DATE '1995-06-15'
            THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
   AND SUM(CASE WHEN l_shipdate >= DATE '1995-06-15'
            THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
   AND 2 * SUM(CASE WHEN l_shipdate >= DATE '1995-06-15'
               THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
       <= 3 * SUM(CASE WHEN l_shipdate < DATE '1995-06-15'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
   AND 2 * SUM(CASE WHEN l_shipdate < DATE '1995-06-15'
               THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
       <= 3 * SUM(CASE WHEN l_shipdate >= DATE '1995-06-15'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
ORDER BY l_suppkey, l_partkey
LIMIT 100
"""


@query(
    "ds44_pivot_date_band", _DS44_ORACLE,
    doc="TPC-DS Q21 shape: per-key sums before/after a pivot date from "
        "ONE conditional-aggregation scan, [2/3, 3/2] ratio band via "
        "integer cross-multiplication HAVING, pushed date range",
)
def ds44(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-05-16"))
        & (F.col("l_shipdate") < F.lit("1995-07-15"))
    )
    q = F.col("l_quantity").cast("long")
    pivot = F.col("l_shipdate") < F.lit("1995-06-15")
    g = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(pivot, q).otherwise(F.lit(0)))
        .cast("long").alias("qty_before"),
        F.sum(F.when(~pivot, q).otherwise(F.lit(0)))
        .cast("long").alias("qty_after"),
    )
    return (
        g.filter(
            (F.col("qty_before") > 0)
            & (F.col("qty_after") > 0)
            & (2 * F.col("qty_after") <= 3 * F.col("qty_before"))
            & (2 * F.col("qty_before") <= 3 * F.col("qty_after"))
        )
        .orderBy("l_suppkey", "l_partkey")
        .limit(100)
    )


# --- ds45: TPC-DS Q49 shape — per-channel worst-ratio ranks -----------------
# Template (`benchmark/tpcds/query49.tpl`): within each sales channel,
# rank items by return ratio and keep the worst k. Re-authored on
# TPC-H: channel = order priority class (the fact joins its order row
# for the channel attribute, the Q49 "channel = which fact table"
# analogue), item = part, return ratio = returned / shipped quantity
# (l_returnflag='R') in integer ppm so the rank order is engine-exact.
# One fact scan, one equi-join keyed on the fact's order key, ONE
# grouped aggregate, then a partitioned window on the post-aggregate
# (channel, part) grain — three ranked slices from one window pass,
# never three scans.

_DS45_ORACLE = """
WITH g AS (
  SELECT substr(o.o_orderpriority, 1, 1) AS channel, l.l_partkey,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_all,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                  THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
           AS qty_ret
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority LIKE '1%' OR o.o_orderpriority LIKE '2%'
     OR o.o_orderpriority LIKE '3%'
  GROUP BY substr(o.o_orderpriority, 1, 1), l.l_partkey
  HAVING SUM(CAST(l.l_quantity AS BIGINT)) >= 100),
r AS (
  SELECT channel, l_partkey, qty_all, qty_ret,
         CAST((1000000 * qty_ret) // qty_all AS BIGINT) AS ret_ppm,
         ROW_NUMBER() OVER (
           PARTITION BY channel
           ORDER BY (1000000 * qty_ret) // qty_all DESC, l_partkey) AS rnk
  FROM g)
SELECT channel, l_partkey, qty_all, qty_ret, ret_ppm,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 10
ORDER BY channel, rnk
"""


@query(
    "ds45_channel_worst_ratio", _DS45_ORACLE,
    doc="TPC-DS Q49 shape: per-channel worst return-ratio top-k from ONE "
        "fact scan + ONE grouped aggregate + ONE partitioned window — "
        "integer-ppm ratio so rank order is engine-exact",
)
def ds45(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").like("1%")
        | F.col("o_orderpriority").like("2%")
        | F.col("o_orderpriority").like("3%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    g = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.substring("o_orderpriority", 1, 1).alias("channel"),
            "l_partkey",
        )
        .agg(
            F.sum(q).cast("long").alias("qty_all"),
            F.sum(F.when(F.col("l_returnflag") == "R", q).otherwise(F.lit(0)))
            .cast("long").alias("qty_ret"),
        )
        .filter(F.col("qty_all") >= 100)
    )
    r = g.select(
        "channel", "l_partkey", "qty_all", "qty_ret",
        F.expr("CAST((1000000 * qty_ret) DIV qty_all AS BIGINT)")
        .alias("ret_ppm"),
    ).withColumn(
        "rnk",
        F.row_number()
        .over(
            Window.partitionBy("channel").orderBy(
                F.col("ret_ppm").desc(), "l_partkey"
            )
        )
        .cast("long"),
    )
    return r.filter(F.col("rnk") <= 10).orderBy("channel", "rnk")


# --- ds46: TPC-DS Q17 shape — coefficient-of-variation filter ---------------
# Template (`benchmark/tpcds/query17.tpl`): per item, the mean and
# standard deviation of quantity, keeping items whose coefficient of
# variation (stdev/mean) exceeds a bound — the "erratic demand" report.
# The float-free trick: with S = Σx, Q = Σx², sample variance
# s² = (nQ - S²)/(n(n-1)) and CV > 1/2  ⇔  4n(nQ - S²) > (n-1)S² —
# pure integer cross-multiplication (quantities ≤ 50, so nQ < 2^53 at
# any realistic group size), evaluated as a HAVING over ONE map-side-
# combinable (n, S, Q) moment aggregate per part. The same single-pass
# moment shape a04 certifies for corr/stddev; here it gates rows.

_DS46_ORACLE = """
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS q
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(*) >= 5
   AND 4 * COUNT(*) * (COUNT(*) * SUM(CAST(l_quantity AS BIGINT)
                                      * CAST(l_quantity AS BIGINT))
                       - SUM(CAST(l_quantity AS BIGINT))
                         * SUM(CAST(l_quantity AS BIGINT)))
       > (COUNT(*) - 1) * SUM(CAST(l_quantity AS BIGINT))
                        * SUM(CAST(l_quantity AS BIGINT))
ORDER BY l_partkey
LIMIT 100
"""


@query(
    "ds46_cv_filter", _DS46_ORACLE,
    doc="TPC-DS Q17 shape: coefficient-of-variation HAVING from ONE "
        "(n, S, Q) moment aggregate — CV > 1/2 as the integer "
        "cross-multiplication 4n(nQ - S^2) > (n-1)S^2, no floats",
)
def ds46(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    g = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("long").alias("s"),
        F.sum(x * x).cast("long").alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    return (
        g.filter(
            (n >= 5) & (4 * n * (n * q - s * s) > (n - 1) * s * s)
        )
        .select("l_partkey", n.cast("long").alias("n"), "s", "q")
        .orderBy("l_partkey")
        .limit(100)
    )


# --- c25: ClickBench URL path-hierarchy rollup -------------------------------
# ClickBench's URL-hierarchy family (queries.sql Q22-Q27 operate on
# URL/Referer structure): derive each hit's path depth and first path
# segment, then report traffic by (segment, depth) with distinct-page
# counts — the "site map by section" report. URLs are synthesised from
# document columns exactly like c17's domain gate (same corpus contract)
# with VARIABLE depth; depth = '/'-count via the length-difference
# identity and segment via substring_index — byte-identical string
# semantics on both engines, one scan, one groupBy.

_C25_ORACLE = """
WITH h AS (
  SELECT '/' || lang || '/s' || CAST(doc_id % 7 AS VARCHAR)
         || CASE WHEN doc_id % 3 > 0
                 THEN '/p' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 3 = 2
                 THEN '/v' || CAST(doc_id % 10 AS VARCHAR) ELSE '' END
           AS path
  FROM documents),
k AS (
  SELECT path,
         length(path) - length(replace(path, '/', '')) AS depth,
         string_split(path, '/')[2] AS seg
  FROM h)
SELECT seg, CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(COUNT(DISTINCT path) AS BIGINT) AS n_pages,
       MIN(path) AS min_path
FROM k GROUP BY seg, depth
ORDER BY seg, depth
"""


@query(
    "c25_url_path_hierarchy", _C25_ORACLE,
    doc="ClickBench URL-hierarchy shape: path depth via '/'-count "
        "length identity + first segment via substring_index, traffic "
        "and distinct-page rollup by (segment, depth) — one scan, one "
        "groupBy",
)
def c25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/"), F.col("lang"), F.lit("/s"),
        (F.col("doc_id") % 7).cast("string"),
        F.when(
            F.col("doc_id") % 3 > 0,
            F.concat(F.lit("/p"), (F.col("doc_id") % 100).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 2,
            F.concat(F.lit("/v"), (F.col("doc_id") % 10).cast("string")),
        ).otherwise(F.lit("")),
    )
    k = docs.select(path.alias("path")).select(
        "path",
        (
            F.length("path")
            - F.length(F.call_function("replace", F.col("path"), F.lit("/")))
        ).cast("long").alias("depth"),
        F.split(F.col("path"), "/").getItem(1).alias("seg"),
    )
    return (
        k.groupBy("seg", "depth")
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.countDistinct("path").alias("n_pages"),
            F.min("path").alias("min_path"),
        )
        .orderBy("seg", "depth")
    )


# --- ds47: TPC-DS Q31 shape — cross-channel quarter-over-quarter growth -----
# Template (`benchmark/tpcds/query31.tpl`): per county, store-channel and
# web-channel revenue for consecutive quarters; keep counties where the
# web channel grew FASTER than the store channel — two channels x two
# quarters, compared as growth RATIOS without division. Re-authored on
# TPC-H: channel A = order revenue by customer nation, channel B =
# lineitem revenue by supplier nation, quarters 1995Q1 vs 1995Q2; the
# ratio comparison a2/a1 > b2/b1 runs on per-mille growth integers
# (1000*a2 DIV a1) — a naive cents cross-multiplication a2*b1 overflows
# int64 from sf0.1 up (ANSI Spark throws, DuckDB silently widens to
# HUGEINT: a cross-engine trap), while whole-dollar sums with a single
# x1000 scale stay under 2^63 through sf1000. Truncating DIV is
# engine-identical. Each channel is ONE grouped aggregate over its own
# pushed date range; the compare happens on the 25-row nation grain.

_DS47_ORACLE = """
WITH ca AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CASE WHEN o.o_orderdate < DATE '1995-04-01'
                  THEN CAST(FLOOR(o.o_totalprice) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS a1,
         CAST(SUM(CASE WHEN o.o_orderdate >= DATE '1995-04-01'
                  THEN CAST(FLOOR(o.o_totalprice) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS a2
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= DATE '1995-01-01'
    AND o.o_orderdate < DATE '1995-07-01'
  GROUP BY n.n_name),
cb AS (
  SELECT n.n_name AS nation,
         CAST(SUM(CASE WHEN l.l_shipdate < DATE '1995-04-01'
                  THEN CAST(FLOOR(l.l_extendedprice) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS b1,
         CAST(SUM(CASE WHEN l.l_shipdate >= DATE '1995-04-01'
                  THEN CAST(FLOOR(l.l_extendedprice) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS b2
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE l.l_shipdate >= DATE '1995-01-01'
    AND l.l_shipdate < DATE '1995-07-01'
  GROUP BY n.n_name)
SELECT ca.nation, ca.a1, ca.a2, cb.b1, cb.b2,
       CAST((1000 * ca.a2) // ca.a1 AS BIGINT) AS growth_a_pm,
       CAST((1000 * cb.b2) // cb.b1 AS BIGINT) AS growth_b_pm
FROM ca JOIN cb ON ca.nation = cb.nation
WHERE ca.a1 > 0 AND cb.b1 > 0 AND ca.a2 > 0 AND cb.b2 > 0
  AND (1000 * ca.a2) // ca.a1 > (1000 * cb.b2) // cb.b1
ORDER BY ca.nation
"""


@query(
    "ds47_cross_channel_growth", _DS47_ORACLE,
    doc="TPC-DS Q31 shape: two channels x two quarters, growth-ratio "
        "comparison by integer cross-multiplication on the 25-row "
        "nation grain — one pushed-range aggregate per channel",
)
def ds47(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1995-07-01"))
    )
    o_cents = F.floor(F.col("o_totalprice")).cast("long")
    l_cents = F.floor(F.col("l_extendedprice")).cast("long")
    q2_o = F.col("o_orderdate") >= F.lit("1995-04-01")
    q2_l = F.col("l_shipdate") >= F.lit("1995-04-01")
    ca = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.when(~q2_o, o_cents).otherwise(F.lit(0)))
            .cast("long").alias("a1"),
            F.sum(F.when(q2_o, o_cents).otherwise(F.lit(0)))
            .cast("long").alias("a2"),
        )
    )
    cb = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_b"))
        .agg(
            F.sum(F.when(~q2_l, l_cents).otherwise(F.lit(0)))
            .cast("long").alias("b1"),
            F.sum(F.when(q2_l, l_cents).otherwise(F.lit(0)))
            .cast("long").alias("b2"),
        )
    )
    return (
        ca.join(cb, ca.nation == cb.nation_b)
        .withColumn("growth_a_pm", F.expr("(1000 * a2) DIV a1"))
        .withColumn("growth_b_pm", F.expr("(1000 * b2) DIV b1"))
        .filter(
            (F.col("a1") > 0) & (F.col("b1") > 0)
            & (F.col("a2") > 0) & (F.col("b2") > 0)
            & (F.col("growth_a_pm") > F.col("growth_b_pm"))
        )
        .select("nation", "a1", "a2", "b1", "b2",
                "growth_a_pm", "growth_b_pm")
        .orderBy("nation")
    )


# --- ds48: TPC-DS Q4 shape — three-channel year-over-year growth ------------
# Template (`benchmark/tpcds/query4.tpl`): customers whose CATALOG-channel
# year-over-year growth exceeds BOTH their store and web growth — Q11's
# (ds37) big brother: three channels, two simultaneous ratio comparisons.
# Same exact-arithmetic discipline as ds37: each ratio comparison is an
# integer cross-multiplication (cat2/cat1 > web2/web1 <=> cat2*web1 >
# web2*cat1 over positive cents), the ordering key an integer ppm.
# Bounds: yearly per-customer sums <= ~1e8 cents, pairwise products
# <= ~1e16 << 2^63 (the ds47 overflow lesson, checked at sf0.1).
# Distributed shape: ONE orderkey shuffle join + ONE custkey groupBy
# producing all six conditional sums (the template's three CTE scans
# fused into one pass), filter + top-100.

_DS48_ORACLE = """
WITH sales AS (
  SELECT o_custkey AS cust, YEAR(o_orderdate) AS yr, l_partkey % 3 AS chan,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0)
             AS BIGINT)) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE YEAR(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3),
p AS (
  SELECT cust,
    CAST(SUM(CASE WHEN yr=1995 AND chan=0 THEN rev ELSE 0 END) AS BIGINT) AS st1,
    CAST(SUM(CASE WHEN yr=1996 AND chan=0 THEN rev ELSE 0 END) AS BIGINT) AS st2,
    CAST(SUM(CASE WHEN yr=1995 AND chan=1 THEN rev ELSE 0 END) AS BIGINT) AS wb1,
    CAST(SUM(CASE WHEN yr=1996 AND chan=1 THEN rev ELSE 0 END) AS BIGINT) AS wb2,
    CAST(SUM(CASE WHEN yr=1995 AND chan=2 THEN rev ELSE 0 END) AS BIGINT) AS ct1,
    CAST(SUM(CASE WHEN yr=1996 AND chan=2 THEN rev ELSE 0 END) AS BIGINT) AS ct2
  FROM sales GROUP BY cust)
SELECT cust, st1, st2, wb1, wb2, ct1, ct2,
       CAST(ct2 * 1000000 // ct1 AS BIGINT) AS cat_growth_ppm
FROM p
WHERE st1 > 0 AND wb1 > 0 AND ct1 > 0
  AND ct2 * wb1 > wb2 * ct1
  AND ct2 * st1 > st2 * ct1
ORDER BY cat_growth_ppm DESC, cust LIMIT 100
"""


@query(
    "ds48_yoy_channel_growth", _DS48_ORACLE,
    doc="TPC-DS Q4 shape: catalog-channel YoY growth must beat store AND "
        "web growth — two integer cross-multiplied ratio comparisons "
        "from one fused six-sum pass",
)
def ds48(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("long")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("cust"),
        F.year("o_orderdate").alias("yr"),
        (F.col("l_partkey") % 3).alias("chan"),
        cents.alias("cents"),
    )

    def _band(yr: int, chan: int):
        return F.sum(
            F.when((F.col("yr") == yr) & (F.col("chan") == chan),
                   F.col("cents")).otherwise(F.lit(0))
        )

    p = j.groupBy("cust").agg(
        _band(1995, 0).alias("st1"), _band(1996, 0).alias("st2"),
        _band(1995, 1).alias("wb1"), _band(1996, 1).alias("wb2"),
        _band(1995, 2).alias("ct1"), _band(1996, 2).alias("ct2"),
    )
    return (
        p.filter(
            (F.col("st1") > 0) & (F.col("wb1") > 0) & (F.col("ct1") > 0)
            & (F.col("ct2") * F.col("wb1") > F.col("wb2") * F.col("ct1"))
            & (F.col("ct2") * F.col("st1") > F.col("st2") * F.col("ct1"))
        )
        .select(
            "cust", "st1", "st2", "wb1", "wb2", "ct1", "ct2",
            F.expr("ct2 * 1000000 DIV ct1").alias("cat_growth_ppm"),
        )
        .orderBy(F.col("cat_growth_ppm").desc(), "cust")
        .limit(100)
    )


# --- ds49: TPC-DS Q39 shape — coefficient-of-variation month pair -----------
# Template (`benchmark/tpcds/query39.tpl`): per (warehouse, item, month)
# quantity mean/stdev, keep groups whose coefficient of variation exceeds
# a threshold, then SELF-JOIN consecutive months so only suppliers
# erratic in BOTH months survive. The cov test is float-free: with
# integer moments n, S=sum(q), Q=sum(q^2), stdev_samp^2 = (nQ - S^2) /
# (n (n-1)) and cov >= 11/20 <=> 400 n (nQ - S^2) >= 121 (n-1) S^2 —
# every side integer-valued. Bounds: per (supplier, month) n <= ~1e3 at
# sf0.1 and quantities <= 50, so 400*n*(nQ - S^2) <= ~4e13 << 2^63.
# Distributed shape: ONE groupBy over the two filtered months, then an
# equi self-join on suppkey (two slices of the same aggregate, the Q39
# topology) — never a window.

_DS49_ORACLE = """
WITH m AS (
  SELECT l_suppkey AS supp, MONTH(l_shipdate) AS mon,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                  * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE YEAR(l_shipdate) = 1995 AND MONTH(l_shipdate) IN (3, 4)
  GROUP BY 1, 2),
erratic AS (
  SELECT * FROM m
  WHERE n > 1 AND 400 * n * (n * q - s * s) >= 121 * (n - 1) * s * s)
SELECT a.supp, a.n AS n1, a.s AS s1, a.q AS q1,
       b.n AS n2, b.s AS s2, b.q AS q2
FROM erratic a JOIN erratic b ON a.supp = b.supp
WHERE a.mon = 3 AND b.mon = 4
ORDER BY a.supp
"""


@query(
    "ds49_inventory_cov_pair", _DS49_ORACLE,
    doc="TPC-DS Q39 shape: integer-moment coefficient-of-variation filter "
        "self-joined across consecutive months — erratic in BOTH or out",
)
def ds49(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.year("l_shipdate") == 1995) & F.month("l_shipdate").isin(3, 4)
    )
    qi = F.floor(F.col("l_quantity")).cast("long")
    m = (
        li.select(
            F.col("l_suppkey").alias("supp"),
            F.month("l_shipdate").alias("mon"),
            qi.alias("qi"),
        )
        .groupBy("supp", "mon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qi").alias("s"),
            F.sum(F.col("qi") * F.col("qi")).alias("q"),
        )
    )
    erratic = m.filter(
        (F.col("n") > 1)
        & (400 * F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
           >= 121 * (F.col("n") - 1) * F.col("s") * F.col("s"))
    )
    a = erratic.filter(F.col("mon") == 3).select(
        "supp", F.col("n").alias("n1"), F.col("s").alias("s1"),
        F.col("q").alias("q1"),
    )
    b = erratic.filter(F.col("mon") == 4).select(
        F.col("supp").alias("supp_b"), F.col("n").alias("n2"),
        F.col("s").alias("s2"), F.col("q").alias("q2"),
    )
    return (
        a.join(b, a.supp == b.supp_b)
        .select("supp", "n1", "s1", "q1", "n2", "s2", "q2")
        .orderBy("supp")
    )


# --- ds50: TPC-DS Q59 shape — week-over-week ratio matrix -------------------
# Template (`benchmark/tpcds/query59.tpl`): per-store WEEKLY sales pivoted
# into seven weekday columns, the SAME aggregate self-joined at a
# 53-week offset, and each weekday column reported as a this-year /
# last-year ratio. Re-authored on orders->customer->nation with the
# nation as the store dimension. Calendar arithmetic is engine-proof
# integer math on epoch days (no weekofyear/dayofweek dialect hazards):
# Monday-aligned week index w = (d+3) DIV 7, ISO weekday = (d+3) % 7 + 1
# (1970-01-01 was a Thursday). 1995's 52 full weeks are 1305..1356; the
# +52 offset lands wholly inside 1996. Ratios are integer ppm via DIV
# with a NULLIF zero-guard (the ds33 rule). Distributed shape: ONE scan
# + ONE (nation, week) groupBy building all seven day-sums, then an
# equi self-join of two slices at the offset — the Q59 topology.

_DS50_ORACLE = """
WITH base AS (
  SELECT n_name,
         CAST((date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) + 3) // 7
              AS BIGINT) AS wk,
         CAST((date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) + 3) % 7 + 1
              AS BIGINT) AS dow,
         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey),
wss AS (
  SELECT n_name, wk,
    CAST(SUM(CASE WHEN dow=1 THEN cents ELSE 0 END) AS BIGINT) AS mon,
    CAST(SUM(CASE WHEN dow=2 THEN cents ELSE 0 END) AS BIGINT) AS tue,
    CAST(SUM(CASE WHEN dow=3 THEN cents ELSE 0 END) AS BIGINT) AS wed,
    CAST(SUM(CASE WHEN dow=4 THEN cents ELSE 0 END) AS BIGINT) AS thu,
    CAST(SUM(CASE WHEN dow=5 THEN cents ELSE 0 END) AS BIGINT) AS fri,
    CAST(SUM(CASE WHEN dow=6 THEN cents ELSE 0 END) AS BIGINT) AS sat,
    CAST(SUM(CASE WHEN dow=7 THEN cents ELSE 0 END) AS BIGINT) AS sun
  FROM base GROUP BY 1, 2)
SELECT y1.n_name, y1.wk,
  CAST(y2.mon * 1000000 // NULLIF(y1.mon, 0) AS BIGINT) AS mon_ppm,
  CAST(y2.tue * 1000000 // NULLIF(y1.tue, 0) AS BIGINT) AS tue_ppm,
  CAST(y2.wed * 1000000 // NULLIF(y1.wed, 0) AS BIGINT) AS wed_ppm,
  CAST(y2.thu * 1000000 // NULLIF(y1.thu, 0) AS BIGINT) AS thu_ppm,
  CAST(y2.fri * 1000000 // NULLIF(y1.fri, 0) AS BIGINT) AS fri_ppm,
  CAST(y2.sat * 1000000 // NULLIF(y1.sat, 0) AS BIGINT) AS sat_ppm,
  CAST(y2.sun * 1000000 // NULLIF(y1.sun, 0) AS BIGINT) AS sun_ppm
FROM wss y1 JOIN wss y2 ON y1.n_name = y2.n_name AND y2.wk = y1.wk + 52
WHERE y1.wk BETWEEN 1305 AND 1356
ORDER BY y1.n_name, y1.wk
"""


@query(
    "ds50_week_ratio_matrix", _DS50_ORACLE,
    doc="TPC-DS Q59 shape: weekly seven-day sales matrix self-joined at a "
        "52-week offset, per-weekday integer-ppm ratios (epoch-day week "
        "arithmetic, engine-proof)",
)
def ds50(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    d = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            ((d + 3) / 7).cast("long").alias("wk"),
            ((d + 3) % 7 + 1).cast("long").alias("dow"),
            F.floor(F.col("o_totalprice") * 100.0).cast("long").alias("cents"),
        )
    )

    def _day(i: int):
        return F.sum(
            F.when(F.col("dow") == i, F.col("cents")).otherwise(F.lit(0))
        ).cast("long")

    days = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"]
    wss = base.groupBy("n_name", "wk").agg(
        *[_day(i + 1).alias(nm) for i, nm in enumerate(days)]
    )
    y1 = wss.filter(F.col("wk").between(1305, 1356))
    y2 = wss.select(
        F.col("n_name").alias("n2"), F.col("wk").alias("wk2"),
        *[F.col(nm).alias(f"{nm}2") for nm in days],
    )
    return (
        y1.join(
            y2,
            (y1.n_name == y2.n2) & (F.col("wk2") == F.col("wk") + 52),
        )
        .select(
            "n_name", "wk",
            *[
                F.expr(f"{nm}2 * 1000000 DIV NULLIF({nm}, 0)")
                .alias(f"{nm}_ppm")
                for nm in days
            ],
        )
        .orderBy("n_name", "wk")
    )


# --- b17: JOB shape — six-table chain with a snowflake dimension arm --------
# The JOB corpus' deepest chains (e.g. 29a-c) run 6+ tables with the
# selective filters spread along the chain AND down a snowflaked
# dimension arm. Re-authored: part -> lineitem -> orders -> customer ->
# nation -> region, with a disjunctive type filter at the part end, a
# quantity band in the middle, and the region filter two dimension hops
# away from the fact — the join-order stress is that the most selective
# predicate (region) reaches the fact only THROUGH nation. MINs over
# strings from three different tables (the JOB answer shape), all
# map-side-combinable; every dimension broadcasts, so the chain's only
# exchange is the single-row final merge.

_B17_ORACLE = """
SELECT MIN(p.p_name) AS min_part,
       MIN(c.c_name) AS min_customer,
       MIN(n.n_name) AS min_nation,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE (p.p_type = 'PROMO' OR p.p_type = 'LARGE')
  AND l.l_quantity >= 40
  AND r.r_name = 'EUROPE'
"""


@query(
    "b17_deep_chain_mins", _B17_ORACLE,
    doc="JOB deep-chain shape: six tables, disjunctive filter at one end, "
        "the most selective filter two snowflake hops from the fact — "
        "MIN(string) answer columns, broadcast dims only",
)
def b17(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") | (F.col("p_type") == "LARGE")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("c_name").alias("min_customer"),
            F.min("n_name").alias("min_nation"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- l18: LDBC BI shape — 3-hop expansion profile per seed ------------------
# LDBC BI's multi-hop class (BI-10/BI-19 family): from each seed person,
# how many DISTINCT others are first reached at hop 1, 2, 3 — the
# min-hop frontier profile. Level-synchronous relational BFS over the
# l09 co-supplier graph: each level is one equi-join on vertex ids plus
# anti-joins against the already-reached set (min-hop dedup), so
# per-level state is (seed, node) pairs — never adjacency lists on the
# driver, never a path explosion kept past its level. The undirected
# edge set is built ONCE and localCheckpointed (it feeds four joins;
# the l17 lesson — re-deriving it per level re-runs the pair join).

_L18_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2 FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
und AS (
  SELECT s1 AS a, s2 AS b FROM edges
  UNION ALL SELECT s2, s1 FROM edges),
seeds AS (SELECT DISTINCT a AS src FROM und WHERE a % 25 = 0),
h1 AS (
  SELECT DISTINCT s.src, u.b AS n
  FROM seeds s JOIN und u ON u.a = s.src
  WHERE u.b <> s.src),
h2 AS (
  SELECT DISTINCT h.src, u.b AS n
  FROM h1 h JOIN und u ON u.a = h.n
  WHERE u.b <> h.src
    AND NOT EXISTS (SELECT 1 FROM h1 x WHERE x.src = h.src AND x.n = u.b)),
h3 AS (
  SELECT DISTINCT h.src, u.b AS n
  FROM h2 h JOIN und u ON u.a = h.n
  WHERE u.b <> h.src
    AND NOT EXISTS (SELECT 1 FROM h1 x WHERE x.src = h.src AND x.n = u.b)
    AND NOT EXISTS (SELECT 1 FROM h2 x WHERE x.src = h.src AND x.n = u.b)),
lv AS (
  SELECT src, 1 AS hop FROM h1
  UNION ALL SELECT src, 2 FROM h2
  UNION ALL SELECT src, 3 FROM h3)
SELECT src,
  CAST(SUM(CASE WHEN hop=1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
  CAST(SUM(CASE WHEN hop=2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
  CAST(SUM(CASE WHEN hop=3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
FROM lv GROUP BY src ORDER BY src
"""


@query(
    "l18_multi_hop_interaction", _L18_ORACLE,
    doc="LDBC BI multi-hop shape: per-seed min-hop frontier profile "
        "(distinct nodes first reached at hops 1/2/3) — level-synchronous "
        "joins + anti-join dedup, checkpointed edge set",
)
def l18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    right = li.select(
        F.col("l_orderkey").alias("r_okey"), F.col("l_suppkey").alias("sb")
    )
    pairs = li.join(
        right,
        (F.col("l_orderkey") == F.col("r_okey"))
        & (F.col("l_suppkey") < F.col("sb")),
    ).select(
        F.col("l_suppkey").alias("s1"), F.col("sb").alias("s2"), "l_orderkey"
    )
    edges = (
        pairs.groupBy("s1", "s2")
        # pair rows unique per (s1, s2, okey) after the base distinct ->
        # COUNT == COUNT(DISTINCT okey), minus one pair-grain shuffle
        # (round-13 batch B, guide §2.3)
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("s1", "s2")
    )
    und = (
        edges.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
        .unionAll(edges.select(F.col("s2").alias("a"), F.col("s1").alias("b")))
        .localCheckpoint(eager=True)
    )
    seeds = (
        und.filter(F.col("a") % 25 == 0).select(F.col("a").alias("src"))
        .distinct()
    )

    def _expand(frontier: DataFrame) -> DataFrame:
        """(src, n) frontier -> next level's raw (src, n) candidates."""
        return (
            frontier.join(und, frontier["n"] == und["a"])
            .select("src", F.col("b").alias("n"))
            .filter(F.col("src") != F.col("n"))
            .distinct()
        )

    def _minus(cand: DataFrame, *reached: DataFrame) -> DataFrame:
        for r in reached:
            cand = cand.join(
                r.select(F.col("src").alias("rs"), F.col("n").alias("rn")),
                (F.col("src") == F.col("rs")) & (F.col("n") == F.col("rn")),
                "left_anti",
            )
        return cand

    h1 = (
        seeds.join(und, seeds["src"] == und["a"])
        .select("src", F.col("b").alias("n"))
        .filter(F.col("src") != F.col("n"))
        .distinct()
    )
    h2 = _minus(_expand(h1), h1)
    h3 = _minus(_expand(h2), h1, h2)
    lv = (
        h1.select("src", F.lit(1).alias("hop"))
        .unionAll(h2.select("src", F.lit(2).alias("hop")))
        .unionAll(h3.select("src", F.lit(3).alias("hop")))
    )
    return (
        lv.groupBy("src")
        .agg(
            *[
                F.sum(F.when(F.col("hop") == i, 1).otherwise(0))
                .cast("long").alias(f"n{i}")
                for i in (1, 2, 3)
            ]
        )
        .orderBy("src")
    )


# --- ds51: TPC-DS Q93 shape — returns-adjusted sales ------------------------
# Template (`benchmark/tpcds/query93.tpl`): store sales LEFT JOINED to
# store returns at the (ticket, item) LINE grain; the sold quantity is
# reduced by the returned quantity when a return exists, then summed per
# customer with a top-100. Re-authored: the returns side is the
# l_returnflag='R' slice of lineitem at (l_orderkey, l_linenumber) grain
# with half the quantity returned — the LEFT join + CASE adjustment +
# customer rollup is the Q93 topology exactly. The line-grain join key
# is composite and unique on the build side (one return row per line),
# so the join never fans out.

_DS51_ORACLE = """
WITH ret AS (
  SELECT l_orderkey AS r_okey, l_linenumber AS r_line,
         CAST(FLOOR(l_quantity) AS BIGINT) // 2 AS ret_qty
  FROM lineitem WHERE l_returnflag = 'R'),
adj AS (
  SELECT o_custkey AS cust,
         CAST(FLOOR(l.l_quantity) AS BIGINT)
           - COALESCE(r.ret_qty, 0) AS q_adj
  FROM lineitem l
  JOIN orders ON l.l_orderkey = o_orderkey
  LEFT JOIN ret r
    ON l.l_orderkey = r.r_okey AND l.l_linenumber = r.r_line)
SELECT cust, CAST(SUM(q_adj) AS BIGINT) AS total_q
FROM adj GROUP BY cust
ORDER BY total_q DESC, cust LIMIT 100
"""


@query(
    "ds51_returns_adjusted_sales", _DS51_ORACLE,
    doc="TPC-DS Q93 shape: line-grain LEFT JOIN to the returns slice, "
        "CASE-adjusted quantity, customer rollup top-100",
)
def ds51(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    qi = F.floor(F.col("l_quantity")).cast("long")
    ret = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_okey"),
        F.col("l_linenumber").alias("r_line"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT) DIV 2").alias("ret_qty"),
    )
    adj = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            ret,
            (li.l_orderkey == ret.r_okey)
            & (li.l_linenumber == ret.r_line),
            "left",
        )
        .select(
            F.col("o_custkey").alias("cust"),
            (qi - F.coalesce(F.col("ret_qty"), F.lit(0))).alias("q_adj"),
        )
    )
    return (
        adj.groupBy("cust")
        .agg(F.sum("q_adj").cast("long").alias("total_q"))
        .orderBy(F.col("total_q").desc(), "cust")
        .limit(100)
    )


# --- ds52: TPC-DS Q5 shape — channel UNION then rollup report ----------------
# Template (`benchmark/tpcds/query5.tpl`): each channel is pre-aggregated
# with its OWN column mapping (sales vs returns land in different source
# columns per channel), the three are UNION ALLed into one (channel, key,
# sales, returns) stream, and the report is a ROLLUP over it — the
# union-then-rollup topology none of the other ds gates exercises. Three
# channels come from l_partkey % 3; returns are the l_returnflag='R'
# slice. One scan feeds all three channel legs (conditional aggregates
# at the (chan, nation) grain stand in for the per-channel CTEs — same
# stream, same grain), then ROLLUP(chan, nation) with GROUPING-null
# markers folded to 'ALL'.

_DS52_ORACLE = """
WITH leg AS (
  SELECT CAST(l_partkey % 3 AS BIGINT) AS chan, n_name,
    CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
      AS sales,
    CAST(SUM(CASE WHEN l_returnflag = 'R'
             THEN CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS returns
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT COALESCE(CAST(chan AS VARCHAR), 'ALL') AS channel,
       COALESCE(CASE WHEN GROUPING(n_name) = 1 THEN NULL ELSE n_name END,
                'ALL') AS nation,
       CAST(SUM(sales) AS BIGINT) AS sales,
       CAST(SUM(returns) AS BIGINT) AS returns,
       CAST(SUM(sales) - SUM(returns) AS BIGINT) AS net
FROM leg
GROUP BY ROLLUP(chan, n_name)
ORDER BY channel, nation
"""


@query(
    "ds52_channel_rollup_report", _DS52_ORACLE,
    doc="TPC-DS Q5 shape: per-channel pre-aggregates unioned into one "
        "stream, ROLLUP report with grouped-null markers folded to ALL",
)
def ds52(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100.0).cast("long")
    leg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            (F.col("l_partkey") % 3).cast("long").alias("chan"),
            "n_name",
            cents.alias("cents"),
            F.when(F.col("l_returnflag") == "R", cents)
            .otherwise(F.lit(0)).alias("rcents"),
        )
        .groupBy("chan", "n_name")
        .agg(
            F.sum("cents").cast("long").alias("sales"),
            F.sum("rcents").cast("long").alias("returns"),
        )
    )
    return (
        leg.rollup("chan", "n_name")
        .agg(
            F.sum("sales").cast("long").alias("sales"),
            F.sum("returns").cast("long").alias("returns"),
            (F.sum("sales") - F.sum("returns")).cast("long").alias("net"),
        )
        .select(
            F.coalesce(F.col("chan").cast("string"), F.lit("ALL"))
            .alias("channel"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "sales", "returns", "net",
        )
        .orderBy("channel", "nation")
    )


# --- ds53: TPC-DS Q1 shape — above-average returns per store -----------------
# Template (`benchmark/tpcds/query1.tpl`): customers whose total returns
# in a store exceed 1.2x the AVERAGE customer-total for that store — the
# correlated-scalar-aggregate-per-group topology (the template's
# correlated subquery over the ctr CTE). Store = the supplier's nation.
# The average never materialises as a float: with per-store candidate
# count n and grand sum s, total > 1.2 * (s / n) <=> 10 * total * n >
# 12 * s — exact 64-bit integers (totals <= ~1e9 cents, n <= ~1e4 at
# sf0.1). Distributed shape: one (cust, store) groupBy, one O(#stores)
# aggregate broadcast back, never a per-row subquery.

_DS53_ORACLE = """
WITH ctr AS (
  SELECT o_custkey AS cust, s_nationkey AS store,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS total
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2),
stats AS (
  SELECT store AS st, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(total) AS BIGINT) AS s
  FROM ctr GROUP BY 1)
SELECT c.cust, c.store, c.total
FROM ctr c JOIN stats ON c.store = stats.st
WHERE 10 * c.total * stats.n > 12 * stats.s
ORDER BY c.store, c.total DESC, c.cust
"""


@query(
    "ds53_above_avg_returns", _DS53_ORACLE,
    doc="TPC-DS Q1 shape: correlated per-store average lowered to one "
        "O(#stores) aggregate joined back, comparison by integer "
        "cross-multiplication (10*total*n > 12*s)",
)
def ds53(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cents = F.floor(F.col("l_extendedprice") * 100.0).cast("long")
    ctr = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("s_nationkey").alias("store"),
            cents.alias("cents"),
        )
        .groupBy("cust", "store")
        .agg(F.sum("cents").cast("long").alias("total"))
    )
    stats = ctr.groupBy(F.col("store").alias("st")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("total").cast("long").alias("s"),
    )
    return (
        ctr.join(F.broadcast(stats), ctr.store == stats.st)
        .filter(10 * F.col("total") * F.col("n") > 12 * F.col("s"))
        .select("cust", "store", "total")
        .orderBy("store", F.col("total").desc(), "cust")
    )


# --- c26: ClickBench shape — min-URL per phrase under a contains filter ------
# ClickBench Q22 family: WHERE URL LIKE '%...%' AND SearchPhrase <> ''
# GROUP BY SearchPhrase with MIN(URL) + COUNT(*) ORDER BY c DESC LIMIT 10
# — the distinctive bit vs the other c-gates is a MIN over a LONG string
# column computed under a non-sargable contains filter, with the top-k
# on the count. props stands in for URL, event_type for the phrase.

_C26_ORACLE = """
SELECT event_type, MIN(props) AS min_props,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE props LIKE '%5%' AND event_type <> 'view'
GROUP BY event_type
ORDER BY n DESC, event_type
LIMIT 10
"""


@query(
    "c26_phrase_min_url", _C26_ORACLE,
    doc="ClickBench Q22 shape: MIN(long string) + count per phrase under "
        "a contains filter, top-10 by count",
)
def c26(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like("%5%") & (F.col("event_type") != "view"))
        .groupBy("event_type")
        .agg(
            F.min("props").alias("min_props"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy(F.col("n").desc(), "event_type")
        .limit(10)
    )


# --- b18: JOB shape — eight-table-instance chain, disjunctive filter soup ----
# JOB's widest chains (e.g. 28/29/33) run 8+ table instances with the
# same dimension joined in TWO ROLES and disjunctive filters scattered
# along the chain (benchmark/job/*.sql in the reference corpus).
# Re-authored: lineitem at the center, part + supplier + orders +
# customer around it, nation joined twice (customer nation and supplier
# nation — distinct roles, like JOB's repeated name/title joins), region
# off the customer arm, plus a CROSS-ROLE predicate (the supplier must
# sit in a DIFFERENT region than the customer) that only resolves after
# both role joins. Disjunctions on part (type OR size) and orders
# (priority OR priority) defeat single-column pruning, the JOB stress.
# All dims broadcast; the only shuffles are the two fact-side hash
# joins, and the answer is the JOB MIN(string) shape.

_B18_ORACLE = """
SELECT MIN(p.p_name) AS min_part,
       MIN(s.s_name) AS min_supp,
       MIN(c.c_name) AS min_cust,
       MIN(n2.n_name) AS min_supp_nation,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n1.n_regionkey
WHERE (p.p_type = 'PROMO' OR p.p_size >= 40)
  AND (o.o_orderpriority = '1-URGENT' OR o.o_orderpriority = '2-HIGH')
  AND r.r_name IN ('ASIA', 'AFRICA')
  AND n2.n_regionkey <> n1.n_regionkey
"""


@query(
    "b18_wide_chain_disjunctive", _B18_ORACLE,
    doc="JOB widest-chain shape: 8 table instances, nation in two roles, "
        "disjunctive filters on part and orders, cross-role region "
        "inequality resolvable only after both role joins — MIN(string) "
        "answers, broadcast dims only",
)
def b18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") | (F.col("p_size") >= 40)
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        | (F.col("o_orderpriority") == "2-HIGH")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("n2_name"),
        F.col("n_regionkey").alias("n2_region"),
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "AFRICA")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .filter(F.col("n2_region") != F.col("n1_region"))
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("s_name").alias("min_supp"),
            F.min("c_name").alias("min_cust"),
            F.min("n2_name").alias("min_supp_nation"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- c27: ClickBench shape — mutually-exclusive conditions ladder ------------
# ClickBench's segment-profile queries classify every hit into exactly
# ONE bucket via a first-match-wins condition cascade, then profile the
# buckets in a single scan. The CASE ladder IS the operator: the
# conditions overlap (every big purchase is also a purchase), so a
# naive per-condition COUNT(*) stack would double-count — first-match
# semantics make the buckets a partition of the corpus. One scan, one
# groupBy on the derived 5-value key; sums quantized to integer cents
# before aggregation.

_C27_ORACLE = """
SELECT CASE
         WHEN event_type = 'purchase' AND value >= 66.0 THEN 'big_purchase'
         WHEN event_type = 'purchase' THEN 'purchase'
         WHEN event_type = 'click' AND props IS NOT NULL THEN 'rich_click'
         WHEN event_type = 'click' THEN 'click'
         ELSE 'other'
       END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY 1
ORDER BY bucket
"""


@query(
    "c27_exclusive_ladder", _C27_ORACLE,
    doc="ClickBench mutually-exclusive-conditions ladder: first-match-"
        "wins CASE cascade partitions the corpus into 5 buckets, "
        "profiled in one scan + one groupBy",
)
def c27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(
            (F.col("event_type") == "purchase") & (F.col("value") >= 66.0),
            "big_purchase",
        )
        .when(F.col("event_type") == "purchase", "purchase")
        .when(
            (F.col("event_type") == "click") & F.col("props").isNotNull(),
            "rich_click",
        )
        .when(F.col("event_type") == "click", "click")
        .otherwise("other")
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100.0).cast("long"))
            .cast("long").alias("cents"),
        )
        .orderBy("bucket")
    )


# --- c28: ClickBench shape — URL query-parameter extraction ------------------
# ClickBench's URL-parameter queries (EXTRACT_URL_PARAMETER family)
# pull named parameters out of the query string and aggregate on them.
# URLs synthesized deterministically from documents (the c25 recipe,
# with a query string): 'id' is always present, 'ref' always present,
# 'utm' only on every 4th page — the extraction must return '' for a
# missing parameter (both engines' regexp_extract contract), and the
# empty group is a first-class output row. One scan; the regex never
# leaves codegen.

_C28_ORACLE = """
WITH u AS (
  SELECT '/p' || CAST(doc_id % 7 AS VARCHAR)
         || '?id=' || CAST(doc_id % 50 AS VARCHAR)
         || '&ref=' || source
         || CASE WHEN doc_id % 4 = 0 THEN '&utm=' || lang ELSE '' END
           AS url
  FROM documents),
x AS (
  SELECT url,
         regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref,
         regexp_extract(url, '[?&]utm=([^&]*)', 1) AS utm,
         regexp_extract(url, '[?&]id=([^&]*)', 1) AS id
  FROM u)
SELECT ref, utm,
       CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(COUNT(DISTINCT id) AS BIGINT) AS n_ids,
       MIN(url) AS min_url
FROM x GROUP BY ref, utm
ORDER BY ref, utm
"""


@query(
    "c28_url_param_extract", _C28_ORACLE,
    doc="ClickBench URL-parameter extraction: named query-string params "
        "via regexp_extract (missing param -> ''), grouped profile over "
        "(ref, utm) — one scan, one groupBy, regex in codegen",
)
def c28(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("/p"), (F.col("doc_id") % 7).cast("string"),
        F.lit("?id="), (F.col("doc_id") % 50).cast("string"),
        F.lit("&ref="), F.col("source"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("&utm="), F.col("lang")),
        ).otherwise(F.lit("")),
    )
    x = docs.select(url.alias("url")).select(
        "url",
        F.regexp_extract("url", r"[?&]ref=([^&]*)", 1).alias("ref"),
        F.regexp_extract("url", r"[?&]utm=([^&]*)", 1).alias("utm"),
        F.regexp_extract("url", r"[?&]id=([^&]*)", 1).alias("id"),
    )
    return (
        x.groupBy("ref", "utm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("hits"),
            F.countDistinct("id").cast("long").alias("n_ids"),
            F.min("url").alias("min_url"),
        )
        .orderBy("ref", "utm")
    )


# --- l19: LDBC BI shape — open-wedge ANTI-join (edges with no closure) -------
# LDBC BI's negative-pattern class ("persons with NO interaction", the
# anti-join the verdict asked for): which co-supplier edges are OPEN —
# no third supplier adjacent to both endpoints — vs closed into a
# triangle. The analysis graph is DEGREE-CAPPED first (the l11/l13
# discipline): each supplier keeps its top-M=8 strongest neighbors by
# (shared orders DESC, id), and an edge survives only if each endpoint
# is in the other's top-M — the raw >= 2-shared-orders co-supplier
# graph is 69% DENSE at sf0.1 (343k edges over 1000 suppliers, max
# degree 764), so an uncapped closure expansion is quadratic in degree
# and the production form caps exactly like this. On the capped graph
# the closure set is one candidate expansion (edge x <= M neighbors of
# s1) semi-joined against the adjacency on the (s2, candidate) pair;
# open edges are then ONE anti-join of the capped edge set against the
# closure set — never a per-edge NOT EXISTS probe. Both flags fan out
# to the two endpoints for a per-supplier open/closed profile. The
# oracle replays the cap bit-for-bit (row_number over a total order).

_L19_M = 8

_L19_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2, COUNT(DISTINCT l_orderkey) AS n
  FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
und AS (
  SELECT s1 AS a, s2 AS b, n FROM edges
  UNION ALL SELECT s2, s1, n FROM edges),
topm AS (
  SELECT a, b FROM (
    SELECT a, b,
           ROW_NUMBER() OVER (PARTITION BY a ORDER BY n DESC, b) AS rk
    FROM und) WHERE rk <= {_L19_M}),
ec AS (
  SELECT e.s1, e.s2 FROM edges e
  WHERE EXISTS (SELECT 1 FROM topm t WHERE t.a = e.s1 AND t.b = e.s2)
    AND EXISTS (SELECT 1 FROM topm t WHERE t.a = e.s2 AND t.b = e.s1)),
undc AS (
  SELECT s1 AS a, s2 AS b FROM ec UNION ALL SELECT s2, s1 FROM ec),
flagged AS (
  SELECT e.s1, e.s2,
         EXISTS (SELECT 1 FROM undc u1 JOIN undc u2 ON u1.b = u2.b
                 WHERE u1.a = e.s1 AND u2.a = e.s2) AS closed
  FROM ec e),
inc AS (
  SELECT s1 AS suppkey, closed FROM flagged
  UNION ALL SELECT s2, closed FROM flagged)
SELECT suppkey,
       CAST(SUM(CASE WHEN closed THEN 0 ELSE 1 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN closed THEN 1 ELSE 0 END) AS BIGINT) AS n_closed
FROM inc GROUP BY suppkey ORDER BY suppkey
"""


@query(
    "l19_open_wedge_anti", _L19_ORACLE,
    doc="LDBC BI negative-pattern shape: open vs closed co-supplier "
        "edges on the mutual top-M capped graph — triangle closure via "
        "bounded candidate expansion + semi-join, open edges via ONE "
        "anti-join (never per-edge NOT EXISTS), per-supplier profile",
)
def l19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2")
    )
    # weighted edge set, built ONCE (feeds the cap rank and two
    # semi-joins — the l17 lesson)
    edges = (
        a.join(b, "ok")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.countDistinct("ok").alias("n"))
        .filter(F.col("n") >= 2)
    ).localCheckpoint(eager=True)
    und = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("b"), "n"
    ).unionAll(
        edges.select(
            F.col("s2").alias("a"), F.col("s1").alias("b"), "n"
        )
    )
    # degree cap: top-M strongest neighbors per vertex, total order
    # (n DESC, b) — b is unique within a partition, so the rank is
    # deterministic and the oracle replays it bit-for-bit
    topm = (
        und.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("a").orderBy(F.desc("n"), F.asc("b"))
            ),
        )
        .filter(F.col("rk") <= _L19_M)
        .select("a", "b")
    )
    t1 = topm.select(F.col("a").alias("m1a"), F.col("b").alias("m1b"))
    t2 = topm.select(F.col("a").alias("m2a"), F.col("b").alias("m2b"))
    ec = (
        edges.join(
            t1,
            (edges.s1 == F.col("m1a")) & (edges.s2 == F.col("m1b")),
            "left_semi",
        )
        .join(
            t2,
            (F.col("s2") == F.col("m2a")) & (F.col("s1") == F.col("m2b")),
            "left_semi",
        )
        .select("s1", "s2")
    ).localCheckpoint(eager=True)
    undc = ec.select(
        F.col("s1").alias("a"), F.col("s2").alias("b")
    ).unionAll(ec.select(F.col("s2").alias("a"), F.col("s1").alias("b")))
    # candidate third vertices: <= M neighbors of s1 per edge; closure
    # confirmed by a semi-join probe of (s2, candidate) vs the adjacency
    u1 = undc.select(F.col("a").alias("c_s1"), F.col("b").alias("cand"))
    cand = ec.join(u1, ec.s1 == F.col("c_s1")).select("s1", "s2", "cand")
    u2 = undc.select(F.col("a").alias("p_s2"), F.col("b").alias("p_cand"))
    closed = (
        cand.join(
            u2,
            (cand.s2 == F.col("p_s2")) & (cand.cand == F.col("p_cand")),
            "left_semi",
        )
        .select("s1", "s2")
        .distinct()
    )
    open_e = ec.join(closed, ["s1", "s2"], "left_anti").withColumn(
        "closed", F.lit(0).cast("long")
    )
    closed_e = closed.withColumn("closed", F.lit(1).cast("long"))
    flagged = open_e.unionByName(closed_e)
    inc = flagged.select(
        F.col("s1").alias("suppkey"), "closed"
    ).unionAll(flagged.select(F.col("s2").alias("suppkey"), "closed"))
    return (
        inc.groupBy("suppkey")
        .agg(
            F.sum(1 - F.col("closed")).cast("long").alias("n_open"),
            F.sum("closed").cast("long").alias("n_closed"),
        )
        .orderBy("suppkey")
    )


# --- ds54: TPC-DS Q87 — EXCEPT-chain cohort count ----------------------------
# Q87 counts the (customer, date) combinations present in the store
# channel but in NEITHER catalog nor web — a two-step EXCEPT chain
# reduced to one scalar. Re-authored on events: (user, epoch-day) pairs
# that purchased but never clicked and never viewed. EXCEPT DISTINCT
# is a hash anti-join per step in Spark; both steps share the one
# events scan (the three channel sets are conditional projections of
# the same pass, not three scans). Epoch-day integer arithmetic keeps
# the day grain engine-proof (the ds50 discipline).

_DS54_ORACLE = """
WITH e AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
  FROM events),
p AS (SELECT DISTINCT user_id, d FROM e WHERE event_type = 'purchase'),
c AS (SELECT DISTINCT user_id, d FROM e WHERE event_type = 'click'),
v AS (SELECT DISTINCT user_id, d FROM e WHERE event_type = 'view')
SELECT CAST(COUNT(*) AS BIGINT) AS n_pure
FROM ((SELECT * FROM p EXCEPT SELECT * FROM c)
      EXCEPT SELECT * FROM v) t
"""


@query(
    "ds54_except_chain_count", _DS54_ORACLE,
    doc="TPC-DS Q87 shape: two-step EXCEPT chain ((purchase-days EXCEPT "
        "click-days) EXCEPT view-days) reduced to one count — hash "
        "anti-joins over conditional projections of ONE scan",
)
def ds54(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
        ).alias("d"),
    )

    def chan(t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select("user_id", "d").distinct()
        )

    pure = (
        chan("purchase").subtract(chan("click")).subtract(chan("view"))
    )
    return pure.agg(F.count(F.lit(1)).cast("long").alias("n_pure"))


# --- ds55: TPC-DS Q62 — shipping-delay band matrix ---------------------------
# Q62 profiles fulfilment latency: days between order and ship bucketed
# into five bands, summed per (group, month) in ONE conditional-agg
# pass over the order-line join. Delay computed in epoch-day integers
# (never engine datediff variants); month key from the same integer
# algebra. One fact-fact hash join + one groupBy.

_DS55_ORACLE = """
WITH j AS (
  SELECT o.o_orderpriority AS pri,
         CAST((epoch_us(o.o_orderdate) // 86400000000) // 30 AS BIGINT)
           AS mon,
         CAST(epoch_us(l.l_shipdate) // 86400000000
              - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS delay
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT pri, mon,
  CAST(SUM(CASE WHEN delay <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
  CAST(SUM(CASE WHEN delay > 30 AND delay <= 60 THEN 1 ELSE 0 END)
       AS BIGINT) AS d60,
  CAST(SUM(CASE WHEN delay > 60 AND delay <= 90 THEN 1 ELSE 0 END)
       AS BIGINT) AS d90,
  CAST(SUM(CASE WHEN delay > 90 AND delay <= 120 THEN 1 ELSE 0 END)
       AS BIGINT) AS d120,
  CAST(SUM(CASE WHEN delay > 120 THEN 1 ELSE 0 END) AS BIGINT) AS dmax
FROM j GROUP BY pri, mon ORDER BY pri, mon
"""


@query(
    "ds55_ship_delay_bands", _DS55_ORACLE,
    doc="TPC-DS Q62 shape: five shipping-delay bands as ONE "
        "conditional-agg pass over the order-line join; epoch-day "
        "integer delay arithmetic (no engine datediff variants)",
)
def ds55(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000000"
        ).alias("ship_d"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("pri"),
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"
        ).alias("ord_d"),
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "pri",
        F.expr("ord_d DIV 30").cast("long").alias("mon"),
        (F.col("ship_d") - F.col("ord_d")).cast("long").alias("delay"),
    )

    def band(cond) -> "F.Column":
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    d = F.col("delay")
    return (
        j.groupBy("pri", "mon")
        .agg(
            band(d <= 30).alias("d30"),
            band((d > 30) & (d <= 60)).alias("d60"),
            band((d > 60) & (d <= 90)).alias("d90"),
            band((d > 90) & (d <= 120)).alias("d120"),
            band(d > 120).alias("dmax"),
        )
        .orderBy("pri", "mon")
    )


# --- ds56: TPC-DS Q41 — NOT EXISTS with disjunctive attribute soup -----------
# Q41 returns distinct part names whose manufacturer produces NO part
# matching a disjunctive attribute soup — a NOT EXISTS whose inner
# predicate is a three-way OR over other rows of the SAME dimension.
# Lowered as one anti-join of the groups-with-offenders set against the
# candidate groups (never a per-row probe); the offender set is one
# filtered projection of the same part scan. Q41's fine manufacturer
# grain is replayed as (p_brand, first-word-of-name color family):
# round-9's brand-only grain was VACUOUS — every brand had an offender
# at sf0.01 and both engines returned 0 rows (VERDICT r9 item 4).
# Retuned literals verified non-vacuous on BOTH sides at all three SFs
# (kept/removed: sf0.001 67/1, sf0.01 141/55, sf0.1 8/192).

_DS56_ORACLE = """
WITH offenders AS (
  SELECT DISTINCT p_brand, split_part(p_name, ' ', 1) AS color FROM part
  WHERE (p_type = 'PROMO' AND p_size < 5)
     OR (p_type = 'LARGE' AND p_size > 47)
     OR (p_type = 'ECONOMY' AND p_retailprice > 996.0)),
cand AS (
  SELECT p_brand, split_part(p_name, ' ', 1) AS color,
         CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part WHERE p_size BETWEEN 10 AND 30
  GROUP BY p_brand, split_part(p_name, ' ', 1))
SELECT c.p_brand, c.color, c.n_parts
FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM offenders o
                  WHERE o.p_brand = c.p_brand AND o.color = c.color)
ORDER BY c.p_brand, c.color
"""


@query(
    "ds56_not_exists_disjunctive", _DS56_ORACLE,
    doc="TPC-DS Q41 shape: NOT EXISTS over a disjunctive attribute soup "
        "within the same dimension at (brand, color-family) grain — "
        "groups-with-offenders anti-joined against candidate groups, "
        "one scan each side; literals tuned non-vacuous at all 3 SFs",
)
def ds56(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    color = F.split(F.col("p_name"), " ").getItem(0)
    offenders = part.filter(
        ((F.col("p_type") == "PROMO") & (F.col("p_size") < 5))
        | ((F.col("p_type") == "LARGE") & (F.col("p_size") > 47))
        | ((F.col("p_type") == "ECONOMY") & (F.col("p_retailprice") > 996.0))
    ).select("p_brand", color.alias("color")).distinct()
    cand = (
        part.filter(F.col("p_size").between(10, 30))
        .groupBy(F.col("p_brand"), color.alias("color"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    return (
        cand.join(offenders, ["p_brand", "color"], "left_anti")
        .orderBy("p_brand", "color")
    )


# --- b19: JOB shape — disjunction SPANNING two tables -------------------------
# JOB's hardest predicates OR conditions from DIFFERENT relations
# (e.g. `t.production_year > X OR mc.note IS NULL`): neither side can
# push below its scan, so the filter evaluates only after the join and
# the planner must carry full cardinalities through it. Re-authored:
# order lines kept when the PART is promo-typed OR the SUPPLIER is
# high-balance — the OR spans the two dimension arms, plus a normal
# pushable date bound to keep one selective scan. The answer is the
# JOB MIN/COUNT shape; dims broadcast, the OR is one post-join filter.

_B19_ORACLE = """
SELECT MIN(p.p_name) AS min_part,
       MIN(s.s_name) AS min_supp,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE (p.p_type = 'PROMO' OR s.s_acctbal > 9000.0)
  AND l.l_quantity >= 45
"""


@query(
    "b19_cross_table_or", _B19_ORACLE,
    doc="JOB cross-table disjunction: the OR spans the part and "
        "supplier arms so it can only evaluate post-join; the quantity "
        "bound stays pushable — broadcast dims, one post-join filter",
)
def b19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 45
    )
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(
            (F.col("p_type") == "PROMO") | (F.col("s_acctbal") > 9000.0)
        )
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("s_name").alias("min_supp"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- ds57: TPC-DS Q8 — large literal IN-list membership ----------------------
# Q8 restricts on a ~400-element literal zip-prefix IN list — the shape
# that exercises the planner's IN -> hash-set conversion (Catalyst
# InSet above 10 elements) instead of an OR chain. Re-authored: a
# 24-element name-suffix list over customers joined into order revenue
# by market segment. The list membership must evaluate as a single
# set probe inside the scan's filter, not 24 comparisons.

_DS57_ORACLE = """
SELECT c.c_mktsegment AS seg,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT))
            AS BIGINT) AS cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE (c.c_custkey % 100) IN (1, 4, 7, 9, 12, 15, 18, 22, 25, 28, 31,
                              35, 38, 41, 44, 48, 51, 55, 58, 62, 66,
                              71, 77, 83)
GROUP BY 1 ORDER BY seg
"""


@query(
    "ds57_large_in_list", _DS57_ORACLE,
    doc="TPC-DS Q8 shape: large literal IN-list membership (Catalyst "
        "InSet hash probe, not an OR chain) pushed into the customer "
        "scan, joined into order revenue by segment",
)
def ds57(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = [1, 4, 7, 9, 12, 15, 18, 22, 25, 28, 31, 35, 38, 41, 44,
            48, 51, 55, 58, 62, 66, 71, 77, 83]
    cust = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_custkey") % 100).isin(keys)
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0).cast("long")
            ).cast("long").alias("cents"),
        )
        .orderBy("seg")
    )


# --- ds58: TPC-DS Q14 — cross-channel INTERSECT feeding a fact aggregate -----
# Q14 (`benchmark/tpcds/query14.tpl`): cross_items = the item keys sold
# in ALL channels (store INTERSECT catalog INTERSECT web), then sales
# restricted to those items and compared against a corpus-wide average
# threshold. The two topology pieces no earlier ds-gate has together: a
# multi-way INTERSECT chain feeding a semi-join into the fact scan, and
# a scalar aggregate threshold in HAVING. Channels mapped to order-
# priority classes; the average threshold is replayed as an INTEGER
# cross-multiplication (SUM(cents) * n_brands > total_cents) so no
# float division enters the compare. Spark lowering: three DISTINCT
# partkey sets via .intersect() (Catalyst plans a shuffle-dedup
# left-semi cascade), one broadcast semi-join into lineitem, and the
# two scalar thresholds broadcast as 1-row cross joins.

_DS58_ORACLE = """
WITH lo AS (
  SELECT l.l_partkey, o.o_orderpriority,
         CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
ch1 AS (SELECT DISTINCT l_partkey FROM lo
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
ch2 AS (SELECT DISTINCT l_partkey FROM lo
        WHERE o_orderpriority = '3-MEDIUM'),
ch3 AS (SELECT DISTINCT l_partkey FROM lo
        WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')),
cross_items AS (
  SELECT l_partkey FROM ch1
  INTERSECT SELECT l_partkey FROM ch2
  INTERSECT SELECT l_partkey FROM ch3),
brand_sales AS (
  SELECT p.p_brand, CAST(SUM(lo.cents) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lo
  JOIN cross_items ci ON ci.l_partkey = lo.l_partkey
  JOIN part p ON p.p_partkey = lo.l_partkey
  GROUP BY p.p_brand),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS nb FROM brand_sales)
SELECT b.p_brand, b.cents, b.n_lines
FROM brand_sales b, tot
WHERE b.cents * tot.nb > tot.t
ORDER BY b.p_brand
"""


@query(
    "ds58_cross_channel_intersect", _DS58_ORACLE,
    doc="TPC-DS Q14 shape: 3-way channel INTERSECT of item keys feeding "
        "a semi-join into the fact aggregate, above-average brands kept "
        "via an integer cross-multiplied scalar threshold",
)
def ds58(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    # no broadcast hints on orders/part/cross_items: all three scale
    # with the corpus (the 25x probe on b20 showed a forced fact-sized
    # broadcast is a scale-killer); AQE broadcasts them at bench scale
    # on its own and shuffles at cluster scale. Only the 1-row threshold
    # below keeps an explicit hint.
    lo = li.join(
        orders.select("o_orderkey", "o_orderpriority"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "l_partkey", "o_orderpriority",
        F.floor(F.col("l_extendedprice") * 100.0).cast("long").alias("cents"),
    )

    def chan(pred):
        return lo.filter(pred).select("l_partkey").distinct()

    cross_items = (
        chan(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .intersect(chan(F.col("o_orderpriority") == "3-MEDIUM"))
        .intersect(
            chan(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"))
        )
    )
    brand_sales = (
        lo.join(cross_items, "l_partkey", "left_semi")
        .join(
            part.select("p_partkey", "p_brand"),
            lo["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
    tot = brand_sales.agg(
        F.sum("cents").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    return (
        brand_sales.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") * F.col("nb") > F.col("t"))
        .select("p_brand", "cents", "n_lines")
        .orderBy("p_brand")
    )


# --- ds59: TPC-DS Q51 — cumulative windows crossed over a FULL OUTER join ----
# Q51 (`benchmark/tpcds/query51.tpl`): web and store per-item-per-day
# cumulative sales (a window over a grouped aggregate — sum(sum())
# OVER), FULL OUTER joined on (item, day), then a running MAX over each
# channel's cumulative on the coalesced timeline, keeping rows where the
# web cumulative overtakes the store cumulative. The distinctive
# topology: two grouped aggregates each feeding a cumulative window,
# a full-outer align, and a SECOND window pass over the join result.
# Channels mapped to urgent vs standard order priorities at (supplier,
# month) grain; all sums are exact cents so the crossover compare is
# integer-exact. Spark lowering: two shuffles (one per channel agg),
# the windows reuse the (suppkey) partitioning, full outer on the
# composite key, second window pass — no UDFs, all codegen.

_DS59_ORACLE = """
WITH lo AS (
  SELECT l.l_suppkey, date_trunc('month', o.o_orderdate) AS mth,
         o.o_orderpriority,
         CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
urgent AS (
  SELECT l_suppkey, mth,
         CAST(SUM(SUM(cents)) OVER (PARTITION BY l_suppkey ORDER BY mth
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM lo WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY l_suppkey, mth),
standard AS (
  SELECT l_suppkey, mth,
         CAST(SUM(SUM(cents)) OVER (PARTITION BY l_suppkey ORDER BY mth
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM lo WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY l_suppkey, mth),
aligned AS (
  SELECT COALESCE(u.l_suppkey, s.l_suppkey) AS suppkey,
         COALESCE(u.mth, s.mth) AS mth,
         u.cum AS urgent_cum, s.cum AS standard_cum
  FROM urgent u FULL OUTER JOIN standard s
    ON u.l_suppkey = s.l_suppkey AND u.mth = s.mth),
runs AS (
  SELECT suppkey, mth,
         MAX(urgent_cum) OVER (PARTITION BY suppkey ORDER BY mth
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u_run,
         MAX(standard_cum) OVER (PARTITION BY suppkey ORDER BY mth
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_run
  FROM aligned)
SELECT suppkey, CAST(mth AS DATE) AS mth,
       CAST(u_run AS BIGINT) AS u_run, CAST(s_run AS BIGINT) AS s_run
FROM runs
WHERE u_run > s_run
ORDER BY suppkey, mth
"""


@query(
    "ds59_cumulative_window_cross", _DS59_ORACLE,
    doc="TPC-DS Q51 shape: per-channel cumulative windows over grouped "
        "aggregates, FULL OUTER aligned on (supplier, month), running "
        "MAX crossover filter in a second window pass",
)
def ds59(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # orders scales with the fact — no broadcast hint, AQE decides
    lo = li.join(
        orders.select("o_orderkey", "o_orderpriority", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("mth"),
        "o_orderpriority",
        F.floor(F.col("l_extendedprice") * 100.0).cast("long").alias("cents"),
    )
    cum_w = (
        Window.partitionBy("l_suppkey")
        .orderBy("mth")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def channel(pred):
        return (
            lo.filter(pred)
            .groupBy("l_suppkey", "mth")
            .agg(F.sum("cents").alias("m_cents"))
            .select(
                "l_suppkey", "mth",
                F.sum("m_cents").over(cum_w).cast("long").alias("cum"),
            )
        )

    is_urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    u = channel(is_urgent).withColumnsRenamed(
        {"l_suppkey": "u_supp", "mth": "u_mth", "cum": "urgent_cum"}
    )
    s = channel(~is_urgent).withColumnsRenamed(
        {"l_suppkey": "s_supp", "mth": "s_mth", "cum": "standard_cum"}
    )
    aligned = u.join(
        s,
        (F.col("u_supp") == F.col("s_supp"))
        & (F.col("u_mth") == F.col("s_mth")),
        "full_outer",
    ).select(
        F.coalesce(F.col("u_supp"), F.col("s_supp")).alias("suppkey"),
        F.coalesce(F.col("u_mth"), F.col("s_mth")).alias("mth"),
        "urgent_cum", "standard_cum",
    )
    run_w = (
        Window.partitionBy("suppkey")
        .orderBy("mth")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        aligned.select(
            "suppkey", "mth",
            F.max("urgent_cum").over(run_w).alias("u_run"),
            F.max("standard_cum").over(run_w).alias("s_run"),
        )
        .filter(F.col("u_run") > F.col("s_run"))
        .select(
            "suppkey", F.col("mth").cast("date").alias("mth"),
            F.col("u_run").cast("long").alias("u_run"),
            F.col("s_run").cast("long").alias("s_run"),
        )
        .orderBy("suppkey", "mth")
    )


# --- c29: ClickBench minute-grain traffic ------------------------------------
# ClickBench's time-bucketed traffic shapes (Q36-ish: "hits per minute,
# busiest first"): truncate the event stream to minute grain, count hits
# and distinct users per minute, return the top-20 busiest minutes. The
# plan to demand: ONE shuffle on the minute bucket (count + distinct in
# the same grouped aggregate via partial aggregation), then a top-k sort
# — never a global sort of all minutes before the LIMIT (Spark plans
# TakeOrderedAndProject). Tiebreak (n DESC, minute ASC) is a total
# order, so the LIMIT boundary is deterministic at every SF.

_C29_ORACLE = """
SELECT date_trunc('minute', ts) AS minute,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u
FROM events
GROUP BY date_trunc('minute', ts)
ORDER BY n DESC, minute
LIMIT 20
"""


@query(
    "c29_minute_sessions", _C29_ORACLE,
    doc="ClickBench minute-grain traffic: one shuffle on the minute "
        "bucket (count + distinct users), top-20 busiest via "
        "TakeOrderedAndProject with a total-order tiebreak",
)
def c29(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("u"),
        )
        .orderBy(F.col("n").desc(), "minute")
        .limit(20)
    )


# --- c30: ClickBench referrer classification ---------------------------------
# ClickBench's referrer/URL-family shapes (Q28/Q38 class: extract the
# domain from a referrer URL, bucket it into search/social/direct, and
# profile traffic per bucket). The corpus has no URL column, so the
# referrer is SYNTHESIZED deterministically from event fields (the d18
# pattern) and then classified back the hard way — domain via
# regexp_extract, class via a CASE over domain patterns — keeping the
# whole extract+classify chain inside whole-stage codegen. Value cents
# are exact BIGINTs.

_C30_ORACLE = """
WITH ref AS (
  SELECT user_id, value,
         CASE CAST(user_id % 7 AS INTEGER)
           WHEN 0 THEN 'https://www.google.com/search?q=' || event_type
           WHEN 1 THEN 'https://yandex.ru/search/?text=' || event_type
           WHEN 2 THEN 'https://go.mail.ru/search?q=' || event_type
           WHEN 3 THEN 'https://www.facebook.com/p/' ||
                       CAST(user_id AS VARCHAR)
           WHEN 4 THEN 'https://t.co/' || CAST(user_id AS VARCHAR)
           WHEN 5 THEN ''
           ELSE 'https://' || event_type || '.example.com/internal'
         END AS referrer
  FROM events),
cls AS (
  SELECT user_id, value,
         CASE
           WHEN referrer = '' THEN 'direct'
           WHEN regexp_extract(referrer, '^https?://([^/]+)', 1)
                IN ('www.google.com', 'yandex.ru', 'go.mail.ru')
             THEN 'search'
           WHEN regexp_extract(referrer, '^https?://([^/]+)', 1)
                IN ('www.facebook.com', 't.co')
             THEN 'social'
           ELSE 'other'
         END AS klass
  FROM ref)
SELECT klass,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM cls
GROUP BY klass
ORDER BY klass
"""


@query(
    "c30_referrer_classify", _C30_ORACLE,
    doc="ClickBench referrer classification: domain regexp_extract + "
        "CASE bucketing (search/social/direct) over a deterministically "
        "synthesized referrer column, profiled per bucket in codegen",
)
def c30(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    referrer = (
        F.when(F.col("user_id") % 7 == 0,
               F.concat(F.lit("https://www.google.com/search?q="),
                        F.col("event_type")))
        .when(F.col("user_id") % 7 == 1,
              F.concat(F.lit("https://yandex.ru/search/?text="),
                       F.col("event_type")))
        .when(F.col("user_id") % 7 == 2,
              F.concat(F.lit("https://go.mail.ru/search?q="),
                       F.col("event_type")))
        .when(F.col("user_id") % 7 == 3,
              F.concat(F.lit("https://www.facebook.com/p/"), uid))
        .when(F.col("user_id") % 7 == 4, F.concat(F.lit("https://t.co/"), uid))
        .when(F.col("user_id") % 7 == 5, F.lit(""))
        .otherwise(F.concat(F.lit("https://"), F.col("event_type"),
                            F.lit(".example.com/internal")))
    )
    domain = F.regexp_extract(referrer, r"^https?://([^/]+)", 1)
    klass = (
        F.when(referrer == "", "direct")
        .when(domain.isin("www.google.com", "yandex.ru", "go.mail.ru"),
              "search")
        .when(domain.isin("www.facebook.com", "t.co"), "social")
        .otherwise("other")
    )
    return (
        ev.select(klass.alias("klass"), "user_id", "value")
        .groupBy("klass")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("u"),
            F.sum(
                F.floor(F.col("value") * 100.0).cast("long")
            ).cast("long").alias("value_cents"),
        )
        .orderBy("klass")
    )


# --- b20: JOB shape — ten-table-instance chain with a fact self-join ---------
# JOB's longest chains join the FACT side in two roles too (cast_info /
# movie_info appearing twice), not just dimensions: the second fact
# instance multiplies cardinality before any dimension prunes it, which
# is exactly what makes those queries planner stress tests. Re-authored
# beyond b18 (8 instances, dimension-only roles): TEN instances —
# lineitem twice (two different lines of the SAME order, inequality on
# the line number), part twice (one role per fact instance, different
# filters), supplier / orders / customer, nation twice, region on the
# supplier arm, plus the cross-role nation inequality. All dims
# broadcast; the fact self-join is the one equi-shuffle on l_orderkey,
# and the answer is the JOB MIN(string) shape.

_B20_ORACLE = """
SELECT MIN(p1.p_name) AS min_part1,
       MIN(p2.p_name) AS min_part2,
       MIN(s.s_name)  AS min_supp,
       MIN(c.c_name)  AS min_cust,
       MIN(r2.r_name) AS min_supp_region,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l1
JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                AND l2.l_linenumber <> l1.l_linenumber
JOIN part p1     ON p1.p_partkey = l1.l_partkey
JOIN part p2     ON p2.p_partkey = l2.l_partkey
JOIN supplier s  ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN nation n1   ON n1.n_nationkey = c.c_nationkey
JOIN nation n2   ON n2.n_nationkey = s.s_nationkey
JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
WHERE p1.p_type = 'PROMO'
  AND (p2.p_type = 'ECONOMY' OR p2.p_size <= 5)
  AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND n1.n_regionkey <> n2.n_regionkey
  AND r2.r_name IN ('EUROPE', 'AMERICA')
"""


@query(
    "b20_long_chain_stars", _B20_ORACLE,
    doc="JOB 10-instance chain with a fact self-join: two lineitem roles "
        "(same order, different lines), two part roles, two nation roles "
        "+ cross-role inequality — dims broadcast, one fact-fact "
        "equi-shuffle, JOB MIN(string) answer shape",
)
def b20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    l1 = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line1"),
        F.col("l_partkey").alias("pk1"),
        F.col("l_suppkey").alias("sk1"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("okey2"),
        F.col("l_linenumber").alias("line2"),
        F.col("l_partkey").alias("pk2"),
    )
    p1 = part.filter(F.col("p_type") == "PROMO").select(
        F.col("p_partkey").alias("p1_key"), F.col("p_name").alias("p1_name")
    )
    p2 = part.filter(
        (F.col("p_type") == "ECONOMY") | (F.col("p_size") <= 5)
    ).select(F.col("p_partkey").alias("p2_key"),
             F.col("p_name").alias("p2_name"))
    o = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_custkey")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_regionkey").alias("n2_region"))
    r2 = region.filter(F.col("r_name").isin("EUROPE", "AMERICA")).select(
        F.col("r_regionkey").alias("r2_key"), F.col("r_name").alias("r2_name")
    )
    # broadcast hints ONLY on the bounded dims (nation 25 rows, region
    # 5): part/supplier/orders/customer all scale with the corpus, and
    # hard-broadcasting them is exactly the 100 TB scale-killer the 25x
    # probe caught in this gate's first version (29.6x wall ratio from a
    # forced fact-sized broadcast of orders+customer; AQE picks BHJ for
    # them at bench scale on its own and SMJ at cluster scale)
    joined = (
        l1.join(l2, (F.col("okey") == F.col("okey2"))
                & (F.col("line1") != F.col("line2")))
        .join(p1, F.col("pk1") == F.col("p1_key"))
        .join(p2, F.col("pk2") == F.col("p2_key"))
        .join(supp.select("s_suppkey", "s_name", "s_nationkey"),
              F.col("sk1") == F.col("s_suppkey"))
        .join(o, F.col("okey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_name", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r2), F.col("n2_region") == F.col("r2_key"))
        .filter(F.col("n1_region") != F.col("n2_region"))
    )
    return joined.agg(
        F.min("p1_name").alias("min_part1"),
        F.min("p2_name").alias("min_part2"),
        F.min("s_name").alias("min_supp"),
        F.min("c_name").alias("min_cust"),
        F.min("r2_name").alias("min_supp_region"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


# --- ds60: TPC-DS Q88 — time-slot census (8 scalar counts, one row) ----------
# Q88 (`benchmark/tpcds/query88.tpl`) cross-joins EIGHT independent
# scalar-count subqueries — one per half-hour slot, all sharing the same
# demographic disjunction — into a single wide row. Executed literally
# that is 8 full fact scans; the Spark-first lowering collapses them
# into ONE scan with 8 conditional aggregates (count of CASE WHEN slot),
# which is the plan a 100 TB deployment needs (the slot predicate is a
# projection of the same row, so the census is map-side-combinable in a
# single pass). The oracle replays the identical conditional-agg form.

_DS60_ORACLE = """
SELECT
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (6, 7)   THEN 1 ELSE 0 END)
       AS BIGINT) AS h06_08,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (8, 9)   THEN 1 ELSE 0 END)
       AS BIGINT) AS h08_10,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (10, 11) THEN 1 ELSE 0 END)
       AS BIGINT) AS h10_12,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (12, 13) THEN 1 ELSE 0 END)
       AS BIGINT) AS h12_14,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (14, 15) THEN 1 ELSE 0 END)
       AS BIGINT) AS h14_16,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (16, 17) THEN 1 ELSE 0 END)
       AS BIGINT) AS h16_18,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (18, 19) THEN 1 ELSE 0 END)
       AS BIGINT) AS h18_20,
  CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) IN (20, 21) THEN 1 ELSE 0 END)
       AS BIGINT) AS h20_22
FROM events
WHERE event_type = 'purchase'
  AND (user_id % 5 = 0 OR user_id % 7 = 0)
"""


@query(
    "ds60_time_slot_census", _DS60_ORACLE,
    doc="TPC-DS Q88 shape: eight time-slot scalar counts sharing one "
        "disjunctive filter, collapsed from 8 cross-joined subqueries "
        "into ONE conditional-aggregate scan (the 100 TB plan)",
)
def ds60(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.hour(F.col("ts"))

    def slot(h0: int, name: str):
        return F.sum(
            F.when(hour.isin(h0, h0 + 1), 1).otherwise(0)
        ).cast("long").alias(name)

    return (
        ev.filter(
            (F.col("event_type") == "purchase")
            & ((F.col("user_id") % 5 == 0) | (F.col("user_id") % 7 == 0))
        )
        .agg(
            slot(6, "h06_08"), slot(8, "h08_10"), slot(10, "h10_12"),
            slot(12, "h12_14"), slot(14, "h14_16"), slot(16, "h16_18"),
            slot(18, "h18_20"), slot(20, "h20_22"),
        )
    )


# --- ds61: TPC-DS Q34/Q73 — band HAVING then rejoin the dimension -------------
# Q34/Q73 (`benchmark/tpcds/query34.tpl`): group the fact to per-ticket
# counts, keep only groups whose count falls in a BAND (HAVING BETWEEN),
# then join the survivors BACK to the customer dimension for the detail
# row. The topology piece: a grouped HAVING-band feeding a join whose
# left side is the aggregate output (small after the band filter), so
# the rejoin broadcasts the SURVIVORS, not the dimension. Mapped: orders
# whose count of bulk lines (quantity >= 10) lands in [5, 7], under a
# priority disjunction, rejoined to customer.

_DS61_ORACLE = """
WITH banded AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem WHERE l_quantity >= 10
  GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 5 AND 7)
SELECT c.c_name, c.c_mktsegment, b.l_orderkey AS orderkey, b.cnt
FROM banded b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderpriority = '1-URGENT' OR o.o_orderpriority = '5-LOW'
ORDER BY orderkey
"""


@query(
    "ds61_band_having_rejoin", _DS61_ORACLE,
    doc="TPC-DS Q34/Q73 shape: per-group count banded in HAVING "
        "(BETWEEN), survivors rejoined to orders + customer for the "
        "detail rows — AQE broadcasts the post-band survivors when small",
)
def ds61(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    banded = (
        li.filter(F.col("l_quantity") >= 10)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt").between(5, 7))
    )
    o = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        | (F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_custkey")
    # the post-band survivor set is small at any one band but still
    # scales with order cardinality — no hard hint, AQE broadcasts it
    # when it measures small (which it does at every bench SF)
    return (
        banded
        .join(o, banded["l_orderkey"] == o["o_orderkey"])
        .join(
            cust.select("c_custkey", "c_name", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name", "c_mktsegment",
            F.col("l_orderkey").alias("orderkey"), "cnt",
        )
        .orderBy("orderkey")
    )


# --- ds62: TPC-DS Q97 — full-outer channel overlap census ---------------------
# Q97 (`benchmark/tpcds/query97.tpl`): distinct (customer, item) pairs per
# sales channel, FULL OUTER joined on the composite key, reduced to one
# row of both/left-only/right-only counts. The topology piece Spark must
# get right at 100 TB: two pre-join DISTINCT aggregates (the composite
# grain collapses the fact before the join, shrinking the shuffle to
# distinct-pair cardinality), a key-partitioned sort-merge FULL OUTER
# (neither side is broadcastable by definition — both are fact-derived),
# and a single-row conditional reduce. Mapped: (custkey, suppkey) pairs
# transacted under URGENT vs LOW order priority.

_DS62_ORACLE = """
WITH a AS (
  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority = '1-URGENT'),
b AS (
  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority = '5-LOW')
SELECT
  CAST(SUM(CASE WHEN a.ck IS NOT NULL AND b.ck IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS both_ch,
  CAST(SUM(CASE WHEN b.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS urgent_only,
  CAST(SUM(CASE WHEN a.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS low_only
FROM a FULL OUTER JOIN b ON a.ck = b.ck AND a.sk = b.sk
"""


@query(
    "ds62_channel_overlap_full_outer", _DS62_ORACLE,
    doc="TPC-DS Q97 shape: per-channel DISTINCT composite pairs, "
        "fact-vs-fact FULL OUTER on (custkey, suppkey), one-row "
        "both/only/only census — distinct-first shrinks the join input",
)
def ds62(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )

    def channel(priority: str) -> DataFrame:
        return (
            li.join(
                orders.filter(F.col("o_orderpriority") == priority),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select(
                F.col("o_custkey").alias("ck"),
                F.col("l_suppkey").alias("sk"),
            )
            .distinct()
        )

    a = channel("1-URGENT")
    b = channel("5-LOW").withColumnsRenamed({"ck": "bck", "sk": "bsk"})
    return (
        a.join(
            b,
            (F.col("ck") == F.col("bck")) & (F.col("sk") == F.col("bsk")),
            "full_outer",
        )
        .agg(
            F.sum(
                F.when(
                    F.col("ck").isNotNull() & F.col("bck").isNotNull(), 1
                ).otherwise(0)
            ).cast("long").alias("both_ch"),
            F.sum(
                F.when(F.col("bck").isNull(), 1).otherwise(0)
            ).cast("long").alias("urgent_only"),
            F.sum(
                F.when(F.col("ck").isNull(), 1).otherwise(0)
            ).cast("long").alias("low_only"),
        )
    )


# --- ds63: TPC-DS Q78 — returns-excluded cross-channel ratio ------------------
# Q78 (`benchmark/tpcds/query78.tpl`): sales LEFT JOINed to returns with
# the IS NULL survivor filter (the outer-join spelling of anti-join that
# the template uses), then per-(customer, year) channel sums and a
# cross-channel ratio ordering with a guard on the denominator. Mapped:
# orders carrying any returned line (l_returnflag = 'R') are the
# "returns" side; clean orders aggregate open-vs-finished line quantities
# per (custkey, year); the ratio is an exact integer basis-point value
# (cross-multiplication, no float ordering hazard).

_DS63_ORACLE = """
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
clean AS (
  SELECT o.o_custkey, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
         l.l_linestatus, CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  LEFT JOIN returned r ON r.l_orderkey = l.l_orderkey
  WHERE r.l_orderkey IS NULL),
agg AS (
  SELECT o_custkey AS custkey, yr,
         SUM(CASE WHEN l_linestatus = 'O' THEN qty ELSE 0 END) AS open_qty,
         SUM(CASE WHEN l_linestatus = 'F' THEN qty ELSE 0 END) AS fin_qty
  FROM clean GROUP BY o_custkey, yr)
SELECT custkey, yr,
       CAST(open_qty AS BIGINT) AS open_qty,
       CAST(fin_qty AS BIGINT) AS fin_qty,
       CAST((open_qty * 10000) // fin_qty AS BIGINT) AS ratio_bp
FROM agg WHERE fin_qty > 0
ORDER BY ratio_bp DESC, custkey, yr LIMIT 100
"""


@query(
    "ds63_returns_excluded_ratio", _DS63_ORACLE,
    doc="TPC-DS Q78 shape: LEFT JOIN + IS NULL survivor filter against "
        "the returned-order set, per-(customer, year) channel sums, "
        "integer basis-point ratio ordering with denominator guard",
)
def ds63(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("r_orderkey"))
        .distinct()
    )
    clean = (
        li.select(
            "l_orderkey", "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .join(
            orders.select(
                "o_orderkey", "o_custkey",
                F.year("o_orderdate").cast("long").alias("yr"),
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        # the template's outer-join spelling of anti-join: LEFT JOIN the
        # returned-order set and keep the null-padded survivors
        .join(
            returned,
            F.col("r_orderkey") == F.col("l_orderkey"),
            "left",
        )
        .filter(F.col("r_orderkey").isNull())
    )
    agg = clean.groupBy(
        F.col("o_custkey").alias("custkey"), "yr"
    ).agg(
        F.sum(
            F.when(F.col("l_linestatus") == "O", F.col("qty")).otherwise(0)
        ).alias("open_qty"),
        F.sum(
            F.when(F.col("l_linestatus") == "F", F.col("qty")).otherwise(0)
        ).alias("fin_qty"),
    )
    return (
        agg.filter(F.col("fin_qty") > 0)
        .select(
            "custkey", "yr",
            F.col("open_qty").cast("long").alias("open_qty"),
            F.col("fin_qty").cast("long").alias("fin_qty"),
            F.expr("(open_qty * 10000L) DIV fin_qty")
            .cast("long").alias("ratio_bp"),
        )
        .orderBy(F.desc("ratio_bp"), "custkey", "yr")
        .limit(100)
    )


# --- ds64: TPC-DS Q23 — frequent items x best customers cross-filter ----------
# Q23 (`benchmark/tpcds/query23.tpl`), the classic two-CTE cross-filter:
# CTE1 = items frequently sold (HAVING over a distinct-count), CTE2 =
# customers whose total spend clears a GLOBAL scalar threshold (a scalar
# subquery over an aggregate-of-aggregates), final = fact rows
# semi-joined to BOTH sets, reduced per month. The 100 TB plan: both
# CTEs collapse to key sets before any wide join, the global threshold
# is a one-row broadcast, and the final pass is two semi-joins on the
# already-grouped fact. Exact integer cents throughout.

_DS64_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
freq_parts AS (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 4),
best_cust AS (
  SELECT o_custkey FROM spend
  WHERE cents * 2 > (SELECT MAX(cents) FROM spend))
SELECT CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS mon,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
            AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_partkey IN (SELECT l_partkey FROM freq_parts)
  AND o.o_custkey IN (SELECT o_custkey FROM best_cust)
GROUP BY mon ORDER BY mon
"""


@query(
    "ds64_frequent_best_cross", _DS64_ORACLE,
    doc="TPC-DS Q23 shape: frequent-item set (distinct-count HAVING) x "
        "best-customer set (global scalar threshold) cross-filtering "
        "the fact via two semi-joins, monthly rollup",
)
def ds64(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0).cast("long")
        ).alias("cents")
    )
    freq_parts = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("nord"))
        .filter(F.col("nord") >= 4)
        .select("l_partkey")
    )
    # the global threshold: a one-row aggregate, cross-joined (broadcast
    # of a single row — the scalar-subquery plan at any scale)
    max_cents = spend.agg(F.max("cents").alias("max_cents"))
    best_cust = (
        spend.crossJoin(F.broadcast(max_cents))
        .filter(F.col("cents") * 2 > F.col("max_cents"))
        .select("o_custkey")
    )
    fact = li.select(
        "l_orderkey", "l_partkey",
        F.floor(F.col("l_extendedprice") * 100.0).cast("long").alias("lc"),
    ).join(
        orders.select(
            "o_orderkey", "o_custkey",
            F.month("o_orderdate").cast("long").alias("mon"),
        ),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        fact
        .join(freq_parts, "l_partkey", "left_semi")
        .join(best_cust, "o_custkey", "left_semi")
        .groupBy("mon")
        .agg(
            F.sum("lc").cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("mon")
    )


# --- c31: ClickBench histogram — computed-bucket GROUP BY ---------------------
# The ClickBench histogram class (Q30/Q31 family): GROUP BY a computed
# bucket of a continuous measure over a filtered scan, full bucket list
# out. Bucketing stays in codegen (floor-divide), the aggregate carries
# an exact integer sum and a distinct count per bucket.

_C31_ORACLE = """
SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM events WHERE event_type = 'click'
GROUP BY bucket ORDER BY bucket
"""


@query(
    "c31_value_histogram", _C31_ORACLE,
    doc="ClickBench histogram shape: computed floor-divide bucket key, "
        "count + distinct users + exact cents per bucket",
)
def c31(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    return (
        ev.groupBy(
            F.floor(F.col("value") / 5.0).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("users"),
            F.sum(
                F.floor(F.col("value") * 100.0).cast("long")
            ).cast("long").alias("cents"),
        )
        .orderBy("bucket")
    )


# --- l20: LDBC BI weighted shortest path (bounded Bellman-Ford) ---------------
# The LDBC BI weighted-path class (BI-19/BI-20: cheapest interaction
# path): multi-source min-cost over the mutual top-M capped co-supplier
# graph (l19's replayable sparsifier), weight = 1000 DIV shared_orders
# (stronger tie = cheaper hop), K = 3 relaxation rounds — the bounded
# Bellman-Ford that answers "cheapest path within K hops" exactly. The
# 100 TB plan: each round is ONE key-partitioned join frontier-to-
# adjacency + a min-merge groupBy (never per-path enumeration); rounds
# are a fixed K, so the whole query is 3 joins + 3 aggregates over a
# degree-bounded edge list. Oracle replays cap, weights and the <=3-hop
# walk minimum recursively.

_L20_K = 3

_L20_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
edges AS (
  SELECT s1, s2, COUNT(DISTINCT l_orderkey) AS n
  FROM pairs GROUP BY s1, s2
  HAVING COUNT(DISTINCT l_orderkey) >= 2),
und AS (
  SELECT s1 AS a, s2 AS b, n FROM edges
  UNION ALL SELECT s2, s1, n FROM edges),
topm AS (
  SELECT a, b FROM (
    SELECT a, b,
           ROW_NUMBER() OVER (PARTITION BY a ORDER BY n DESC, b) AS rk
    FROM und) WHERE rk <= {_L19_M}),
ec AS (
  SELECT e.s1, e.s2, e.n FROM edges e
  WHERE EXISTS (SELECT 1 FROM topm t WHERE t.a = e.s1 AND t.b = e.s2)
    AND EXISTS (SELECT 1 FROM topm t WHERE t.a = e.s2 AND t.b = e.s1)),
undw AS (
  SELECT s1 AS a, s2 AS b, 1000 // n AS w FROM ec
  UNION ALL SELECT s2, s1, 1000 // n FROM ec),
seeds AS (
  SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 100 = 1),
walk AS (
  WITH RECURSIVE r AS (
    SELECT node, CAST(0 AS BIGINT) AS cost, 0 AS hops FROM seeds
    UNION ALL
    SELECT u.b, r.cost + u.w, r.hops + 1
    FROM r JOIN undw u ON u.a = r.node WHERE r.hops < {_L20_K})
  SELECT node, cost FROM r)
SELECT node AS suppkey, CAST(MIN(cost) AS BIGINT) AS min_cost
FROM walk GROUP BY node ORDER BY suppkey
"""


@query(
    "l20_weighted_bounded_path", _L20_ORACLE,
    doc="LDBC BI weighted-path shape: multi-source bounded Bellman-Ford "
        "(K=3 relaxation rounds, each ONE frontier-adjacency join + "
        "min-merge) on the mutual top-M capped weighted graph",
)
def l20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2")
    )
    edges = (
        a.join(b, "ok")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.countDistinct("ok").alias("n"))
        .filter(F.col("n") >= 2)
    ).localCheckpoint(eager=True)
    und = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("b"), "n"
    ).unionAll(
        edges.select(F.col("s2").alias("a"), F.col("s1").alias("b"), "n")
    )
    topm = (
        und.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("a").orderBy(F.desc("n"), F.asc("b"))
            ),
        )
        .filter(F.col("rk") <= _L19_M)
        .select("a", "b")
    )
    t1 = topm.select(F.col("a").alias("m1a"), F.col("b").alias("m1b"))
    t2 = topm.select(F.col("a").alias("m2a"), F.col("b").alias("m2b"))
    ec = (
        edges.join(
            t1,
            (edges.s1 == F.col("m1a")) & (edges.s2 == F.col("m1b")),
            "left_semi",
        )
        .join(
            t2,
            (F.col("s2") == F.col("m2a")) & (F.col("s1") == F.col("m2b")),
            "left_semi",
        )
        .select("s1", "s2", "n")
    )
    undw = (
        ec.select(
            F.col("s1").alias("a"), F.col("s2").alias("b"),
            F.expr("1000L DIV n").alias("w"),
        )
        .unionAll(ec.select(
            F.col("s2").alias("a"), F.col("s1").alias("b"),
            F.expr("1000L DIV n").alias("w"),
        ))
    ).localCheckpoint(eager=True)
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 100 == 1)
        .select(
            F.col("s_suppkey").alias("node"),
            F.lit(0).cast("long").alias("cost"),
        )
    )
    dist = seeds
    for _ in range(_L20_K):
        ext = dist.join(undw, dist.node == undw.a).select(
            F.col("b").alias("node"),
            (F.col("cost") + F.col("w")).alias("cost"),
        )
        dist = (
            dist.unionByName(ext)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
    return dist.select(
        F.col("node").alias("suppkey"),
        F.col("cost").cast("long").alias("min_cost"),
    ).orderBy("suppkey")


# --- ds65: TPC-DS Q49 — worst-return ratios dual-ranked per channel ----------
# Q49 (`benchmark/tpcds/query49.tpl`): per channel, items ranked by TWO
# ratios at once (quantity return rate and currency return rate), kept
# when EITHER rank clears the threshold, channels unioned. The topology
# piece: two window ranks over the same per-channel aggregate (one
# shuffle, two orderings) and an OR filter across the ranks. Ratios are
# exact integer basis points; rank ties are value-identical across
# engines by construction.

_DS65_ORACLE = """
WITH base AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
              WHEN o_orderpriority = '2-HIGH' THEN 'high'
              ELSE 'rest' END AS channel,
         l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_ret
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
agg AS (
  SELECT channel, l_partkey, SUM(qty) AS qty, SUM(cents) AS cents,
         SUM(CASE WHEN is_ret = 1 THEN qty ELSE 0 END) AS rqty,
         SUM(CASE WHEN is_ret = 1 THEN cents ELSE 0 END) AS rcents
  FROM base GROUP BY channel, l_partkey
  HAVING SUM(qty) >= 50 AND SUM(cents) > 0),
rat AS (
  SELECT channel, l_partkey,
         CAST((rqty * 10000) // qty AS BIGINT) AS ret_bp,
         CAST((rcents * 10000) // cents AS BIGINT) AS amt_bp
  FROM agg),
rk AS (
  SELECT channel, l_partkey, ret_bp, amt_bp,
         RANK() OVER (PARTITION BY channel ORDER BY ret_bp DESC) AS r1,
         RANK() OVER (PARTITION BY channel ORDER BY amt_bp DESC) AS r2
  FROM rat)
SELECT channel, l_partkey AS partkey, ret_bp, amt_bp,
       CAST(r1 AS BIGINT) AS r1, CAST(r2 AS BIGINT) AS r2
FROM rk WHERE r1 <= 10 OR r2 <= 10
ORDER BY channel, r1, r2, partkey
"""


@query(
    "ds65_dual_rank_return_ratio", _DS65_ORACLE,
    doc="TPC-DS Q49 shape: two window ranks over one per-channel "
        "aggregate (single shuffle, two orderings), OR-filtered, "
        "integer basis-point ratios",
)
def ds65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .when(F.col("o_orderpriority") == "2-HIGH", "high")
        .otherwise("rest").alias("channel"),
    )
    base = li.select(
        "l_orderkey", "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100.0).cast("long").alias("cents"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_ret"),
    ).join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    agg = (
        base.groupBy("channel", "l_partkey")
        .agg(
            F.sum("qty").alias("qty"),
            F.sum("cents").alias("cents"),
            F.sum(F.expr("CASE WHEN is_ret = 1 THEN qty ELSE 0 END"))
            .alias("rqty"),
            F.sum(F.expr("CASE WHEN is_ret = 1 THEN cents ELSE 0 END"))
            .alias("rcents"),
        )
        .filter((F.col("qty") >= 50) & (F.col("cents") > 0))
    )
    rat = agg.select(
        "channel", "l_partkey",
        F.expr("(rqty * 10000) DIV qty").alias("ret_bp"),
        F.expr("(rcents * 10000) DIV cents").alias("amt_bp"),
    )
    by_ch = Window.partitionBy("channel")
    rk = rat.select(
        "channel", "l_partkey", "ret_bp", "amt_bp",
        F.rank().over(by_ch.orderBy(F.desc("ret_bp"))).alias("r1"),
        F.rank().over(by_ch.orderBy(F.desc("amt_bp"))).alias("r2"),
    )
    return (
        rk.filter((F.col("r1") <= 10) | (F.col("r2") <= 10))
        .select(
            "channel", F.col("l_partkey").alias("partkey"),
            "ret_bp", "amt_bp",
            F.col("r1").cast("long").alias("r1"),
            F.col("r2").cast("long").alias("r2"),
        )
        .orderBy("channel", "r1", "r2", "partkey")
    )


# =============================================================================
# Round-11 JOB depth (VERDICT r10 #2): the join-ORDER stress classes the
# reference's join-order-benchmark corpus exercises (benchmark/job/*.sql,
# 113 queries; SOURCES.md:12-13) — ≥8-instance chains with correlated
# low-selectivity filters, multi-fan stars, hub bridges, predicate
# cliques with redundant equalities, deep snowflakes, anti-join arms,
# union-derived dims, triple-role dims, self-join diamonds and bushy
# two-star plans. Re-authored on the synthetic TPC-H-ish corpus with the
# JOB answer shape (MIN(string) + counts) so the result is deterministic
# and hash-stable. At 100x scale the join ORDER of these classes is the
# difference between hours and minutes — each gate carries a plan audit
# (tests/test_plans.py) pinning the strategy (broadcast dims, hash
# fact joins, anti/semi placement).
# =============================================================================


# --- b21: nine-instance pure CHAIN, most-selective filter at the far end ----
# JOB chain queries (8a/17a/…) run one long join path where the tiny
# filter sits several hops from the answer tables; starting anywhere
# but the selective end explodes the intermediates. Chain here:
# region(EUROPE) -> nation -> supplier -> lineitem -> orders(F) ->
# customer(BUILDING) -> nation2 -> region2(ASIA), plus part(PROMO) off
# the fact — 9 instances, filters correlated through the chain.

_B21_ORACLE = """
SELECT MIN(s.s_name) AS min_supp,
       MIN(c.c_name) AS min_cust,
       MIN(p.p_name) AS min_part,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM region r1
JOIN nation n1   ON n1.n_regionkey = r1.r_regionkey
JOIN supplier s  ON s.s_nationkey = n1.n_nationkey
JOIN lineitem l  ON l.l_suppkey = s.s_suppkey
JOIN part p      ON p.p_partkey = l.l_partkey
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN nation n2   ON n2.n_nationkey = c.c_nationkey
JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
WHERE r1.r_name = 'EUROPE'
  AND p.p_type = 'PROMO'
  AND o.o_orderstatus = 'F'
  AND c.c_mktsegment = 'BUILDING'
  AND r2.r_name = 'ASIA'
"""


@query(
    "b21_chain8_correlated", _B21_ORACLE,
    doc="JOB chain class: 9 table instances in one join path, the most "
        "selective filters (region literals) at BOTH far ends, "
        "low-selectivity filters correlated through the middle — "
        "broadcast dims, fact-side hash joins only",
)
def b21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_reg")
    )
    r1 = region.filter(F.col("r_name") == "EUROPE").select(
        F.col("r_regionkey").alias("r1_key")
    )
    r2 = region.filter(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("r2_key")
    )
    # the supplier arm collapses to a broadcastable key set BEFORE the
    # fact join: region -> nation -> supplier is dim-sized at any SF
    supp_eu = (
        supp.join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(r1), F.col("n1_reg") == F.col("r1_key"))
        .select("s_suppkey", "s_name")
    )
    return (
        li.join(F.broadcast(supp_eu), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r2), F.col("n2_reg") == F.col("r2_key"))
        .agg(
            F.min("s_name").alias("min_supp"),
            F.min("c_name").alias("min_cust"),
            F.min("p_name").alias("min_part"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b22: multi-fan star where only ONE fan is selective --------------------
# JOB star queries (e.g. 3a/19a) hang 4+ dims off one fact with filters
# whose SELECTIVITY varies 100x — the planner must order the fans by
# selectivity, not by declaration order. Three low-selectivity fans
# (part size band ~60%, supplier balance ~50%, orders status ~67%) and
# one needle (supplier's region via nation = 'MIDDLE EAST' AND
# s_acctbal < 0 — the correlated pair that makes the fan tiny).

_B22_ORACLE = """
SELECT MIN(p.p_name) AS min_part,
       MIN(s.s_name) AS min_supp,
       CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE p.p_size BETWEEN 10 AND 40
  AND s.s_acctbal < 0
  AND o.o_orderstatus IN ('O', 'F')
  AND r.r_name = 'MIDDLE EAST'
"""


@query(
    "b22_fanout_star_lowsel", _B22_ORACLE,
    doc="JOB star class: four fans off one fact, three low-selectivity "
        "(size band / status / balance) and one needle (negative-balance "
        "Middle-East suppliers) — the selective fan must drive the plan",
)
def b22(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 40)
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "F")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "MIDDLE EAST"
    )
    # collapse the needle fan first: suppliers in the region with
    # negative balance — dim-sized, broadcast into the fact
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("s_name").alias("min_supp"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b23: dual-hub bridge with a cross-hub dimension equality ---------------
# JOB's bridge queries tie two hubs (title and name) through a linking
# fact and add a predicate BETWEEN dimensions of different hubs
# (company country = person country class). Hub 1: orders + customer;
# hub 2: lineitem + part + supplier; bridge: orderkey; cross-hub:
# customer and supplier share the SAME nation.

_B23_ORACLE = """
SELECT MIN(c.c_name) AS min_cust,
       MIN(s.s_name) AS min_supp,
       MIN(p.p_name) AS min_part,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE c.c_acctbal > 5000
  AND p.p_brand IN ('Brand#3', 'Brand#14')
  AND c.c_nationkey = s.s_nationkey
"""


@query(
    "b23_dual_hub_bridge", _B23_ORACLE,
    doc="JOB bridge class: two hubs (orders+customer / lineitem+part+"
        "supplier) tied by the fact key, plus a cross-hub dimension "
        "equality (customer nation = supplier nation) resolvable only "
        "after both hubs join",
)
def b23(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 5000
    )
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#3", "Brand#14")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .agg(
            F.min("c_name").alias("min_cust"),
            F.min("s_name").alias("min_supp"),
            F.min("p_name").alias("min_part"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b24: predicate clique with redundant equalities -------------------------
# Every JOB query closes its join graph into a CLIQUE of redundant key
# equalities (t.id = mi.movie_id AND mi.movie_id = mc.movie_id AND
# mc.movie_id = t.id …) — the optimizer must recognise the transitive
# closure instead of treating each equality as a new join. Here: two
# lineitem instances of the same order + the order itself, all three
# pairwise equated on orderkey; arms to part (instance 1) and supplier
# (instance 2).

_B24_ORACLE = """
SELECT MIN(p.p_name) AS min_part,
       MIN(s.s_name) AS min_supp,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l1, lineitem l2, orders o, part p, supplier s
WHERE l1.l_orderkey = l2.l_orderkey
  AND l2.l_orderkey = o.o_orderkey
  AND o.o_orderkey = l1.l_orderkey
  AND p.p_partkey = l1.l_partkey
  AND s.s_suppkey = l2.l_suppkey
  AND l1.l_returnflag = 'R'
  AND l2.l_linestatus = 'O'
  AND l1.l_linenumber <> l2.l_linenumber
  AND p.p_type = 'SMALL'
  AND o.o_orderpriority = '1-URGENT'
"""


@query(
    "b24_cycle_closure", _B24_ORACLE,
    doc="JOB predicate-clique class: three relations pairwise equated on "
        "the same key (redundant transitive equalities, comma-FROM) — "
        "the plan must collapse the clique to two hash joins on "
        "orderkey, never a nested loop",
)
def b24(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_partkey").alias("pk1"),
        F.col("l_linenumber").alias("ln1"),
    )
    l2 = li.filter(F.col("l_linestatus") == "O").select(
        F.col("l_orderkey").alias("k2"),
        F.col("l_suppkey").alias("sk2"),
        F.col("l_linenumber").alias("ln2"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        l1.join(l2, (F.col("k1") == F.col("k2")) & (F.col("ln1") != F.col("ln2")))
        .join(orders, F.col("k2") == orders.o_orderkey)
        .join(F.broadcast(part), F.col("pk1") == part.p_partkey)
        .join(F.broadcast(supp), F.col("sk2") == supp.s_suppkey)
        .agg(
            F.min("p_name").alias("min_part"),
            F.min("s_name").alias("min_supp"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b25: deep snowflake — the only selective filter three hops up ----------
# JOB's snowflake arms put the needle on a SECOND-level dimension
# (kind_type behind title, country behind company). Here the fact's
# order arm climbs orders -> customer -> nation -> region and ONLY the
# region literal filters; the plan must push that one-row dim down the
# whole arm (broadcast chain), never scan-join the unfiltered middles.

_B25_ORACLE = """
SELECT MIN(c.c_name) AS min_cust,
       MIN(p.p_name) AS min_part,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_custs,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'AFRICA'
"""


@query(
    "b25_snowflake_deep", _B25_ORACLE,
    doc="JOB deep-snowflake class: the only filter is a region literal "
        "three dimension hops from the fact — the customer arm collapses "
        "to a broadcast key set before touching lineitem",
)
def b25(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AFRICA"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_name")
    )
    # join ORDER is the gate's point: the selective arm (region-filtered
    # customers) reduces orders FIRST — the unfiltered lineitem x orders
    # bridge would be the largest possible intermediate (measured 24x at
    # the 5x probe before this reorder; 1.2x after)
    orders_af = orders.join(cust, orders.o_custkey == F.col("c_custkey"))
    return (
        li.join(orders_af, li.l_orderkey == orders_af.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.min("c_name").alias("min_cust"),
            F.min("p_name").alias("min_part"),
            F.countDistinct("c_custkey").cast("long").alias("n_custs"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b26: chain with an ANTI-JOIN arm ----------------------------------------
# JOB's NOT-IN / absent-attribute variants hang a negated existence arm
# off the chain; placing the anti-join too early loses rows, too late
# wastes work. European BUILDING customers' F-orders that contain NO
# returned line — per-priority census.

_B26_ORACLE = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND c.c_mktsegment = 'BUILDING'
  AND o.o_orderstatus = 'F'
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY priority
"""


@query(
    "b26_chain_antifilter", _B26_ORACLE,
    doc="JOB negated-existence class: a four-hop dimension chain plus a "
        "NOT EXISTS arm against the fact — hash anti-join placed after "
        "the selective chain collapse, never a per-order probe",
)
def b26(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == F.col("c_custkey"))
        .join(returned, orders.o_orderkey == F.col("l_orderkey"), "left_anti")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("priority")
    )


# --- b27: union-derived broadcast dimension ----------------------------------
# JOB's disjunctive dimension filters (company_type = A OR B with
# different attached predicates) are a UNION of two incompatible
# filtered dim scans — the derived dim must STAY broadcastable.

_B27_ORACLE = """
WITH pdim AS (
  SELECT p_partkey, p_type FROM part WHERE p_type = 'PROMO' AND p_size <= 15
  UNION ALL
  SELECT p_partkey, p_type FROM part WHERE p_type = 'ECONOMY' AND p_size >= 35
)
SELECT pd.p_type AS ptype,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
         AS cents
FROM lineitem l
JOIN pdim pd ON pd.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY pd.p_type
ORDER BY ptype
"""


@query(
    "b27_star_union_dims", _B27_ORACLE,
    doc="JOB disjunctive-dimension class: the dim side is a UNION ALL of "
        "two differently-filtered scans of the same table — the derived "
        "dim stays a single broadcast build side",
)
def b27(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    pdim = (
        part.filter((F.col("p_type") == "PROMO") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_type")
        .unionAll(
            part.filter(
                (F.col("p_type") == "ECONOMY") & (F.col("p_size") >= 35)
            ).select("p_partkey", "p_type")
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return (
        li.join(F.broadcast(pdim), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("p_type").alias("ptype"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("cents"),
        )
        .orderBy("ptype")
    )


# --- b28: one dimension in three roles, cross-role predicates ----------------
# JOB joins info_type/comp_cast_type two and three times under different
# roles with predicates BETWEEN the roles. nation appears twice
# (customer / supplier roles) and region twice, with the cross-role
# pair: SAME region, DIFFERENT nation — only resolvable after all four
# role joins.

_B28_ORACLE = """
SELECT MIN(n1.n_name) AS min_cust_nation,
       MIN(n2.n_name) AS min_supp_nation,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
JOIN region r1  ON r1.r_regionkey = n1.n_regionkey
JOIN region r2  ON r2.r_regionkey = n2.n_regionkey
WHERE r1.r_name = r2.r_name
  AND n1.n_nationkey <> n2.n_nationkey
  AND o.o_orderpriority = '2-HIGH'
  AND l.l_returnflag = 'A'
"""


@query(
    "b28_self_role_chain", _B28_ORACLE,
    doc="JOB repeated-role class: nation and region each joined TWICE "
        "under customer/supplier roles with cross-role predicates (same "
        "region name, different nation) — all four role joins broadcast",
)
def b28(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "A"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "2-HIGH"
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("n1_name"),
        F.col("n_regionkey").alias("n1_reg"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("n2_name"),
        F.col("n_regionkey").alias("n2_reg"),
    )
    r1 = region.select(
        F.col("r_regionkey").alias("r1_key"), F.col("r_name").alias("r1_name")
    )
    r2 = region.select(
        F.col("r_regionkey").alias("r2_key"), F.col("r_name").alias("r2_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .join(F.broadcast(r1), F.col("n1_reg") == F.col("r1_key"))
        .join(F.broadcast(r2), F.col("n2_reg") == F.col("r2_key"))
        .filter(
            (F.col("r1_name") == F.col("r2_name"))
            & (F.col("n1_key") != F.col("n2_key"))
        )
        .agg(
            F.min("n1_name").alias("min_cust_nation"),
            F.min("n2_name").alias("min_supp_nation"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b29: self-join diamond re-converging on a shared dim attribute ---------
# JOB 33's aka-title diamond: two instances of the fact meet at the top
# through a SHARED dimension attribute (two different parts of the SAME
# brand inside one urgent order). Anti-symmetric key order dedupes the
# pair; top-10 brands by pair count.

_B29_ORACLE = """
SELECT p1.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM lineitem l1
JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
JOIN part p1 ON p1.p_partkey = l1.l_partkey
JOIN part p2 ON p2.p_partkey = l2.l_partkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE p1.p_brand = p2.p_brand
  AND p1.p_partkey < p2.p_partkey
  AND o.o_orderpriority = '1-URGENT'
GROUP BY p1.p_brand
ORDER BY n_pairs DESC, brand
LIMIT 10
"""


@query(
    "b29_diamond_paths", _B29_ORACLE,
    doc="JOB self-join diamond: two fact instances of one order meeting "
        "through a shared dimension attribute (same brand, different "
        "part, anti-symmetric dedup) — order-key hash join + broadcast "
        "part on both arms, top-10 brands",
)
def b29(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    p1 = part.select(
        F.col("p_partkey").alias("pk1"), F.col("p_brand").alias("brand1")
    )
    p2 = part.select(
        F.col("p_partkey").alias("pk2"), F.col("p_brand").alias("brand2")
    )
    l1 = li.select(
        F.col("l_orderkey").alias("k1"), F.col("l_partkey").alias("lp1")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("lp2")
    )
    a1 = l1.join(F.broadcast(p1), F.col("lp1") == F.col("pk1"))
    a2 = l2.join(F.broadcast(p2), F.col("lp2") == F.col("pk2"))
    return (
        a1.join(a2, F.col("k1") == F.col("k2"))
        .filter(
            (F.col("brand1") == F.col("brand2"))
            & (F.col("pk1") < F.col("pk2"))
        )
        .join(orders, F.col("k1") == orders.o_orderkey)
        .groupBy(F.col("brand1").alias("brand"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "brand")
        .limit(10)
    )


# --- b30: bushy two-star plan — pre-aggregate both stars, then bridge -------
# The class where LEFT-DEEP enumeration loses: two independent stars
# each REDUCE before meeting. Star A: urgent orders of high-balance
# customers (per-order row). Star B: per-order PROMO line aggregate.
# Joining raw and aggregating later multiplies the fact; the gated plan
# aggregates star B first (bushy), bridging two already-small sides.

_B30_ORACLE = """
WITH star_a AS (
  SELECT o.o_orderkey,
         CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS order_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_orderpriority = '1-URGENT' AND c.c_acctbal > 7000
),
star_b AS (
  SELECT l.l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS line_cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
  GROUP BY l.l_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(a.order_cents) AS BIGINT) AS sum_order_cents,
       CAST(SUM(b.n_lines) AS BIGINT) AS sum_lines,
       CAST(SUM(b.line_cents) AS BIGINT) AS sum_line_cents
FROM star_a a
JOIN star_b b ON b.l_orderkey = a.o_orderkey
"""


@query(
    "b30_bushy_two_stars", _B30_ORACLE,
    doc="JOB bushy-plan class: two independent stars each pre-aggregated "
        "to order grain BEFORE the bridge join — the bushy shape joins "
        "two reduced sides instead of multiplying the raw fact",
)
def b30(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 7000
    )
    star_a = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0).cast("long")
        .alias("order_cents"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    star_b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("line_cents"),
        )
    )
    return (
        star_a.join(star_b, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("order_cents").cast("long").alias("sum_order_cents"),
            F.sum("n_lines").cast("long").alias("sum_lines"),
            F.sum("line_cents").cast("long").alias("sum_line_cents"),
        )
    )


# =============================================================================
# Round-11 TPC-DS tail (VERDICT r10 #4) — the remaining distinctive
# template classes from the reference corpus (benchmark/tpcds/*.tpl):
# the Q14 iceberg-CTE cross-channel variant, the Q64 multi-year
# mega-join chain, the Q7/Q26 demographic-split averages, the
# LAG-sequence flip census, the Q16 ship-gap class and the Q35/Q10
# multi-channel membership census. Re-authored on the synthetic corpus
# (channel := order priority band), exact integer arithmetic throughout.
# =============================================================================


# --- ds66: TPC-DS Q14 iceberg CTE --------------------------------------------
# Q14's second half: an average-sales threshold computed ONCE over the
# UNION of all channels (the iceberg CTE), then each (channel, brand)
# cell kept only when it exceeds that global average. The threshold is
# a one-row broadcast; the union never materialises twice.

_DS66_ORACLE = """
WITH sales AS (
  SELECT CASE WHEN o.o_orderpriority = '1-URGENT' THEN 'store'
              WHEN o.o_orderpriority = '2-HIGH' THEN 'web'
              ELSE 'catalog' END AS channel,
         p.p_brand AS brand,
         CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p   ON p.p_partkey = l.l_partkey
),
cell AS (
  SELECT channel, brand,
         CAST(SUM(cents) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM sales GROUP BY channel, brand
),
threshold AS (
  -- integer division, NOT CAST(AVG(..)): DuckDB's double->BIGINT cast
  -- ROUNDS while Spark's TRUNCATES — the exact-integer mean avoids the
  -- divergence class entirely (self-review r11)
  SELECT CAST(SUM(sum_cents) // COUNT(*) AS BIGINT) AS avg_cents FROM cell
)
SELECT c.channel, c.brand, c.sum_cents, c.n_rows
FROM cell c, threshold t
WHERE c.sum_cents > t.avg_cents
ORDER BY c.channel, c.brand
"""


@query(
    "ds66_iceberg_cte_cross_channel", _DS66_ORACLE,
    doc="TPC-DS Q14 iceberg-CTE class: global average threshold computed "
        "once over the cross-channel union, cells kept only above it — "
        "the threshold is a one-row broadcast over the reused cell "
        "aggregate, never a recompute",
)
def ds66(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", "store")
        .when(F.col("o_orderpriority") == "2-HIGH", "web")
        .otherwise("catalog").alias("channel"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    cell = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("channel", "brand")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("sum_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    # iceberg threshold: ONE aggregate row broadcast-crossed into the
    # (reused) cell frame — the scalar-subquery plan at any scale
    threshold = cell.agg(
        F.expr("SUM(sum_cents) DIV COUNT(*)").cast("long").alias("avg_cents")
    )
    return (
        cell.join(F.broadcast(threshold))
        .filter(F.col("sum_cents") > F.col("avg_cents"))
        .select("channel", "brand", "sum_cents", "n_rows")
        .orderBy("channel", "brand")
    )


# --- ds67: TPC-DS Q64 multi-year mega-join ------------------------------------
# Q64 builds a per-(item, year) snapshot through a mega-join of fact +
# many dims, then self-joins CONSECUTIVE years requiring growth. Here
# the snapshot grain is (brand, year) over lineitem x orders x customer
# x nation x part; the year+1 self-join keeps brands whose sales grew.

_DS67_ORACLE = """
WITH snap AS (
  SELECT p.p_brand AS brand,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_custs
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  JOIN part p     ON p.p_partkey = l.l_partkey
  WHERE n.n_regionkey <= 2
  GROUP BY p.p_brand, EXTRACT(YEAR FROM o.o_orderdate)
)
SELECT s1.brand AS brand, s1.yr AS y1, s1.cents AS cents1,
       s2.cents AS cents2, s1.n_custs AS custs1, s2.n_custs AS custs2
FROM snap s1
JOIN snap s2 ON s2.brand = s1.brand AND s2.yr = s1.yr + 1
WHERE s2.cents > s1.cents
ORDER BY brand, y1
"""


@query(
    "ds67_multi_year_megajoin", _DS67_ORACLE,
    doc="TPC-DS Q64 class: (brand, year) snapshot from a 5-relation "
        "mega-join, self-joined on consecutive years with a growth "
        "predicate — the snapshot computes ONCE and co-partitions on "
        "brand for the year+1 join",
)
def ds67(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") <= 2
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    snap = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("brand", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("cents"),
            F.countDistinct("c_custkey").cast("long").alias("n_custs"),
        )
    )
    s1 = snap.select(
        "brand", F.col("yr").alias("y1"),
        F.col("cents").alias("cents1"), F.col("n_custs").alias("custs1"),
    )
    s2 = snap.select(
        F.col("brand").alias("brand2"), F.col("yr").alias("y2"),
        F.col("cents").alias("cents2"), F.col("n_custs").alias("custs2"),
    )
    return (
        s1.join(
            s2,
            (F.col("brand2") == F.col("brand"))
            & (F.col("y2") == F.col("y1") + 1),
        )
        .filter(F.col("cents2") > F.col("cents1"))
        .select("brand", "y1", "cents1", "cents2", "custs1", "custs2")
        .orderBy("brand", "y1")
    )


# --- ds68: TPC-DS Q7/Q26 demographic-split averages ---------------------------
# Q7/Q26 report per-item average metrics under a demographic filter.
# Split := urgent vs non-urgent channel; per brand both splits'
# average quantity (exact integer DIV), kept where both sides have
# data, ratio in basis points, top-20 by ratio.

_DS68_ORACLE = """
WITH g AS (
  SELECT p.p_brand AS brand,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p   ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
)
SELECT u.brand AS brand,
       CAST(u.qty * 100 // u.n AS BIGINT) AS avg_qty_urgent_c,
       CAST(r.qty * 100 // r.n AS BIGINT) AS avg_qty_rest_c,
       CAST((u.qty * r.n * 10000) // (r.qty * u.n) AS BIGINT) AS ratio_bp
FROM g u JOIN g r ON r.brand = u.brand
WHERE u.urgent = 1 AND r.urgent = 0 AND r.qty > 0
ORDER BY ratio_bp DESC, brand
LIMIT 20
"""


@query(
    "ds68_promo_nonpromo_ratio", _DS68_ORACLE,
    doc="TPC-DS Q7/Q26 class: per-brand average metrics under a "
        "demographic split (urgent vs rest), exact integer centi-"
        "averages and a cross-multiplied basis-point ratio — one "
        "aggregate shuffle, split self-join on the reduced grain",
)
def ds68(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0).alias("urgent"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    g = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("brand", "urgent")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    u = g.filter(F.col("urgent") == 1).select(
        "brand", F.col("qty").alias("uq"), F.col("n").alias("un")
    )
    r = g.filter((F.col("urgent") == 0) & (F.col("qty") > 0)).select(
        F.col("brand").alias("brand_r"),
        F.col("qty").alias("rq"), F.col("n").alias("rn"),
    )
    return (
        u.join(r, F.col("brand_r") == F.col("brand"))
        .select(
            "brand",
            F.expr("uq * 100 DIV un").alias("avg_qty_urgent_c"),
            F.expr("rq * 100 DIV rn").alias("avg_qty_rest_c"),
            F.expr("(uq * rn * 10000) DIV (rq * un)").alias("ratio_bp"),
        )
        .orderBy(F.desc("ratio_bp"), "brand")
        .limit(20)
    )


# --- ds69: order-status sequence flips (LAG class) ----------------------------
# The TPC-DS sequential-behaviour class (Q47's neighbour comparison
# applied to state transitions): per customer, orders in date order,
# LAG the status, census of transition types. The window partitions by
# customer — one shuffle, deterministic (date, orderkey) order.

_DS69_ORACLE = """
WITH seq AS (
  SELECT o_custkey,
         o_orderstatus AS cur,
         LAG(o_orderstatus) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
)
SELECT prev || '>' || cur AS transition,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq
WHERE prev IS NOT NULL AND prev <> cur
GROUP BY 1
ORDER BY transition
"""


@query(
    "ds69_state_sequence_flips", _DS69_ORACLE,
    doc="TPC-DS sequential-behaviour class: per-customer order-status "
        "LAG over a deterministic (date, key) order, transition census "
        "— one customer-partitioned window shuffle, no self-join",
)
def ds69(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_orderstatus").alias("cur"),
        F.lag("o_orderstatus").over(w).alias("prev"),
    )
    return (
        seq.filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("cur")))
        .groupBy(
            F.concat(F.col("prev"), F.lit(">"), F.col("cur"))
            .alias("transition")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("transition")
    )


# --- ds70: TPC-DS Q16 ship-gap census ------------------------------------------
# Q16's late-shipment class: lines shipped more than 60 days after the
# order date; per priority, distinct late orders + late lines + cents.

_DS70_ORACLE = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_late_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
            AS BIGINT) AS cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 60
GROUP BY o.o_orderpriority
ORDER BY priority
"""


@query(
    "ds70_web_sales_gap", _DS70_ORACLE,
    doc="TPC-DS Q16 ship-gap class: order-to-ship latency filter "
        "(datediff > 60) evaluated on the joined pair, per-priority "
        "census — one fact-fact hash join, one aggregate",
)
def ds70(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_late_lines"),
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("cents"),
        )
        .orderBy("priority")
    )


# --- ds71: TPC-DS Q35/Q10 multi-channel membership census ---------------------
# The demographics census with per-channel EXISTS flags: customers
# classified by which priority channels they bought in (urgent / low /
# both), counted per market segment. Membership flags computed in ONE
# orders aggregate (conditional MAX), never stacked semi-joins.

_DS71_ORACLE = """
WITH member AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS u,
         MAX(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS lo
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment AS segment,
       CASE WHEN m.u = 1 AND m.lo = 1 THEN 'both'
            WHEN m.u = 1 THEN 'urgent_only'
            WHEN m.lo = 1 THEN 'low_only'
            ELSE 'neither' END AS affinity,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
JOIN member m ON m.o_custkey = c.c_custkey
GROUP BY 1, 2
ORDER BY segment, affinity
"""


@query(
    "ds71_catalog_channel_affinity", _DS71_ORACLE,
    doc="TPC-DS Q35/Q10 class: multi-channel membership census — the "
        "per-channel EXISTS flags collapse to ONE conditional-MAX "
        "aggregate over orders (never stacked semi-joins), then one "
        "dimension join and a two-key census",
)
def ds71(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    member = orders.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("u"),
        F.max(
            F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)
        ).alias("lo"),
    )
    cust = load_table(spark, sf_dir, "customer")
    affinity = (
        F.when((F.col("u") == 1) & (F.col("lo") == 1), "both")
        .when(F.col("u") == 1, "urgent_only")
        .when(F.col("lo") == 1, "low_only")
        .otherwise("neither")
    )
    return (
        cust.join(member, cust.c_custkey == member.o_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            affinity.alias("affinity"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("segment", "affinity")
    )


# =============================================================================
# Round-11 ClickBench string/URL tail (VERDICT r10 #5) — regex-heavy URL
# classification, multi-term phrase ranking, per-user ratio bands and
# the minute histogram (benchmark/clickbench/queries.sql). Regex and
# string arithmetic stay in whole-stage codegen — no UDF anywhere.
# =============================================================================


# --- c32: regex-heavy URL classification --------------------------------------
# ClickBench's URL-classify queries chain several regexes over the hit
# URL. URLs synthesized deterministically from events (the c28 recipe);
# a first-match RLIKE ladder classifies, then count + distinct users.

_C32_ORACLE = """
WITH u AS (
  SELECT '/p' || CAST(user_id % 20 AS VARCHAR)
         || '/item' || CAST(event_id % 100 AS VARCHAR)
         || '?ref=' || event_type AS url,
         user_id
  FROM events
)
SELECT CASE
         WHEN regexp_matches(url, '^/p1[0-9]/') THEN 'teen_section'
         WHEN regexp_matches(url, 'item[0-9]*[02468]\\?') THEN 'even_item'
         WHEN regexp_matches(url, 'ref=purchase$') THEN 'purchase_ref'
         ELSE 'other'
       END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM u
GROUP BY 1
ORDER BY bucket
"""


@query(
    "c32_url_regex_classify", _C32_ORACLE,
    doc="ClickBench URL-classify class: first-match ladder of THREE "
        "regexes over a synthesized URL — all RLIKE in codegen, one "
        "scan, one aggregate shuffle",
)
def c32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("/p"), (F.col("user_id") % 20).cast("string"),
        F.lit("/item"), (F.col("event_id") % 100).cast("string"),
        F.lit("?ref="), F.col("event_type"),
    )
    bucket = (
        F.when(url.rlike("^/p1[0-9]/"), "teen_section")
        .when(url.rlike("item[0-9]*[02468]\\?"), "even_item")
        .when(url.rlike("ref=purchase$"), "purchase_ref")
        .otherwise("other")
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("bucket")
    )


# --- c33: multi-term phrase ranking --------------------------------------------
# ClickBench's search-phrase queries rank pages containing ALL query
# terms by combined frequency. Occurrence counts via the replace-length
# trick (pure string codegen, identical on both engines); documents
# must contain every term; top-15 by (score DESC, doc_id).

_C33_ORACLE = """
WITH scored AS (
  SELECT doc_id,
         (LENGTH(text) - LENGTH(REPLACE(text, 'spark', ''))) / 5 AS t1,
         (LENGTH(text) - LENGTH(REPLACE(text, 'window', ''))) / 6 AS t2,
         (LENGTH(text) - LENGTH(REPLACE(text, 'merge', ''))) / 5 AS t3
  FROM documents
)
SELECT doc_id,
       CAST(t1 AS BIGINT) AS n_spark,
       CAST(t2 AS BIGINT) AS n_window,
       CAST(t3 AS BIGINT) AS n_merge,
       CAST(t1 + t2 + t3 AS BIGINT) AS score
FROM scored
WHERE t1 > 0 AND t2 > 0 AND t3 > 0
ORDER BY score DESC, doc_id
LIMIT 15
"""


@query(
    "c33_phrase_rank_multiterm", _C33_ORACLE,
    doc="ClickBench multi-term search class: AND-of-terms filter + "
        "combined-frequency ranking via the replace-length occurrence "
        "count — pure string codegen, top-15 lowers to "
        "TakeOrderedAndProject",
)
def c33(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def occurrences(term: str) -> F.Column:
        return (
            (F.length("text") - F.length(F.regexp_replace(
                F.col("text"), term, "")))
            / F.lit(len(term))
        ).cast("long")

    # regexp_replace with a literal word == REPLACE (terms contain no
    # regex metacharacters); stays in codegen on both engines
    scored = docs.select(
        "doc_id",
        occurrences("spark").alias("n_spark"),
        occurrences("window").alias("n_window"),
        occurrences("merge").alias("n_merge"),
    )
    return (
        scored.filter(
            (F.col("n_spark") > 0) & (F.col("n_window") > 0)
            & (F.col("n_merge") > 0)
        )
        .select(
            "doc_id", "n_spark", "n_window", "n_merge",
            (F.col("n_spark") + F.col("n_window") + F.col("n_merge"))
            .cast("long").alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(15)
    )


# --- c34: per-user ratio bands --------------------------------------------------
# ClickBench's bounce-rate/ratio-band class at user grain: per user the
# purchase share of their events in basis points, banded by thousands;
# users per band + total events per band. Two aggregates, both on the
# SAME user key — one shuffle then a tiny band groupBy.

_C34_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purch
  FROM events GROUP BY user_id
)
SELECT CAST((n_purch * 10000 // n_events) // 1000 AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM per_user
GROUP BY 1
ORDER BY band
"""


@query(
    "c34_adblock_ratio_bands", _C34_ORACLE,
    doc="ClickBench ratio-band class: per-user purchase share in basis "
        "points banded by thousands — user-keyed aggregate then a "
        "bounded band census, exact integer arithmetic",
)
def c34(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("n_purch"),
    )
    return (
        per_user.groupBy(
            F.expr("(n_purch * 10000 DIV n_events) DIV 1000").alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("band")
    )


# --- c35: minute histogram over a fixed window ---------------------------------
# ClickBench's per-minute traffic histogram (Q36 family): minute
# truncation inside a bounded time window, top-20 minutes by hits.

_C35_ORACLE = """
SELECT date_trunc('minute', ts) AS minute,
       CAST(COUNT(*) AS BIGINT) AS hits,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts < TIMESTAMP '2024-01-10 06:00:00'
GROUP BY 1
ORDER BY hits DESC, minute
LIMIT 20
"""


@query(
    "c35_interval_minute_histogram", _C35_ORACLE,
    doc="ClickBench minute-histogram class: pushed time-range filter + "
        "minute truncation + top-20 by hits — the range predicate "
        "reaches the parquet scan, top-k lowers to "
        "TakeOrderedAndProject",
)
def c35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-10 06:00:00").cast("timestamp"))
        )
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("hits"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("hits"), "minute")
        .limit(20)
    )


# --- ds72: TPC-DS Q39 volatility band (integer-exact variance) ----------------
# Q39's inventory-volatility class: per (brand, month) quantity totals,
# then flag brands whose ACROSS-MONTH coefficient of variation exceeds
# 1. Entirely integer: CoV > 1 <=> n*(n*Sum(q^2) - Sum(q)^2) >
# (n-1)*Sum(q)^2 (cross-multiplied sample variance vs squared mean), so
# the flag is exact on both engines — no sqrt, no float variance.

_DS72_ORACLE = """
WITH monthly AS (
  SELECT p.p_brand AS brand,
         date_trunc('month', l.l_shipdate) AS mon,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2),
stats AS (
  SELECT brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(q * q) AS BIGINT) AS s2
  FROM monthly GROUP BY brand)
SELECT brand, n, s1, s2,
       CASE WHEN n > 1 AND n * (n * s2 - s1 * s1) > (n - 1) * s1 * s1
            THEN 1 ELSE 0 END AS volatile
FROM stats ORDER BY brand
"""


@query(
    "ds72_volatility_band", _DS72_ORACLE,
    doc="TPC-DS Q39 volatility class: across-month coefficient-of-"
        "variation flag via cross-multiplied integer variance "
        "(n*(n*S2 - S1^2) > (n-1)*S1^2) — no sqrt, no float, exact on "
        "both engines; one (brand, month) reduction then a brand census",
)
def ds72(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    monthly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("brand", F.date_trunc("month", F.col("l_shipdate")).alias("mon"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    stats = monthly.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("s1"),
        F.sum(F.expr("q * q")).cast("long").alias("s2"),
    )
    return (
        stats.select(
            "brand", "n", "s1", "s2",
            F.when(
                (F.col("n") > 1)
                & (F.col("n") * (F.col("n") * F.col("s2")
                                 - F.col("s1") * F.col("s1"))
                   > (F.col("n") - 1) * F.col("s1") * F.col("s1")),
                1,
            ).otherwise(0).alias("volatile"),
        )
        .orderBy("brand")
    )


# --- w11: time-RANGE trailing window (7-day rolling sum) ----------------------
# The time-decayed rolling metric every monitoring/feature pipeline
# computes: per user, the trailing-7-day purchase cents at every event.
# Lowered to a RANGE frame over epoch MICROSECONDS (both engines order
# and bound on the same integer axis — interval frames vs epoch integers
# round differently at sub-second precision, so the micros axis IS the
# parity contract). One user-partitioned window shuffle.

_W11_ORACLE = """
SELECT user_id,
       epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS trailing_cents
FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, ts_us
"""


@query(
    "w11_time_range_trailing", _W11_ORACLE,
    doc="trailing-7-day rolling sum per user via a RANGE frame on epoch "
        "micros (the exact-integer time axis both engines bound "
        "identically) — one partition-keyed window shuffle",
)
def w11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-604800000000, 0)
    )
    return (
        base.select(
            "user_id", "ts_us",
            F.sum("cents").over(w).cast("long").alias("trailing_cents"),
        )
        .orderBy("user_id", "ts_us")
    )


# =============================================================================
# Round-12 JOB second batch (VERDICT r11 #4): the remaining join-order
# stress classes from the reference's 113-query JOB corpus
# (`/root/reference/benchmark/SOURCES.md:12-13`, `benchmark/job/`) —
# deeper bushy trees, triple-fact bridges, many-to-many dims with skewed
# fan — re-expressed on the synthetic corpus with the same topology.
# =============================================================================


# --- b31: bushy triple-fact bridge -------------------------------------------
# JOB's triple-fact class bridges three fact roles through the same key
# (movie_info x movie_keyword x cast_info all on title). Three filtered
# lineitem roles bridge on orderkey: the plan must reduce EACH role by
# its own filter before any bridge, and keep the tree bushy — a
# left-deep chain through the unfiltered fact would build the largest
# possible intermediate twice.

_B31_ORACLE = """
SELECT MIN(p.p_name) AS min_part,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l1
JOIN part p   ON p.p_partkey = l1.l_partkey AND p.p_type = 'PROMO'
JOIN orders o ON o.o_orderkey = l1.l_orderkey
            AND o.o_orderpriority = '2-HIGH'
JOIN lineitem l2 ON l2.l_orderkey = o.o_orderkey AND l2.l_linestatus = 'O'
JOIN lineitem l3 ON l3.l_orderkey = o.o_orderkey AND l3.l_quantity > 45
WHERE l1.l_returnflag = 'R'
"""


@query(
    "b31_bushy_triple_fact", _B31_ORACLE,
    doc="JOB triple-fact bridge: three filtered lineitem roles bridged "
        "on orderkey — each role reduced by its own filter first, bushy "
        "(l1xpart-orders) |><| (l2 |><| l3) tree, never a left-deep "
        "chain through the unfiltered fact",
)
def b31(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "2-HIGH"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k1"), "l_partkey"
    )
    l2 = li.filter(F.col("l_linestatus") == "O").select(
        F.col("l_orderkey").alias("k2")
    )
    l3 = li.filter(F.col("l_quantity") > 45).select(
        F.col("l_orderkey").alias("k3")
    )
    # left tree: the most selective role (R-flag + PROMO part + 2-HIGH
    # order) collapses to the small bridge key set
    left = (
        l1.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(orders, F.col("k1") == orders.o_orderkey)
    )
    # right tree: the two remaining roles bridge each other first
    right = l2.join(l3, F.col("k2") == F.col("k3"))
    return (
        left.join(right, F.col("k1") == F.col("k2"))
        .agg(
            F.min("p_name").alias("min_part"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b32: many-to-many dims with skewed fan -----------------------------------
# JOB's many-to-many class joins two dimension tables through a shared
# low-cardinality attribute (company x keyword through movie): a
# genuinely m:n equi-join whose fan is skewed (nation sizes differ).
# The smaller side (supplier) is dimension-sized at EVERY scale, so the
# join is a broadcast m:n with aggregated output — the fan never
# materialises beyond the aggregation buffers; AQE's skew split handles
# the residual key imbalance at cluster scale.

_B32_ORACLE = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_custs,
       CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_supps
FROM customer c
JOIN supplier s ON s.s_nationkey = c.c_nationkey
               AND c.c_acctbal > s.s_acctbal
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > 8000 AND s.s_acctbal > 5000
GROUP BY n.n_name
ORDER BY nation
"""


@query(
    "b32_skewed_fan_dims", _B32_ORACLE,
    doc="JOB many-to-many dim class: customer x supplier on the skewed "
        "nation key with a theta band (c_acctbal > s_acctbal) — "
        "broadcast m:n against the dimension-sized supplier side, "
        "output aggregated, fan never materialised",
)
def b32(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 8000
    )
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") > 5000
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(
            F.broadcast(supp),
            (cust.c_nationkey == supp.s_nationkey)
            & (cust.c_acctbal > supp.s_acctbal),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("c_custkey").cast("long").alias("n_custs"),
            F.countDistinct("s_suppkey").cast("long").alias("n_supps"),
        )
        .orderBy("nation")
    )


# --- b33: pentagon closure (role bridge) --------------------------------------
# JOB's cycle class closes a relation chain with a second edge between
# its endpoints (company country = movie country). The chain customer ->
# orders -> lineitem -> supplier closes with c_nationkey = s_nationkey:
# the plan must treat the closure as a post-join filter on the two
# nation columns, never as a join reordering trap.

_B33_ORACLE = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_custs
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderstatus = 'F' AND l.l_returnflag = 'A'
GROUP BY n.n_name
ORDER BY nation
"""


@query(
    "b33_role_bridge_pentagon", _B33_ORACLE,
    doc="JOB cycle-closure class: customer->orders->lineitem->supplier "
        "chain closed by same-nation edge — closure applied inside the "
        "supplier hash join, dims broadcast",
)
def b33(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "A"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("c_custkey").cast("long").alias("n_custs"),
        )
        .orderBy("nation")
    )


# --- b34: two overlapping cycles sharing an edge ------------------------------
# JOB's hardest cyclic queries overlap two closures on one shared join
# edge. Cycle A: orders-lineitem-part closed by the theta edge
# p_retailprice > o_totalprice / 20. Cycle B: the same orders-lineitem
# edge extended to supplier and closed by s_nationkey = 3. Both
# closures are filters over one join spine — the plan must build the
# spine ONCE.

_B34_ORACLE = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(p.p_name) AS min_part
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN part p     ON p.p_partkey = l.l_partkey
               AND p.p_retailprice * 20 > o.o_totalprice
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = 3
WHERE l.l_linestatus = 'F' AND p.p_size <= 10
GROUP BY o.o_orderpriority
ORDER BY priority
"""


@query(
    "b34_two_cycle_overlap", _B34_ORACLE,
    doc="JOB overlapping-cycle class: part-price and supplier-nation "
        "closures over one orders-lineitem spine — spine built once, "
        "both closures applied as join-side predicates",
)
def b34(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linestatus") == "F"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == 3
    )
    spine = li.join(
        F.broadcast(supp), li.l_suppkey == supp.s_suppkey
    ).join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        spine.join(
            F.broadcast(part),
            (spine.l_partkey == part.p_partkey)
            & (part.p_retailprice * 20 > spine.o_totalprice),
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("p_name").alias("min_part"),
        )
        .orderBy("priority")
    )


# --- b35: filtered-fact ladder -------------------------------------------------
# JOB's ladder class: every hop of a 4-relation chain carries its own
# moderately selective filter; the optimizer's job is ordering by
# CUMULATIVE selectivity. The date filter on the fact dominates, then
# status, then segment, then the region literal.

_B35_ORACLE = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
            AS BIGINT) AS cents
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
               AND o.o_orderstatus = 'F'
JOIN customer c ON c.c_custkey = o.o_custkey
               AND c.c_mktsegment = 'MACHINERY'
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
WHERE l.l_shipdate >= DATE '1996-01-01'
  AND l.l_shipdate <  DATE '1997-01-01'
GROUP BY o.o_orderpriority
ORDER BY priority
"""


@query(
    "b35_filtered_fact_ladder", _B35_ORACLE,
    doc="JOB ladder class: per-hop filters on all four chain relations "
        "— scan-level pushdown on the fact's date range, dim arms "
        "collapsed to broadcast key sets",
)
def b35(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    cust_asia = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("c_custkey")
    )
    return (
        orders.join(cust_asia, orders.o_custkey == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("cents"),
        )
        .orderBy("priority")
    )


# --- b36: semi/anti/inner mixed tree -------------------------------------------
# JOB's negated+positive existence mix: one arm requires a matching
# fact row (EXISTS -> LeftSemi), another forbids one (NOT EXISTS ->
# LeftAnti), the spine stays inner. Both existence arms are reduced
# fact projections; the plan must keep them hash joins on orderkey.

_B36_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > 49)
GROUP BY c.c_mktsegment
ORDER BY segment
"""


@query(
    "b36_semi_bushy_mix", _B36_ORACLE,
    doc="JOB existence-mix class: EXISTS (LeftSemi) + NOT EXISTS "
        "(LeftAnti) arms on one inner spine — both arms reduced fact "
        "projections, hash-joined on orderkey",
)
def b36(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    huge = li.filter(F.col("l_quantity") > 49).select(
        F.col("l_orderkey").alias("h_okey")
    )
    return (
        orders.join(returned, orders.o_orderkey == F.col("l_orderkey"), "left_semi")
        .join(huge, orders.o_orderkey == F.col("h_okey"), "left_anti")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("segment")
    )


# --- b37: star-in-star (composite dimension) ------------------------------------
# JOB's nested-star class: a dimension that is itself the centre of a
# sub-star (title with its kind/year dims). Orders + customer + nation
# form a composite "order profile" dimension; the profile must collapse
# to a key set BEFORE the fact join — joining lineitem first would drag
# 4x the rows through every dim hop.

_B37_ORACLE = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderpriority = '1-URGENT'
  AND c.c_acctbal > 5000
  AND l.l_returnflag = 'N'
GROUP BY n.n_name
ORDER BY nation
"""


@query(
    "b37_star_in_star", _B37_ORACLE,
    doc="JOB nested-star class: orders+customer+nation collapse to a "
        "composite order-profile dimension before the fact join",
)
def b37(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "N"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 5000
    )
    nation = load_table(spark, sf_dir, "nation")
    profile = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "n_name")
    )
    return (
        li.join(profile, li.l_orderkey == profile.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
        )
        .orderBy("nation")
    )


# --- b38: wide dimension clique --------------------------------------------------
# JOB's widest queries join one fact to MANY dims and then correlate
# the dims with each other (company country = title country AND actor
# age < director age). Here all four dims attach to lineitem and two
# cross-dim predicates (same nation, customer richer than supplier)
# correlate them post-join.

_B38_ORACLE = """
SELECT p.p_type AS ptype,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_supps
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_size <= 5
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
               AND c.c_nationkey = s.s_nationkey
               AND c.c_acctbal > s.s_acctbal
GROUP BY p.p_type
ORDER BY ptype
"""


@query(
    "b38_wide_dim_clique", _B38_ORACLE,
    doc="JOB wide-clique class: four dims on one fact plus cross-dim "
        "predicates (same nation, acctbal band) applied inside the "
        "customer join — dims broadcast, no dim-x-dim join",
)
def b38(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey)
            & (cust.c_acctbal > supp.s_acctbal),
        )
        .groupBy(F.col("p_type").alias("ptype"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("s_suppkey").cast("long").alias("n_supps"),
        )
        .orderBy("ptype")
    )


# =============================================================================
# Round-12 TPC-DS tail (VERDICT r11 #6): the remaining distinct template
# classes from the reference's TPC-DS corpus (`benchmark/tpcds/`) —
# Q78's cross-channel ratio, the rollup-over-channel variants, repeat-
# purchase spans, the two-level inventory-turn reduction, and the
# first/last-affinity cohort matrix.
# =============================================================================


# --- ds73: TPC-DS Q78 cross-channel ratio --------------------------------------
# Q78 aggregates each channel per (customer, year) EXCLUDING returned
# rows, joins the channels, and ratios them. Channels map to order
# priority classes (urgent = web, rest = store). The ratio stays in
# integer space (cents * 100 // cents) so the band census hash-matches.

_DS73_ORACLE = """
WITH sales AS (
  SELECT o.o_custkey AS cust,
         CAST(YEAR(o.o_orderdate) AS INT) AS yr,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 'web' ELSE 'store' END AS channel,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag <> 'R'
  GROUP BY 1, 2, 3
),
paired AS (
  SELECT w.cust, w.yr,
         CAST(w.cents * 100 // s.cents AS BIGINT) AS ratio_pct
  FROM sales w JOIN sales s
    ON s.cust = w.cust AND s.yr = w.yr
   AND w.channel = 'web' AND s.channel = 'store' AND s.cents > 0
)
SELECT yr,
       CAST(LEAST(ratio_pct // 50, 4) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_custs
FROM paired GROUP BY 1, 2 ORDER BY yr, band
"""


@query(
    "ds73_cross_channel_ratio", _DS73_ORACLE,
    doc="TPC-DS Q78 class: per-(customer, year) channel aggregates "
        "(returns excluded) joined web-vs-store and ratio-banded — two "
        "partial aggregates on the same grain, one equi-join, integer "
        "ratio census",
)
def ds73(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") != "R"
    )
    sales = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "web"
            ).otherwise("store").alias("channel"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100.0).cast("long"))
            .cast("long").alias("cents")
        )
    )
    web = sales.filter(F.col("channel") == "web").select(
        "cust", "yr", F.col("cents").alias("w_cents")
    )
    store = sales.filter(
        (F.col("channel") == "store") & (F.col("cents") > 0)
    ).select(
        F.col("cust").alias("s_cust"), F.col("yr").alias("s_yr"),
        F.col("cents").alias("s_cents"),
    )
    paired = web.join(
        store,
        (F.col("cust") == F.col("s_cust")) & (F.col("yr") == F.col("s_yr")),
    ).select(
        "yr",
        F.least(
            F.expr("(w_cents * 100) DIV s_cents DIV 50"), F.lit(4)
        ).cast("long").alias("band"),
    )
    return (
        paired.groupBy("yr", "band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_custs"))
        .orderBy("yr", "band")
    )


# --- ds74: rollup-over-channel sales (Q5/Q77 class) ----------------------------
# The rollup-over-channel variants UNION per-channel frames (each its
# own source and netting rule) and ROLLUP over (channel, year): gross
# minus returned cents netted per channel first, super-aggregates from
# the same shuffle.

_DS74_ORACLE = """
WITH per_channel AS (
  SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 'web' ELSE 'store' END AS channel,
         CAST(YEAR(o.o_orderdate) AS INT) AS yr,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                       THEN -CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)
                       ELSE CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT)
                  END) AS BIGINT) AS net_cents,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT channel, yr,
       CAST(GROUPING(channel) * 2 + GROUPING(yr) AS INT) AS gid,
       CAST(SUM(net_cents) AS BIGINT) AS net_cents,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines
FROM per_channel
GROUP BY ROLLUP (channel, yr)
ORDER BY gid, channel, yr
"""


@query(
    "ds74_rollup_channel_sales", _DS74_ORACLE,
    doc="TPC-DS rollup-over-channel class (Q5/Q77): per-channel netted "
        "frames rolled up over (channel, year) with GROUPING markers — "
        "returns netted map-side, super-aggregates from one shuffle",
)
def ds74(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0).cast("long")
    per = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "web"
            ).otherwise("store").alias("channel"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", -cents).otherwise(cents)
            ).cast("long").alias("net_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
    rolled = per.rollup("channel", "yr").agg(
        # grouping() markers are only legal INSIDE the rollup aggregate
        (F.grouping("channel") * 2 + F.grouping("yr"))
        .cast("int").alias("gid"),
        F.sum("net_cents").cast("long").alias("net_cents"),
        F.sum("n_lines").cast("long").alias("n_lines"),
    )
    return rolled.select(
        "channel", "yr", "gid", "net_cents", "n_lines"
    ).orderBy("gid", "channel", "yr")


# --- ds75: repeat-purchase span (Q21-ish behavioural class) ---------------------
# Per (customer, brand): first/last purchase dates and the repeat
# census — the two-key grain reduces the fact once; the census is a
# second tiny aggregate over the reduced frame.

_DS75_ORACLE = """
WITH spans AS (
  SELECT o.o_custkey AS cust, p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n_buys,
         DATE_DIFF('day', MIN(o.o_orderdate), MAX(o.o_orderdate)) AS span_days
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p   ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(CASE WHEN n_buys >= 3 AND span_days > 365
                       THEN 1 END) AS BIGINT) AS loyal_custs
FROM spans GROUP BY brand ORDER BY brand
"""


@query(
    "ds75_repeat_purchase_span", _DS75_ORACLE,
    doc="TPC-DS repeat-purchase class: (customer, brand) grain reduced "
        "once (min/max date + count), loyalty census over the reduced "
        "frame — two aggregates, no window",
)
def ds75(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    spans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buys"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
            .alias("span_days"),
        )
    )
    return (
        spans.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count(
                F.when((F.col("n_buys") >= 3) & (F.col("span_days") > 365), 1)
            ).cast("long").alias("loyal_custs"),
        )
        .orderBy("brand")
    )


# --- ds76: inventory turns (Q39-adjacent two-level temporal reduction) ----------
# Weekly quantity per (brand, week) first — the only fact-sized
# shuffle — then annualised turns per brand over the tiny weekly frame:
# turns = total qty // avg weekly qty, banded. Differs from ds72 (Q39
# variance band): this is the two-level mean-reduction shape.

_DS76_ORACLE = """
WITH weekly AS (
  SELECT p.p_brand AS brand,
         DATE_TRUNC('week', l.l_shipdate)::DATE AS wk,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_weeks,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(MAX(qty) * 100 // MIN(qty) AS BIGINT) AS peak_over_trough_pct,
       MIN(CASE WHEN qty = mx THEN wk END) AS peak_week
FROM (SELECT *, MAX(qty) OVER (PARTITION BY brand) AS mx FROM weekly)
GROUP BY brand ORDER BY brand
"""


@query(
    "ds76_inventory_turns", _DS76_ORACLE,
    doc="TPC-DS Q39-adjacent two-level reduction: weekly qty per "
        "(brand, week) once, then brand-level peak-to-trough band and "
        "deterministic peak week over the tiny weekly frame",
)
def ds76(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    weekly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("week", F.col("l_shipdate"))).alias("wk"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    return (
        weekly.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_weeks"),
            F.sum("qty").cast("long").alias("total_qty"),
            F.expr("MAX(qty) * 100 DIV MIN(qty)")
            .cast("long").alias("peak_over_trough_pct"),
            F.min(
                F.struct((-F.col("qty")).alias("nq"), F.col("wk").alias("wk"))
            ).alias("_pk"),
        )
        .select(
            "brand", "n_weeks", "total_qty", "peak_over_trough_pct",
            F.col("_pk")["wk"].alias("peak_week"),
        )
        .orderBy("brand")
    )


# --- ds77: first/last priority affinity (Q54-ish cohort matrix) -----------------
# Per customer: the priority of the FIRST and LAST order (deterministic
# argmin/argmax via (date, orderkey) struct — orderkey is unique), then
# the cohort transition matrix. One fact-grain aggregate, one tiny
# census.

_DS77_ORACLE = """
WITH ranked AS (
  SELECT o_custkey AS cust, o_orderpriority AS prio,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
           AS rn_last
  FROM orders
),
fl AS (
  SELECT f.cust,
         f.prio AS first_prio,
         l.prio AS last_prio
  FROM ranked f JOIN ranked l
    ON l.cust = f.cust AND f.rn_first = 1 AND l.rn_last = 1
)
SELECT first_prio, last_prio, CAST(COUNT(*) AS BIGINT) AS n_custs
FROM fl GROUP BY 1, 2 ORDER BY first_prio, last_prio
"""


@query(
    "ds77_first_last_affinity", _DS77_ORACLE,
    doc="TPC-DS Q54-ish cohort matrix: deterministic first/last order "
        "priority per customer via min/max (date, orderkey, priority) "
        "struct — ONE aggregate, no window, no self-join on the Spark "
        "side; the oracle replays it with two ranking windows",
)
def ds77(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fl = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.min(
            F.struct("o_orderdate", "o_orderkey", "o_orderpriority")
        )["o_orderpriority"].alias("first_prio"),
        F.max(
            F.struct("o_orderdate", "o_orderkey", "o_orderpriority")
        )["o_orderpriority"].alias("last_prio"),
    )
    return (
        fl.groupBy("first_prio", "last_prio")
        .agg(F.count(F.lit(1)).cast("long").alias("n_custs"))
        .orderBy("first_prio", "last_prio")
    )


# =============================================================================
# Round-12 LDBC SNB BI drip (VERDICT r11 #5): the thinnest corpus
# (reference `benchmark/SOURCES.md:18-19`, `benchmark/ldbc/`) — message
# cascades (BI-17), community activity growth (BI-3), interaction-decay
# pair scores (BI-14), shortest-path-length distribution (BI-16) and
# the zombie-account census (BI-13), re-expressed on the events table.
# The social graph analogue: users co-occurring in a (event_type, hour)
# cell interact; cells above a df cap are dropped (the same hot-key
# discipline as l15 — a viral cell's pair set is quadratic and carries
# no discriminative signal).
# =============================================================================


# --- bi01: message cascade (LDBC BI-17 class) ---------------------------------
# Influence edge u -> v per event_type: v's FIRST event of the type
# falls within 10 minutes after u's first. Cascade = depth-bounded
# reachability from the type's earliest adopter. The reduced frame
# (one row per user x type) is vocabulary-sized: |users| x 5 — the
# recursion runs on THAT, never on raw events.

_BI01_ORACLE = """
WITH firsts AS (
  SELECT user_id, event_type, epoch_us(MIN(ts)) AS fus
  FROM events GROUP BY 1, 2
),
root AS (
  SELECT event_type, user_id, fus
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY fus, user_id) AS rn
        FROM firsts)
  WHERE rn = 1
),
d1 AS (
  SELECT DISTINCT f.event_type, f.user_id, f.fus
  FROM firsts f JOIN root r ON r.event_type = f.event_type
  WHERE f.fus > r.fus AND f.fus <= r.fus + 600000000
),
d2 AS (
  SELECT DISTINCT f.event_type, f.user_id
  FROM firsts f JOIN d1 ON d1.event_type = f.event_type
  WHERE f.fus > d1.fus AND f.fus <= d1.fus + 600000000
    AND NOT EXISTS (SELECT 1 FROM d1 x
                    WHERE x.event_type = f.event_type
                      AND x.user_id = f.user_id)
    AND NOT EXISTS (SELECT 1 FROM root x
                    WHERE x.event_type = f.event_type
                      AND x.user_id = f.user_id)
)
SELECT event_type, CAST(1 AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d1 GROUP BY 1
UNION ALL
SELECT event_type, CAST(2 AS INT), CAST(COUNT(*) AS BIGINT)
FROM d2 GROUP BY 1
ORDER BY event_type, depth
"""


@query(
    "bi01_message_cascade", _BI01_ORACLE,
    doc="LDBC BI-17 cascade class: depth-bounded influence reachability "
        "(10-min adoption windows) over the user x type first-event "
        "frame — recursion on the vocabulary-sized reduction, never raw "
        "events",
)
def bi01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.unix_micros(F.min("ts")).alias("fus")
    )
    w = Window.partitionBy("event_type").orderBy("fus", "user_id")
    root = (
        firsts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("event_type").alias("r_type"), F.col("fus").alias("r_fus"),
            F.col("user_id").alias("r_uid"),
        )
    )
    d1 = (
        firsts.join(F.broadcast(root), firsts.event_type == F.col("r_type"))
        .filter(
            (F.col("fus") > F.col("r_fus"))
            & (F.col("fus") <= F.col("r_fus") + 600000000)
        )
        .select("event_type", "user_id", "fus")
        .distinct()
    )
    d2 = (
        firsts.join(
            F.broadcast(
                d1.select(
                    F.col("event_type").alias("d_type"),
                    F.col("fus").alias("d_fus"),
                )
            ),
            firsts.event_type == F.col("d_type"),
        )
        .filter(
            (F.col("fus") > F.col("d_fus"))
            & (F.col("fus") <= F.col("d_fus") + 600000000)
        )
        .select("event_type", "user_id")
        .distinct()
        .join(
            d1.select("event_type", "user_id"),
            ["event_type", "user_id"], "left_anti",
        )
        .join(
            root.select(
                F.col("r_type").alias("event_type"),
                F.col("r_uid").alias("user_id"),
            ),
            ["event_type", "user_id"], "left_anti",
        )
    )
    out1 = d1.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).select("event_type", F.lit(1).cast("int").alias("depth"), "n_users")
    out2 = d2.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).select("event_type", F.lit(2).cast("int").alias("depth"), "n_users")
    return out1.unionByName(out2).orderBy("event_type", "depth")


# --- bi02: community activity growth (LDBC BI-3 class) --------------------------
# Community = event_type; week-over-week growth of posts via one lag
# window over the (type, week) reduction — the window runs on a frame
# of |types| x |weeks| rows at any corpus size.

_BI02_ORACLE = """
WITH weekly AS (
  SELECT event_type, date_trunc('week', ts)::DATE AS wk,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS members
  FROM events GROUP BY 1, 2
)
SELECT event_type, wk, n_events, members,
       CAST(n_events * 100 // LAG(n_events) OVER (
         PARTITION BY event_type ORDER BY wk) AS BIGINT) AS growth_pct
FROM weekly ORDER BY event_type, wk
"""


@query(
    "bi02_community_activity", _BI02_ORACLE,
    doc="LDBC BI-3 community-growth class: (type, week) reduction once, "
        "lag-window growth over the tiny weekly frame",
)
def bi02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("members"),
    )
    w = Window.partitionBy("event_type").orderBy("wk")
    return (
        weekly.withColumn("prev", F.lag("n_events").over(w))
        .select(
            "event_type", "wk", "n_events", "members",
            F.expr("n_events * 100 DIV prev").cast("long")
            .alias("growth_pct"),
        )
        .orderBy("event_type", "wk")
    )


# --- bi03: interaction-decay pair scores (LDBC BI-14 class) ---------------------
# Pair score = sum over shared (type, hour) cells of an integer recency
# weight (31 - days since corpus start). Cells with > 40 distinct users
# are dropped (df cap — quadratic pair sets with no signal); the
# remaining per-cell pair expansion is bounded by 40^2/2.

_BI03_ORACLE = """
WITH base AS (SELECT MIN(ts)::DATE AS day0 FROM events),
cells AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, user_id
  FROM events GROUP BY 1, 2, 3
),
sized AS (
  SELECT event_type, hr FROM cells GROUP BY 1, 2
  HAVING COUNT(*) <= 40
),
pairs AS (
  SELECT c1.user_id AS u1, c2.user_id AS u2,
         CAST(SUM(31 - DATE_DIFF('day', b.day0, c1.hr::DATE))
              AS BIGINT) AS score
  FROM cells c1
  JOIN cells c2 ON c2.event_type = c1.event_type AND c2.hr = c1.hr
               AND c1.user_id < c2.user_id
  JOIN sized s ON s.event_type = c1.event_type AND s.hr = c1.hr
  CROSS JOIN base b
  GROUP BY 1, 2
)
SELECT u1, u2, score FROM pairs ORDER BY score DESC, u1, u2 LIMIT 20
"""


@query(
    "bi03_interaction_decay", _BI03_ORACLE,
    doc="LDBC BI-14 pair-score class: df-capped (type, hour) cell "
        "co-occurrence pairs with integer recency decay — per-cell "
        "expansion bounded by the cap, top-k lowered",
)
def bi03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day0 = ev.agg(F.to_date(F.min("ts")).alias("day0"))
    cells = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "user_id",
    ).distinct()
    sized = (
        cells.groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("nu"))
        .filter(F.col("nu") <= 40)
        .select("event_type", "hr")
    )
    capped = cells.join(sized, ["event_type", "hr"])
    other = capped.select(
        F.col("event_type").alias("e2"), F.col("hr").alias("h2"),
        F.col("user_id").alias("u2"),
    )
    pairs = (
        capped.join(
            other,
            (F.col("event_type") == F.col("e2"))
            & (F.col("hr") == F.col("h2"))
            & (F.col("user_id") < F.col("u2")),
        )
        .join(F.broadcast(day0))
        .groupBy(F.col("user_id").alias("u1"), "u2")
        .agg(
            F.sum(
                F.lit(31) - F.datediff(F.to_date("hr"), F.col("day0"))
            ).cast("long").alias("score")
        )
    )
    return pairs.orderBy(
        F.col("score").desc(), "u1", "u2"
    ).limit(20)


# --- bi04: shortest-path length distribution (LDBC BI-16 class) ------------------
# BFS from the smallest user id over the undirected co-occurrence graph
# (same df-capped cells as bi03), depth <= 3; output the path-length
# histogram. Fixed-K frontier joins on the deduped edge set — the
# edge set is bounded by cap^2 x cells, the frontier by |users|.

_BI04_ORACLE = """
WITH cells AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, user_id
  FROM events GROUP BY 1, 2, 3
),
sized AS (
  SELECT event_type, hr FROM cells GROUP BY 1, 2
  HAVING COUNT(*) <= 40
),
edges AS (
  SELECT DISTINCT c1.user_id AS a, c2.user_id AS b
  FROM cells c1
  JOIN cells c2 ON c2.event_type = c1.event_type AND c2.hr = c1.hr
               AND c1.user_id <> c2.user_id
  JOIN sized s ON s.event_type = c1.event_type AND s.hr = c1.hr
),
d0 AS (SELECT MIN(a) AS uid FROM edges),
d1 AS (
  SELECT DISTINCT e.b AS uid FROM edges e JOIN d0 ON e.a = d0.uid
  WHERE e.b NOT IN (SELECT uid FROM d0)
),
d2 AS (
  SELECT DISTINCT e.b AS uid FROM edges e JOIN d1 ON e.a = d1.uid
  WHERE e.b NOT IN (SELECT uid FROM d0)
    AND e.b NOT IN (SELECT uid FROM d1)
),
d3 AS (
  SELECT DISTINCT e.b AS uid FROM edges e JOIN d2 ON e.a = d2.uid
  WHERE e.b NOT IN (SELECT uid FROM d0)
    AND e.b NOT IN (SELECT uid FROM d1)
    AND e.b NOT IN (SELECT uid FROM d2)
)
SELECT CAST(1 AS INT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_users FROM d1
UNION ALL SELECT CAST(2 AS INT), CAST(COUNT(*) AS BIGINT) FROM d2
UNION ALL SELECT CAST(3 AS INT), CAST(COUNT(*) AS BIGINT) FROM d3
ORDER BY depth
"""


@query(
    "bi04_path_length_dist", _BI04_ORACLE,
    doc="LDBC BI-16 path-length class: depth-3 BFS histogram from the "
        "smallest user over df-capped co-occurrence edges — fixed-K "
        "frontier joins, visited set subtracted per level",
)
def bi04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "user_id",
    ).distinct()
    sized = (
        cells.groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("nu"))
        .filter(F.col("nu") <= 40)
        .select("event_type", "hr")
    )
    capped = cells.join(sized, ["event_type", "hr"])
    other = capped.select(
        F.col("event_type").alias("e2"), F.col("hr").alias("h2"),
        F.col("user_id").alias("b"),
    )
    edges = (
        capped.join(
            other,
            (F.col("event_type") == F.col("e2"))
            & (F.col("hr") == F.col("h2"))
            & (F.col("user_id") != F.col("b")),
        )
        .select(F.col("user_id").alias("a"), "b")
        .distinct()
    )
    # the BFS frontier frames are user-sized — pin them so each level
    # is computed once (the driver collects the tiny histogram only)
    edges = edges.localCheckpoint(eager=True)
    d0 = edges.agg(F.min("a").alias("uid"))
    visited = d0
    levels = []
    frontier = d0
    for _ in range(3):
        nxt = (
            edges.join(
                F.broadcast(frontier.select(F.col("uid").alias("a"))), "a"
            )
            .select(F.col("b").alias("uid"))
            .distinct()
            .join(F.broadcast(visited), "uid", "left_anti")
        ).localCheckpoint(eager=True)
        levels.append(nxt)
        visited = visited.unionByName(nxt).distinct().localCheckpoint(
            eager=True
        )
        frontier = nxt
    out = None
    for i, lvl in enumerate(levels, start=1):
        row = lvl.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("depth"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("depth")


# --- bi05: zombie accounts (LDBC BI-13 class) ------------------------------------
# Zombie = fewer than 2 events per active week (integer cross-multiplied:
# n_events * 7 < span_days * 2). Census per signup-week cohort — one
# user-grain aggregate, one tiny cohort aggregate.

_BI05_ORACLE = """
WITH stats AS (
  SELECT user_id,
         MIN(ts)::DATE AS first_day,
         DATE_DIFF('day', MIN(ts)::DATE, MAX(ts)::DATE) + 1 AS span_days,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT date_trunc('week', first_day)::DATE AS cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(CASE WHEN n_events * 7 < span_days * 2 THEN 1 END)
            AS BIGINT) AS n_zombies
FROM stats GROUP BY 1 ORDER BY cohort_week
"""


@query(
    "bi05_zombie_accounts", _BI05_ORACLE,
    doc="LDBC BI-13 zombie class: per-user activity stats reduced once, "
        "integer cross-multiplied rate test, signup-week cohort census",
)
def bi05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day"),
        (
            F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))) + 1
        ).alias("span_days"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        stats.groupBy(
            F.to_date(F.date_trunc("week", F.col("first_day")))
            .alias("cohort_week")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count(
                F.when(F.col("n_events") * 7 < F.col("span_days") * 2, 1)
            ).cast("long").alias("n_zombies"),
        )
        .orderBy("cohort_week")
    )


# =============================================================================
# Round-12 ClickBench tail (VERDICT r11 corpus depth): the last eight
# uncovered shape classes from benchmark/clickbench/queries.sql — the
# global scan-aggregate battery (Q0-Q6), distinct-count-ranked groups
# (Q8-Q11), the composite-key mixed-aggregate battery (Q30-Q32), the
# constant group key (Q34), arithmetic-duplicate group keys (Q35), pure
# selection time-ordered top-k (Q24-Q26), the date-windowed flag-filtered
# deep-offset page (Q36-Q40), and the SELECT * wide-row fetch (Q23).
# All on the synthetic events table; every aggregate integer-exact.
# =============================================================================


# --- c36: global scan-aggregate battery ---------------------------------------
# ClickBench Q0-Q6: one full scan, NO grouping — plain COUNT, a filtered
# COUNT, an integer SUM, two COUNT(DISTINCT)s and the time-range MIN/MAX,
# all in a single partial-aggregate pass (one row crosses the shuffle).

_C36_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN value > 100 THEN 1 END) AS BIGINT) AS n_big,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       epoch_us(MIN(ts)) AS min_us,
       epoch_us(MAX(ts)) AS max_us
FROM events
"""


@query(
    "c36_global_scan_battery", _C36_ORACLE,
    doc="ClickBench Q0-Q6 class: scan-only global aggregate battery — "
        "no GROUP BY, map-side partials, one row over the shuffle",
)
def c36(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.when(F.col("value") > 100, 1)).cast("long").alias("n_big"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long").alias("sum_cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.unix_micros(F.min("ts").cast("timestamp")).alias("min_us"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("max_us"),
    )


# --- c37: distinct-count-ranked groups -----------------------------------------
# ClickBench Q8-Q11: groups ranked by COUNT(DISTINCT UserID) — the
# ranking metric is itself the expensive distinct aggregate. The model
# key is extracted from the props JSON payload (regexp, codegen) like
# MobilePhoneModel; the empty-model filter mirrors `<> ''`.

_C37_ORACLE = """
SELECT CAST(CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 25 AS BIGINT)
         AS model,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u,
       CAST(COUNT(*) AS BIGINT) AS c
FROM events
WHERE regexp_extract(props, '[0-9]+') <> ''
GROUP BY 1
ORDER BY u DESC, model
LIMIT 10
"""


@query(
    "c37_distinct_rank_topk", _C37_ORACLE,
    doc="ClickBench Q8-Q11 class: top-10 groups ranked by "
        "COUNT(DISTINCT user) — distinct expansion then count, the "
        "ranking metric is the distinct aggregate itself",
)
def c37(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), "[0-9]+", 0)
    return (
        ev.filter(k != "")
        .groupBy((k.cast("long") % 25).cast("long").alias("model"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("u"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .orderBy(F.desc("u"), "model")
        .limit(10)
    )


# --- c38: composite-key mixed-aggregate battery --------------------------------
# ClickBench Q30-Q32: a high-cardinality composite key (WatchID,
# ClientIP analogue) with COUNT / flag-SUM / AVG side by side, top-10 by
# count. The average is emitted as an integer fixed-point quotient so
# the gate stays order-independent and engine-exact.

_C38_ORACLE = """
SELECT user_id,
       CAST(CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 16 AS BIGINT)
         AS ip_bucket,
       CAST(COUNT(*) AS BIGINT) AS c,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_refresh,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100
            // COUNT(*) AS BIGINT) AS avg_cents_x100
FROM events
WHERE event_type <> 'error'
GROUP BY 1, 2
ORDER BY c DESC, user_id, ip_bucket
LIMIT 10
"""


@query(
    "c38_composite_mixed_battery", _C38_ORACLE,
    doc="ClickBench Q30-Q32 class: high-cardinality composite key with "
        "COUNT + conditional SUM + fixed-point AVG in one aggregate "
        "pass, top-10 by count",
)
def c38(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long")
    return (
        ev.filter(F.col("event_type") != "error")
        .groupBy(
            "user_id",
            (k % 16).cast("long").alias("ip_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).cast("long").alias("n_refresh"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) * 100)
            .alias("_sum_x100"),
        )
        # integer DIV, not double `/` + cast: the double quotient truncates
        # where DuckDB's cast rounds — off-by-one at every .99 boundary
        .select(
            "user_id", "ip_bucket", "c", "n_refresh",
            F.expr("_sum_x100 DIV c").cast("long").alias("avg_cents_x100"),
        )
        .orderBy(F.desc("c"), "user_id", "ip_bucket")
        .limit(10)
    )


# --- c39: constant group key ----------------------------------------------------
# ClickBench Q34 (`SELECT 1, URL ... GROUP BY 1, URL`): a literal in the
# grouping list — Catalyst folds the constant out of the shuffle key, so
# the plan is identical to grouping by the URL alone with the constant
# re-projected after.

_C39_ORACLE = """
SELECT 1 AS one,
       '/p' || CAST(user_id % 20 AS VARCHAR) AS url,
       CAST(COUNT(*) AS BIGINT) AS c
FROM events
GROUP BY 1, 2
ORDER BY c DESC, url
LIMIT 10
"""


@query(
    "c39_const_group_key", _C39_ORACLE,
    doc="ClickBench Q34 class: literal constant in the grouping list — "
        "folded out of the shuffle key, re-projected after the aggregate",
)
def c39(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(F.lit("/p"), (F.col("user_id") % 20).cast("string"))
    return (
        ev.groupBy(F.lit(1).alias("one"), url.alias("url"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.desc("c"), "url")
        .limit(10)
    )


# --- c40: arithmetic-duplicate group keys ----------------------------------------
# ClickBench Q35 (`GROUP BY ClientIP, ClientIP - 1, ClientIP - 2, ...`):
# four grouping expressions that are all functions of ONE column — the
# group count is exactly the distinct user count; the derived keys ride
# along without widening the shuffle key space.

_C40_ORACLE = """
SELECT user_id,
       user_id - 1 AS u1, user_id - 2 AS u2, user_id - 3 AS u3,
       CAST(COUNT(*) AS BIGINT) AS c
FROM events
GROUP BY 1, 2, 3, 4
ORDER BY c DESC, user_id
LIMIT 10
"""


@query(
    "c40_derived_dup_keys", _C40_ORACLE,
    doc="ClickBench Q35 class: several grouping expressions over one "
        "column — functionally a single key, the derived offsets ride "
        "along without multiplying group cardinality",
)
def c40(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            (F.col("user_id") - 1).alias("u1"),
            (F.col("user_id") - 2).alias("u2"),
            (F.col("user_id") - 3).alias("u3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .limit(10)
    )


# --- c41: selection-only time-ordered top-k --------------------------------------
# ClickBench Q24-Q26: NO aggregation — a filtered selection ordered by
# event time (with a full tiebreak for determinism), first 10 rows.
# Lowers to TakeOrderedAndProject: per-partition heaps, no global sort.

_C41_ORACLE = """
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
FROM events
WHERE event_type <> 'view'
ORDER BY ts, event_id
LIMIT 10
"""


@query(
    "c41_selection_time_topk", _C41_ORACLE,
    doc="ClickBench Q24-Q26 class: aggregation-free filtered selection "
        "ordered by event time, top-10 — TakeOrderedAndProject, never a "
        "global sort",
)
def c41(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") != "view")
        .select(
            "event_id", "user_id", "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .orderBy(F.col("ts_us"), "event_id")
        .limit(10)
    )


# --- c42: date-windowed flag-filtered deep-offset page ----------------------------
# ClickBench Q36-Q40: a date window plus several flag equalities and an
# IN-list, grouped on (derived key, day), ordered by pageviews with a
# deep OFFSET page — the offset is applied after the top-k sort, so only
# offset+limit rows ever reach the driver.

_C42_ORACLE = """
SELECT CAST(CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 100 AS BIGINT)
         AS url_hash,
       CAST(ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS pageviews
FROM events
WHERE ts >= TIMESTAMP '2024-01-07' AND ts < TIMESTAMP '2024-01-14'
  AND event_type IN ('click', 'view')
  AND value > 10
GROUP BY 1, 2
ORDER BY pageviews DESC, url_hash, day
LIMIT 10 OFFSET 100
"""


@query(
    "c42_window_flags_deep_page", _C42_ORACLE,
    doc="ClickBench Q36-Q40 class: pushed date window + IN-list flags, "
        "(key, day) grouping, deep OFFSET page after the count ranking",
)
def c42(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long")
    ranked = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-07").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-14").cast("timestamp"))
            & F.col("event_type").isin("click", "view")
            & (F.col("value") > 10)
        )
        .groupBy(
            (k % 100).cast("long").alias("url_hash"),
            F.to_date("ts").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pageviews"))
        .orderBy(F.desc("pageviews"), "url_hash", "day")
    )
    return ranked.offset(100).limit(10)


# --- c43: SELECT * wide-row fetch -------------------------------------------------
# ClickBench Q23 (`SELECT * ... ORDER BY EventTime LIMIT 10`): the full
# row — every column — rides through the top-k; only the final 10 wide
# rows are materialised at the driver. Money emitted as integer cents so
# the row hash is engine-exact.

_C43_ORACLE = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents, props
FROM events
WHERE props LIKE '%9}'
ORDER BY ts, event_id
LIMIT 10
"""


@query(
    "c43_star_row_fetch", _C43_ORACLE,
    doc="ClickBench Q23 class: SELECT * top-k by time under a LIKE "
        "filter — the wide row rides the per-partition heap; only "
        "offset+limit rows reach the driver",
)
def c43(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like("%9}"))
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id", "event_type",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
            "props",
        )
        .orderBy("ts_us", "event_id")
        .limit(10)
    )


# =============================================================================
# Round-12 LDBC SNB BI drip, second batch (bi06-bi10) — the share-of-total
# posting summary (BI-1), friend triangles (BI-11), the hop-band EXCEPT
# neighborhood (BI-10), mutual-friend recommendation (BI-18) and tag
# evolution (BI-2) from benchmark/ldbc/. The graph gates run on a
# two-grain (minute UNION hour) co-occurrence edge set with a tight
# per-cell cap (2..8 users): unlike bi03/bi04's hour-grain cap-40
# recipe this keeps the graph sparse (23k edges / 1.5k nodes at sf0.1,
# where every hour cell is over-cap and only the minute arm survives)
# yet non-empty at tiny SF (where only hour cells reach two users), so
# triangle and two-path expansions stay equi-join-bounded at any SF —
# the df-cap IS the scale control, exactly like d20's pigeonhole bands.
# =============================================================================

_MINUTE_EDGES_CTE = """
mcells AS (
  SELECT event_type, date_trunc('minute', ts) AS mn, user_id
  FROM events GROUP BY 1, 2, 3
),
msized AS (
  SELECT event_type, mn FROM mcells GROUP BY 1, 2
  HAVING COUNT(*) BETWEEN 2 AND 8
),
hcells AS (
  SELECT event_type, date_trunc('hour', ts) AS mn, user_id
  FROM events GROUP BY 1, 2, 3
),
hsized AS (
  SELECT event_type, mn FROM hcells GROUP BY 1, 2
  HAVING COUNT(*) BETWEEN 2 AND 8
),
edges AS (
  SELECT DISTINCT c1.user_id AS a, c2.user_id AS b
  FROM mcells c1
  JOIN mcells c2 ON c2.event_type = c1.event_type AND c2.mn = c1.mn
               AND c1.user_id < c2.user_id
  JOIN msized s ON s.event_type = c1.event_type AND s.mn = c1.mn
  UNION
  SELECT DISTINCT c1.user_id AS a, c2.user_id AS b
  FROM hcells c1
  JOIN hcells c2 ON c2.event_type = c1.event_type AND c2.mn = c1.mn
               AND c1.user_id < c2.user_id
  JOIN hsized s ON s.event_type = c1.event_type AND s.mn = c1.mn
)"""


def _minute_edges(ev: DataFrame) -> DataFrame:
    """Canonical (a < b) co-occurrence edges at TWO grains (minute UNION
    hour), per-cell df-cap 2..8 distinct users — the sparse social graph
    for bi07-bi09/bi12. Two grains make the recipe scale-adaptive: at
    tiny SF only hour cells reach two users (minute arm empty); at large
    SF hour cells exceed the cap and get dropped, leaving the minute arm
    (still capped). Either way the edge set stays sparse and non-empty,
    and the cap bounds every downstream pair expansion."""

    def grain_edges(grain: str) -> DataFrame:
        cells = ev.select(
            "event_type",
            F.date_trunc(grain, F.col("ts")).alias("mn"),
            "user_id",
        ).distinct()
        sized = (
            cells.groupBy("event_type", "mn")
            .agg(F.count(F.lit(1)).alias("nu"))
            .filter((F.col("nu") >= 2) & (F.col("nu") <= 8))
            .select("event_type", "mn")
        )
        capped = cells.join(sized, ["event_type", "mn"])
        other = capped.select(
            F.col("event_type").alias("e2"), F.col("mn").alias("m2"),
            F.col("user_id").alias("b"),
        )
        return (
            capped.join(
                other,
                (F.col("event_type") == F.col("e2"))
                & (F.col("mn") == F.col("m2"))
                & (F.col("user_id") < F.col("b")),
            )
            .select(F.col("user_id").alias("a"), "b")
        )

    return (
        grain_edges("minute").unionByName(grain_edges("hour")).distinct()
    )


# --- bi06: posting summary with share-of-total (LDBC BI-1 class) ------------------
# BI-1 groups messages by (year, isComment, lengthCategory) and emits the
# count, sum, average AND each group's percentage of ALL messages — the
# global total rides as a one-row broadcast scalar; the average and the
# share are integer fixed-point (DIV) so the gate is engine-exact.

_BI06_ORACLE = """
WITH total AS (SELECT CAST(COUNT(*) AS BIGINT) AS mc FROM events)
SELECT date_trunc('week', ts)::DATE AS week,
       event_type = 'purchase' AS is_purchase,
       CASE WHEN value < 40 THEN 0 WHEN value < 80 THEN 1
            WHEN value < 160 THEN 2 ELSE 3 END AS band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) // COUNT(*) AS BIGINT)
         AS avg_cents,
       CAST(COUNT(*) * 10000 // t.mc AS BIGINT) AS share_bp
FROM events, total t
GROUP BY 1, 2, 3, t.mc
ORDER BY week DESC, is_purchase, band
"""


@query(
    "bi06_posting_summary_share", _BI06_ORACLE,
    doc="LDBC BI-1 class: (week, kind, size-band) summary with each "
        "group's share of the global total — the total is a one-row "
        "broadcast scalar; average and share are integer DIV fixed-point",
)
def bi06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).cast("long").alias("mc"))
    band = (
        F.when(F.col("value") < 40, 0)
        .when(F.col("value") < 80, 1)
        .when(F.col("value") < 160, 2)
        .otherwise(3)
    )
    grouped = (
        ev.groupBy(
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"),
            (F.col("event_type") == "purchase").alias("is_purchase"),
            band.alias("band"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long").alias("sum_cents"),
        )
        .join(F.broadcast(total))
    )
    return (
        grouped.select(
            "week", "is_purchase", "band", "n", "sum_cents",
            F.expr("sum_cents DIV n").cast("long").alias("avg_cents"),
            F.expr("n * 10000 DIV mc").cast("long").alias("share_bp"),
        )
        .orderBy(F.desc("week"), "is_purchase", "band")
    )


# --- bi07: friend triangles (LDBC BI-11 class) -------------------------------------
# Triangle census over the canonical (a < b) edge set: (a,b),(b,c),(a,c)
# counts each triangle exactly once. Two equi-joins over the df-capped
# edges — the two-path expansion is bounded by the per-cell cap, never
# |V|^2; the closing join is a hash probe on (a, c).

_BI07_ORACLE = f"""
WITH {_MINUTE_EDGES_CTE}
SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM
             (SELECT a FROM edges UNION SELECT b FROM edges)) AS BIGINT)
         AS n_nodes,
       CAST((SELECT COUNT(*)
             FROM edges e1
             JOIN edges e2 ON e2.a = e1.b
             JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
         AS n_triangles
"""


@query(
    "bi07_friend_triangles", _BI07_ORACLE,
    doc="LDBC BI-11 triangle class: canonical-edge triangle census — "
        "two hash equi-joins close each (a<b<c) exactly once; the "
        "two-path expansion is bounded by the df-cap",
)
def bi07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # one materialisation feeds all three census arms and the self-joins
    edges = _minute_edges(ev).localCheckpoint(eager=True)
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_nodes = (
        edges.select(F.col("a").alias("uid"))
        .unionByName(edges.select(F.col("b").alias("uid")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        edges.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        n_edges.join(F.broadcast(n_nodes)).join(F.broadcast(tri))
    )


# --- bi08: hop-band neighborhood census (LDBC BI-10 class) --------------------------
# BI-10 wants people BETWEEN 3 and 4 hops out (reachable-in-k EXCEPT
# reachable-in-(k-1)); here the exactly-2-hops band from the smallest
# user, then a census of that band's activity by event type — the
# hop-band set difference is the distinctive operator.

_BI08_ORACLE = f"""
WITH {_MINUTE_EDGES_CTE},
und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
root AS (SELECT MIN(a) AS uid FROM edges),
h1 AS (
  SELECT DISTINCT und.b AS uid FROM und JOIN root ON und.a = root.uid
),
h2 AS (
  SELECT DISTINCT und.b AS uid FROM und JOIN h1 ON und.a = h1.uid
  WHERE und.b NOT IN (SELECT uid FROM h1)
    AND und.b NOT IN (SELECT uid FROM root)
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN h2 ON e.user_id = h2.uid
GROUP BY 1 ORDER BY 1
"""


@query(
    "bi08_hop_band_census", _BI08_ORACLE,
    doc="LDBC BI-10 class: exactly-2-hops band (reachable-in-2 EXCEPT "
        "reachable-in-1) from a fixed root, then an activity census of "
        "the band — frontier joins + anti-joins, band is user-bounded",
)
def bi08(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    edges = _minute_edges(ev).localCheckpoint(eager=True)
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    root = edges.agg(F.min("a").alias("uid"))
    h1 = (
        und.join(F.broadcast(root.select(F.col("uid").alias("a"))), "a")
        .select(F.col("b").alias("uid"))
        .distinct()
    )
    h2 = (
        und.join(F.broadcast(h1.select(F.col("uid").alias("a"))), "a")
        .select(F.col("b").alias("uid"))
        .distinct()
        .join(F.broadcast(h1), "uid", "left_anti")
        .join(F.broadcast(root), "uid", "left_anti")
    )
    return (
        ev.join(F.broadcast(h2), ev.user_id == h2.uid)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )


# --- bi09: mutual-friend recommendation (LDBC BI-18 class) ---------------------------
# For non-adjacent pairs sharing at least one neighbor: score = number of
# mutual friends; top-20. Two-path expansion over the undirected edges
# (bounded by the df-cap), then an anti-join against the direct edges —
# never a pairwise users x users product.

_BI09_ORACLE = f"""
WITH {_MINUTE_EDGES_CTE},
und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
cand AS (
  SELECT p1.b AS u, p2.b AS v, p1.a AS w
  FROM und p1 JOIN und p2 ON p2.a = p1.a AND p1.b < p2.b
),
scored AS (
  SELECT u, v, CAST(COUNT(DISTINCT w) AS BIGINT) AS mutuals
  FROM cand
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.a = cand.u AND e.b = cand.v)
  GROUP BY 1, 2
)
SELECT u, v, mutuals FROM scored
ORDER BY mutuals DESC, u, v
LIMIT 20
"""


@query(
    "bi09_mutual_friend_rec", _BI09_ORACLE,
    doc="LDBC BI-18 recommendation class: mutual-neighbor counts for "
        "non-adjacent pairs — two-path equi-join bounded by the df-cap, "
        "LeftAnti against direct edges, top-20 lowered",
)
def bi09(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    edges = _minute_edges(ev).localCheckpoint(eager=True)
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    p2 = und.select(F.col("a").alias("w2"), F.col("b").alias("v"))
    cand = (
        und.select(F.col("a").alias("w"), F.col("b").alias("u"))
        .join(p2, (F.col("w") == F.col("w2")) & (F.col("u") < F.col("v")))
        .select("u", "v", "w")
    )
    non_adjacent = cand.join(
        edges,
        (cand.u == edges.a) & (cand.v == edges.b),
        "left_anti",
    )
    return (
        non_adjacent.groupBy("u", "v")
        .agg(F.countDistinct("w").cast("long").alias("mutuals"))
        .orderBy(F.desc("mutuals"), "u", "v")
        .limit(20)
    )


# --- bi10: tag evolution (LDBC BI-2 class) -------------------------------------------
# BI-2 compares each tag's activity across two consecutive windows and
# ranks by the absolute delta. Tags synthesized from (event_type, props
# key decade); both window counts are conditional aggregates over ONE
# scan — no self-join of the two periods.

_BI10_ORACLE = """
SELECT event_type,
       CAST(CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 10 AS BIGINT)
         AS tag,
       CAST(COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-01'
                        AND ts < TIMESTAMP '2024-01-08' THEN 1 END)
            AS BIGINT) AS n_window_a,
       CAST(COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-08'
                        AND ts < TIMESTAMP '2024-01-15' THEN 1 END)
            AS BIGINT) AS n_window_b,
       CAST(ABS(COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-01'
                            AND ts < TIMESTAMP '2024-01-08' THEN 1 END)
              - COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-08'
                            AND ts < TIMESTAMP '2024-01-15' THEN 1 END))
            AS BIGINT) AS delta
FROM events
WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
GROUP BY 1, 2
ORDER BY delta DESC, event_type, tag
LIMIT 20
"""


@query(
    "bi10_tag_evolution", _BI10_ORACLE,
    doc="LDBC BI-2 class: two consecutive windows compared per tag via "
        "conditional counts over ONE scan (no period self-join), ranked "
        "by absolute delta, top-20 lowered",
)
def bi10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    in_a = (F.col("ts") >= F.lit("2024-01-01").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-08").cast("timestamp")
    )
    in_b = (F.col("ts") >= F.lit("2024-01-08").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-01-15").cast("timestamp")
    )
    tag = (
        F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long") % 10
    ).cast("long")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
        )
        .groupBy("event_type", tag.alias("tag"))
        .agg(
            F.count(F.when(in_a, 1)).cast("long").alias("n_window_a"),
            F.count(F.when(in_b, 1)).cast("long").alias("n_window_b"),
        )
        .select(
            "event_type", "tag", "n_window_a", "n_window_b",
            F.abs(F.col("n_window_a") - F.col("n_window_b"))
            .cast("long").alias("delta"),
        )
        .orderBy(F.desc("delta"), "event_type", "tag")
        .limit(20)
    )


# =============================================================================
# Round-12 TPC-DS tail, second batch (ds78-ds82) — the remaining
# distinctive template classes from benchmark/tpcds/: the Q9
# scalar-subquery CASE ladder, Q13's OR-of-ANDs disjunctive selectivity,
# Q44's rank-join best/worst report, Q65's aggregate-of-aggregate
# threshold, and the Q50/Q99 cross-fact latency-band matrix.
# =============================================================================


# --- ds78: bucketed scalar-subquery CASE ladder (TPC-DS Q9 class) -----------------
# Q9 probes five quantity buckets, each CASE-choosing between two scalar
# subqueries on a count threshold — fifteen scans as written. The Spark
# plan computes ALL bucket aggregates in ONE scan (conditional
# aggregates) and applies the CASE on the single result row; the oracle
# keeps the literal scalar-subquery ladder, proving the rewrite exact.

_DS78_ORACLE = """
SELECT
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 40000
       THEN (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 1 AND 10)
       ELSE (SELECT CAST(COUNT(*) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) > 40000
       THEN (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 11 AND 20)
       ELSE (SELECT CAST(COUNT(*) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) > 40000
       THEN (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 21 AND 30)
       ELSE (SELECT CAST(COUNT(*) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) END AS bucket3,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) > 40000
       THEN (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 31 AND 40)
       ELSE (SELECT CAST(COUNT(*) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) END AS bucket4,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) > 40000
       THEN (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 41 AND 50)
       ELSE (SELECT CAST(COUNT(*) AS BIGINT)
             FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) END AS bucket5
"""


@query(
    "ds78_bucket_case_ladder", _DS78_ORACLE,
    doc="TPC-DS Q9 class: five quantity buckets each CASE-choosing "
        "between a SUM and a COUNT on a count threshold — fifteen "
        "scalar subqueries collapsed into ONE conditional-aggregate "
        "scan (the oracle keeps the literal ladder, proving the "
        "rewrite exact)",
)
def ds78(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    aggs = []
    for i, (lo, hi) in enumerate(
        [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)], start=1
    ):
        inb = F.col("l_quantity").between(lo, hi)
        aggs.append(F.count(F.when(inb, 1)).alias(f"n{i}"))
        aggs.append(
            F.sum(F.when(inb, cents)).cast("long").alias(f"s{i}")
        )
    one = li.agg(*aggs)
    return one.select(
        *[
            F.when(F.col(f"n{i}") > 40000, F.col(f"s{i}"))
            .otherwise(F.col(f"n{i}").cast("long"))
            .alias(f"bucket{i}")
            for i in range(1, 6)
        ]
    )


# --- ds79: disjunctive OR-of-ANDs selectivity (TPC-DS Q13 class) -------------------
# Q13 joins the fact to demographics under three (segment x price-range)
# disjuncts, each arm with its own range — a disjunction the planner
# must NOT turn into a cross product; it stays one residual-filtered
# broadcast join, and the aggregate is band-tagged.

_DS79_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) // COUNT(*)
            AS BIGINT) AS avg_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE (c.c_mktsegment = 'BUILDING' AND o.o_totalprice BETWEEN 50000 AND 150000
         AND c.c_acctbal > 0)
   OR (c.c_mktsegment = 'AUTOMOBILE' AND o.o_totalprice BETWEEN 100000 AND 250000
         AND c.c_acctbal > 2000)
   OR (c.c_mktsegment = 'MACHINERY' AND o.o_totalprice BETWEEN 150000 AND 400000
         AND c.c_acctbal > 5000)
GROUP BY 1 ORDER BY 1
"""


@query(
    "ds79_disjunctive_selectivity", _DS79_ORACLE,
    doc="TPC-DS Q13 class: OR-of-ANDs disjunctive predicate across the "
        "fact-dimension join — one broadcast hash join with the "
        "disjunction as a residual filter, never an arm-per-scan union",
)
def ds79(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    arm = (
        (
            (F.col("c_mktsegment") == "BUILDING")
            & F.col("o_totalprice").between(50000, 150000)
            & (F.col("c_acctbal") > 0)
        )
        | (
            (F.col("c_mktsegment") == "AUTOMOBILE")
            & F.col("o_totalprice").between(100000, 250000)
            & (F.col("c_acctbal") > 2000)
        )
        | (
            (F.col("c_mktsegment") == "MACHINERY")
            & F.col("o_totalprice").between(150000, 400000)
            & (F.col("c_acctbal") > 5000)
        )
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        joined.filter(arm)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("long").alias("sum_cents"),
        )
        .select(
            "segment", "n_orders", "sum_cents",
            F.expr("sum_cents DIV n_orders").cast("long").alias("avg_cents"),
        )
        .orderBy("segment")
    )


# --- ds80: rank-join best/worst report (TPC-DS Q44 class) --------------------------
# Q44 ranks items by performance ascending AND descending, then joins
# the two rankings on rank so row k pairs the k-th best with the k-th
# worst. One reduced (brand, revenue) frame, two windows over it, a
# self-join on rank — never a re-scan of the fact.

_DS80_ORACLE = """
WITH perf AS (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
),
best AS (
  SELECT brand, ROW_NUMBER() OVER (ORDER BY rev_cents DESC, brand) AS rnk
  FROM perf
),
worst AS (
  SELECT brand, ROW_NUMBER() OVER (ORDER BY rev_cents ASC, brand) AS rnk
  FROM perf
)
SELECT b.rnk AS rnk, b.brand AS best_brand, w.brand AS worst_brand
FROM best b JOIN worst w ON b.rnk = w.rnk
WHERE b.rnk <= 10
ORDER BY rnk
"""


@query(
    "ds80_rank_join_best_worst", _DS80_ORACLE,
    doc="TPC-DS Q44 class: ascending and descending rankings of ONE "
        "reduced performance frame joined on rank — the fact reduces "
        "once; the windows and the rank join run on the brand-grain "
        "frame",
)
def ds80(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    perf = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).cast("long").alias("rev_cents")
        )
    )
    best = perf.select(
        "brand",
        F.row_number()
        .over(Window.orderBy(F.desc("rev_cents"), "brand"))
        .alias("rnk"),
    )
    worst = perf.select(
        F.col("brand").alias("worst_brand"),
        F.row_number()
        .over(Window.orderBy(F.asc("rev_cents"), F.col("brand")))
        .alias("rnk2"),
    )
    return (
        best.filter(F.col("rnk") <= 10)
        .join(worst, F.col("rnk") == F.col("rnk2"))
        .select("rnk", F.col("brand").alias("best_brand"), "worst_brand")
        .orderBy("rnk")
    )


# --- ds81: aggregate-of-aggregate threshold (TPC-DS Q65 class) ----------------------
# Q65 finds (store, item) pairs whose revenue sits below a fraction of
# the store's average item revenue — an aggregate OVER an aggregate:
# the inner (nation, brand) sums reduce the fact once; the per-nation
# average of those sums is vocabulary-sized and broadcasts back. The
# threshold is "below 90%" (rev*10 < avg*9): (nation, brand) sums
# concentrate toward the mean as SF grows, and Q65's literal 10% bound
# is vacuous on this corpus beyond sf0.001 (zero-row audit).

_DS81_ORACLE = """
WITH pair_rev AS (
  SELECT s.s_nationkey AS nation, p.p_brand AS brand,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
nation_avg AS (
  SELECT nation,
         CAST(SUM(rev_cents) // COUNT(*) AS BIGINT) AS avg_cents
  FROM pair_rev GROUP BY 1
)
SELECT pr.nation, pr.brand, pr.rev_cents, na.avg_cents
FROM pair_rev pr JOIN nation_avg na ON pr.nation = na.nation
WHERE pr.rev_cents * 10 < na.avg_cents * 9
ORDER BY pr.nation, pr.brand
"""


@query(
    "ds81_agg_of_agg_threshold", _DS81_ORACLE,
    doc="TPC-DS Q65 class: pairs below 90% of their group's average "
        "item revenue — the fact reduces once to (nation, brand) sums; "
        "the average-of-sums is nation-sized and broadcasts back; the "
        "threshold is integer cross-multiplied",
)
def ds81(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    pair_rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long").alias("rev_cents")
        )
    )
    nation_avg = (
        pair_rev.groupBy("nation")
        .agg(
            F.sum("rev_cents").alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select("nation", F.expr("_s DIV _n").cast("long").alias("avg_cents"))
    )
    return (
        pair_rev.join(F.broadcast(nation_avg), "nation")
        .filter(F.col("rev_cents") * 10 < F.col("avg_cents") * 9)
        .select("nation", "brand", "rev_cents", "avg_cents")
        .orderBy("nation", "brand")
    )


# --- ds82: cross-fact latency-band matrix (TPC-DS Q50/Q99 class) --------------------
# Q50/Q99 band the days between two fact events (sale->return,
# order->ship) into 30/60/90/120+ buckets and emit a band-per-column
# census. order->ship latency via the co-partitioned orderkey join;
# the matrix is conditional counts per return flag.

_DS82_ORACLE = """
SELECT l.l_returnflag AS flag,
       CAST(COUNT(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) <= 30
                       THEN 1 END) AS BIGINT) AS d30,
       CAST(COUNT(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                            BETWEEN 31 AND 60 THEN 1 END) AS BIGINT) AS d60,
       CAST(COUNT(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                            BETWEEN 61 AND 90 THEN 1 END) AS BIGINT) AS d90,
       CAST(COUNT(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) > 90
                       THEN 1 END) AS BIGINT) AS d90plus
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""


@query(
    "ds82_latency_band_matrix", _DS82_ORACLE,
    doc="TPC-DS Q50/Q99 class: order-to-ship latency banded 30/60/90+ "
        "as a band-per-column census — ONE co-partitioned orderkey join "
        "(zero-shuffle under the clustered layout), conditional counts",
)
def ds82(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lat = F.datediff(
        F.to_date(F.col("l_shipdate")), F.to_date(F.col("o_orderdate"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.when(lat <= 30, 1)).cast("long").alias("d30"),
            F.count(F.when(lat.between(31, 60), 1)).cast("long").alias("d60"),
            F.count(F.when(lat.between(61, 90), 1)).cast("long").alias("d90"),
            F.count(F.when(lat > 90, 1)).cast("long").alias("d90plus"),
        )
        .orderBy("flag")
    )


# =============================================================================
# Round-12 SSB completion (b39-b41) — the remaining flight-variant
# classes from benchmark/ssb/: the flight-1 band-NARROWING scan
# (q1-2/q1-3: the same flat fact filter with progressively tighter
# bands — selectivity-driven, no dim at all), the flight-3 point-pair
# at month grain (q3-4: both geo dims pinned to points, time pinned to
# one month), and the flight-4 drill-down profit (q4-2/q4-3: the Q4.1
# profit rollup with narrowed dims and a WIDER group key). With these,
# every SSB flight variant has a class-equivalent gate (13/13).
# =============================================================================


# --- b39: SSB flight-1 narrowing variant (q1-2/q1-3) ------------------------------
# Q1.2/Q1.3 tighten Q1.1's year to one month and the discount/quantity
# bands to width 2-3: the revenue delta is fully scan-side — no join,
# band predicates pushed, one global sum.

_B39_ORACLE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity BETWEEN 26 AND 35
"""


@query(
    "b39_ssb_narrow_band", _B39_ORACLE,
    doc="SSB Q1.2/Q1.3 class: the flight-1 flat scan with the month "
        "pinned and discount/quantity bands narrowed — pure pushed-"
        "predicate selectivity, no join, one global sum",
)
def b39(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & F.col("l_quantity").between(26, 35)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
                .cast("long")
            ).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b40: SSB flight-3 point-pair (q3-4) -----------------------------
# Q3.4 pins BOTH geo dims to point cities and the date to one window —
# the star collapses to two 1-nation broadcast probes over a
# month-pruned fact slice; output is the (cust-nation, supp-nation)
# pair volume.

_B40_ORACLE = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE cn.n_name = 'NATION_11' AND sn.n_name = 'NATION_20'
  AND o.o_orderdate >= TIMESTAMP '1997-04-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
GROUP BY 1, 2
"""


@query(
    "b40_ssb_point_pair", _B40_ORACLE,
    doc="SSB Q3.4 class: both geo dims pinned to points, time pinned "
        "to one half-year — the most selective flight-3 variant (the "
        "literal one-month window is empty below sf0.01 on this "
        "corpus); point dims broadcast, fact slice range-pruned",
)
def b40(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.filter(F.col("n_name") == "NATION_11").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.filter(F.col("n_name") == "NATION_20").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    month = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-04-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    return (
        li.join(month, li.l_orderkey == month.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- b41: SSB flight-4 drill-down profit (q4-2/q4-3) --------------------------------
# Q4.2/Q4.3 take the Q4.1 profit rollup and DRILL DOWN: dims narrow
# (one supplier region, one part type family, two years) while the
# group key WIDENS to (year, nation, brand) — more groups from less
# data, the opposite selectivity direction from flight 1.

_B41_ORACLE = """
SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
       sn.n_name AS supp_nation, p.p_brand AS brand,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT))
            - SUM(CAST(ROUND(p.p_retailprice * l.l_quantity * 100)
                       AS BIGINT) // 2) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN region r ON sn.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND p.p_type LIKE 'PROM%'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@query(
    "b41_ssb_drilldown_profit", _B41_ORACLE,
    doc="SSB Q4.2/Q4.3 class: the flight-4 profit rollup drilled down — "
        "narrower dims (one region, one type family, two years) but a "
        "WIDER (year, nation, brand) group key; derived profit measure "
        "in integer cents",
)
def b41(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("supp_nation"))
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    cost = F.expr(
        "CAST(ROUND(p_retailprice * l_quantity * 100) AS BIGINT) DIV 2"
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(
            F.broadcast(part.filter(F.col("p_type").like("PROM%"))),
            li.l_partkey == part.p_partkey,
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("snk"))
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            "supp_nation",
            F.col("p_brand").alias("brand"),
        )
        .agg(
            (F.sum(rev) - F.sum(cost)).cast("long").alias("profit_cents")
        )
        .orderBy("yr", "supp_nation", "brand")
    )


# =============================================================================
# Round-12 LDBC SNB BI drip, third batch (bi11-bi14) — top-k-container
# detail (BI-4), authority scores (BI-6), the message-count distribution
# (BI-12), and recency-weighted tag co-occurrence recommendation (BI-8)
# from benchmark/ldbc/. bi12/bi14 reuse the minute-grain df-capped edge
# set (_minute_edges) so their pair expansions stay join-bounded.
# =============================================================================


# --- bi11: top-k containers then detail (LDBC BI-4 class) --------------------------
# BI-4 ranks the top-100 forums by membership, then reports message
# stats WITHIN those forums only — a top-k key set driving a semi-join
# into the detail. Here: the 5 busiest days drive the per-type census.

_BI11_ORACLE = """
WITH top_days AS (
  SELECT CAST(ts AS DATE) AS day
  FROM events GROUP BY 1
  ORDER BY COUNT(*) DESC, day LIMIT 5
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT CAST(e.ts AS DATE)) AS BIGINT) AS n_days
FROM events e JOIN top_days d ON CAST(e.ts AS DATE) = d.day
GROUP BY 1 ORDER BY 1
"""


@query(
    "bi11_top_container_detail", _BI11_ORACLE,
    doc="LDBC BI-4 class: top-k containers (busiest days) selected "
        "first, then a detail census ONLY within them — the top-k key "
        "set broadcasts into a semi-join on the fact",
)
def bi11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    top_days = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "day")
        .limit(5)
        .select("day")
    )
    return (
        ev.join(
            F.broadcast(top_days), F.to_date(ev.ts) == F.col("day"), "left_semi"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.countDistinct(F.to_date("ts")).cast("long").alias("n_days"),
        )
        .orderBy("event_type")
    )


# --- bi12: authority scores (LDBC BI-6 class) ---------------------------------------
# BI-6 scores each person by the POPULARITY OF THE PEOPLE WHO LIKE
# them (sum over likers of the liker's own message count) — a
# two-level score: per-user popularity reduces the fact once, then one
# join over the edge set adds up each user's neighbors' popularity.

_BI12_ORACLE = f"""
WITH {_MINUTE_EDGES_CTE},
und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
pop AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS popularity
  FROM events GROUP BY 1
)
SELECT und.a AS user_id,
       CAST(SUM(p.popularity) AS BIGINT) AS authority,
       CAST(COUNT(*) AS BIGINT) AS n_neighbors
FROM und JOIN pop p ON und.b = p.user_id
GROUP BY 1
ORDER BY authority DESC, user_id
LIMIT 20
"""


@query(
    "bi12_authority_scores", _BI12_ORACLE,
    doc="LDBC BI-6 class: authority = sum of one's neighbors' own "
        "popularity — the fact reduces once to per-user counts, then "
        "ONE equi-join over the df-capped edges; top-20 lowered",
)
def bi12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    edges = _minute_edges(ev).localCheckpoint(eager=True)
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    pop = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("popularity")
    )
    return (
        und.join(pop, und.b == pop.user_id)
        .groupBy(F.col("a").alias("user_id"))
        .agg(
            F.sum("popularity").cast("long").alias("authority"),
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        )
        .orderBy(F.desc("authority"), "user_id")
        .limit(20)
    )


# --- bi13: message-count distribution (LDBC BI-12 class) -----------------------------
# BI-12 asks how many persons posted more than N messages for a ladder
# of thresholds — the count-of-counts distribution: the fact reduces to
# per-user counts, then a SECOND aggregate histograms the counts into
# power-of-two buckets.

_BI13_ORACLE = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
)
SELECT CAST(FLOOR(LOG2(n)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(n) AS BIGINT) AS min_msgs,
       CAST(MAX(n) AS BIGINT) AS max_msgs
FROM per_user
GROUP BY 1 ORDER BY 1
"""


@query(
    "bi13_count_distribution", _BI13_ORACLE,
    doc="LDBC BI-12 class: count-of-counts — per-user message counts "
        "histogrammed into power-of-two buckets by a second aggregate; "
        "output bounded by log2(max count)",
)
def bi13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_user.groupBy(
            F.floor(F.log2("n")).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("n").cast("long").alias("min_msgs"),
            F.max("n").cast("long").alias("max_msgs"),
        )
        .orderBy("bucket")
    )


# --- bi14: recency-weighted tag co-occurrence (LDBC BI-8 class) ----------------------
# BI-8 recommends tags related to a seed tag, scored by co-occurrence
# with a recency boost. Here: event types co-occurring with 'purchase'
# in the same (user, day), score = plain count + double-weighted
# last-week count — conditional integer weights, one pair join on the
# (user, day) grain.

_BI14_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
  FROM events
),
seed AS (
  SELECT user_id, day FROM ud WHERE event_type = 'purchase'
)
SELECT o.event_type AS related_tag,
       CAST(COUNT(*) AS BIGINT) AS n_cooccur,
       CAST(SUM(CASE WHEN o.day >= DATE '2024-01-24' THEN 2 ELSE 1 END)
            AS BIGINT) AS score
FROM ud o JOIN seed s ON o.user_id = s.user_id AND o.day = s.day
WHERE o.event_type <> 'purchase'
GROUP BY 1
ORDER BY score DESC, related_tag
"""


@query(
    "bi14_tag_cooccurrence", _BI14_ORACLE,
    doc="LDBC BI-8 class: tags co-occurring with a seed tag on the "
        "(user, day) grain, recency-boosted with integer weights — the "
        "grain deduplicates BEFORE the pair join, so the expansion is "
        "bounded by days x types per user",
)
def bi14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    seed = ud.filter(F.col("event_type") == "purchase").select(
        "user_id", "day"
    )
    return (
        ud.filter(F.col("event_type") != "purchase")
        .join(seed, ["user_id", "day"])
        .groupBy(F.col("event_type").alias("related_tag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cooccur"),
            F.sum(
                F.when(F.col("day") >= F.lit("2024-01-24").cast("date"), 2)
                .otherwise(1)
            ).cast("long").alias("score"),
        )
        .orderBy(F.desc("score"), "related_tag")
    )


# =============================================================================
# Round-12 TPC-DS tail, third batch (ds83-ds86) — the Q25/Q29
# sale-return-repurchase three-fact chain, the Q46/Q68 dim-attribute
# mismatch census, the Q53/Q63 deviation-from-partition-mean filter,
# and the Q56/Q60 union-of-channels report over one shared item set.
# =============================================================================


# --- ds83: sale -> return -> repurchase chain (TPC-DS Q25/Q29 class) ----------------
# Q25/Q29 chain three fact events per customer: a sale, its return, and
# a later repurchase. Returned lines reduce to each customer's FIRST
# return date (one aggregate, never a fact x fact fan-out); later
# orders join against that reduced frame.

_DS83_ORACLE = """
WITH first_return AS (
  SELECT o.o_custkey AS custkey, MIN(o.o_orderdate) AS first_ret
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1
),
reorders AS (
  SELECT fr.custkey,
         CAST(COUNT(*) AS BIGINT) AS n_reorders,
         CAST(SUM(CAST(ROUND(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS reorder_cents
  FROM first_return fr
  JOIN orders o2 ON o2.o_custkey = fr.custkey
                AND o2.o_orderdate > fr.first_ret
  GROUP BY 1
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(r.n_reorders) AS BIGINT) AS n_reorders,
       CAST(SUM(r.reorder_cents) AS BIGINT) AS reorder_cents
FROM reorders r JOIN customer c ON r.custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


@query(
    "ds83_return_repurchase_chain", _DS83_ORACLE,
    doc="TPC-DS Q25/Q29 class: sale -> return -> repurchase chained "
        "per customer — returns reduce to a first-return date BEFORE "
        "the reorder join (never fact x fact), census per segment",
)
def ds83(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    first_return = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.min("o_orderdate").alias("first_ret"))
    )
    reorders = (
        first_return.join(
            orders,
            (F.col("o_custkey") == F.col("custkey"))
            & (F.col("o_orderdate") > F.col("first_ret")),
        )
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reorders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long").alias("reorder_cents"),
        )
    )
    return (
        reorders.join(F.broadcast(cust), reorders.custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_reorders").cast("long").alias("n_reorders"),
            F.sum("reorder_cents").cast("long").alias("reorder_cents"),
        )
        .orderBy("segment")
    )


# --- ds84: dim-attribute mismatch census (TPC-DS Q46/Q68 class) ---------------------
# Q46/Q68 flag trips where the delivery city differs from the home
# city — an INEQUALITY between two dimension attributes of the joined
# row. Supplier nation vs customer nation across the order; census per
# customer nation of cross-nation volume.

_DS84_ORACLE = """
SELECT c.c_nationkey AS cust_nation,
       CAST(COUNT(*) AS BIGINT) AS n_cross_lines,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cross_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE s.s_nationkey <> c.c_nationkey
GROUP BY 1 ORDER BY 1
"""


@query(
    "ds84_attribute_mismatch", _DS84_ORACLE,
    doc="TPC-DS Q46/Q68 class: inequality between two DIM attributes of "
        "the joined row (supplier nation <> customer nation) — the "
        "mismatch is a residual filter after broadcast dim joins, never "
        "a join condition explosion",
)
def ds84(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("c_nationkey").alias("cust_nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cross_lines"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long").alias("cross_cents"),
        )
        .orderBy("cust_nation")
    )


# --- ds85: deviation-from-partition-mean filter (TPC-DS Q53/Q63 class) ---------------
# Q53/Q63 keep the (manager, month) rows whose sales deviate from the
# manager's average month — a filter ON a window aggregate. The
# deviation test is integer cross-multiplied (|rev*n - total| * 10 >
# total * n / ... rearranged) so the gate is engine-exact.

_DS85_ORACLE = """
WITH brand_month AS (
  SELECT p.p_brand AS brand,
         date_trunc('month', o.o_orderdate)::DATE AS month,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
with_tot AS (
  SELECT brand, month, rev_cents,
         SUM(rev_cents) OVER (PARTITION BY brand) AS tot,
         COUNT(*) OVER (PARTITION BY brand) AS n
  FROM brand_month
)
SELECT brand, month, rev_cents,
       CAST(tot // n AS BIGINT) AS brand_avg_cents
FROM with_tot
WHERE ABS(rev_cents * n - tot) * 10 > tot * 3
ORDER BY brand, month
"""


@query(
    "ds85_deviation_filter", _DS85_ORACLE,
    doc="TPC-DS Q53/Q63 class: keep (brand, month) rows deviating >30% "
        "from the brand's average month — a filter ON a window "
        "aggregate over the reduced grain; integer cross-multiplied",
)
def ds85(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    brand_month = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("month", F.col("o_orderdate")))
            .alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long").alias("rev_cents")
        )
    )
    w = Window.partitionBy("brand")
    with_tot = brand_month.select(
        "brand", "month", "rev_cents",
        F.sum("rev_cents").over(w).alias("tot"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return (
        with_tot.filter(
            F.abs(F.col("rev_cents") * F.col("n") - F.col("tot")) * 10
            > F.col("tot") * 3
        )
        .select(
            "brand", "month", "rev_cents",
            F.expr("tot DIV n").cast("long").alias("brand_avg_cents"),
        )
        .orderBy("brand", "month")
    )


# --- ds86: union-of-channels over one item set (TPC-DS Q56/Q60 class) ----------------
# Q56/Q60 measure the SAME item set across three channels via UNION ALL
# and total per item. Channels = order-priority classes; the shared
# item set (small parts) is one broadcast filter applied to every arm;
# totals stack via a union then ONE aggregate.

_DS86_ORACLE = """
WITH item_set AS (
  SELECT p_partkey, p_brand FROM part WHERE p_size <= 5
),
arms AS (
  SELECT i.p_brand AS brand, 'urgent' AS channel,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN item_set i ON l.l_partkey = i.p_partkey
  WHERE o.o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT i.p_brand, 'high',
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN item_set i ON l.l_partkey = i.p_partkey
  WHERE o.o_orderpriority = '2-HIGH'
  UNION ALL
  SELECT i.p_brand, 'low',
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN item_set i ON l.l_partkey = i.p_partkey
  WHERE o.o_orderpriority = '5-LOW'
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(COUNT(DISTINCT channel) AS BIGINT) AS n_channels
FROM arms
GROUP BY 1
ORDER BY total_cents DESC, brand
LIMIT 15
"""


@query(
    "ds86_union_channels_itemset", _DS86_ORACLE,
    doc="TPC-DS Q56/Q60 class: one shared (broadcast) item set measured "
        "across three channel arms via UNION ALL, totalled per item in "
        "ONE aggregate after the union; top-15 lowered",
)
def ds86(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    item_set = part.filter(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand"
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")

    def arm(priority: str, label: str) -> DataFrame:
        return (
            li.join(
                orders.filter(F.col("o_orderpriority") == priority),
                li.l_orderkey == orders.o_orderkey,
            )
            .join(F.broadcast(item_set), li.l_partkey == F.col("p_partkey"))
            .select(
                F.col("p_brand").alias("brand"),
                F.lit(label).alias("channel"),
                cents.alias("cents"),
            )
        )

    arms = (
        arm("1-URGENT", "urgent")
        .unionByName(arm("2-HIGH", "high"))
        .unionByName(arm("5-LOW", "low"))
    )
    return (
        arms.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.countDistinct("channel").cast("long").alias("n_channels"),
        )
        .orderBy(F.desc("total_cents"), "brand")
        .limit(15)
    )


# --- bi15: related topics (LDBC BI-7 class) ------------------------------------------
# BI-7 finds tags that co-appear with a seed tag's audience but EXCLUDES
# the seed itself: users who used the seed tag drive a semi-join into
# the detail, the seed rows are removed, and the remaining tags rank by
# distinct audience. The exclude-the-seed step is the distinctive op.

_BI15_ORACLE = """
WITH seed_users AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
)
SELECT e.event_type AS related_topic,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS audience,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN seed_users s ON e.user_id = s.user_id
WHERE e.event_type <> 'signup'
GROUP BY 1
ORDER BY audience DESC, related_topic
"""


@query(
    "bi15_related_topics", _BI15_ORACLE,
    doc="LDBC BI-7 class: the seed tag's audience drives a semi-join "
        "into the detail, seed rows are excluded, remaining topics rank "
        "by distinct audience — the exclude-the-seed co-occurrence op",
)
def bi15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seed_users = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
    )
    return (
        ev.filter(F.col("event_type") != "signup")
        .join(seed_users, "user_id", "left_semi")
        .groupBy(F.col("event_type").alias("related_topic"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("audience"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy(F.desc("audience"), "related_topic")
    )


# --- ds87: revenue share within category (TPC-DS Q12/Q20/Q98 class) ------------------
# Q12/Q20/Q98 emit each item's share of its CLASS total revenue — a
# ratio against a window aggregate over the reduced grain. Share in
# basis points by integer DIV so the gate is engine-exact.

_DS87_ORACLE = """
WITH brand_rev AS (
  SELECT p.p_type AS category, p.p_brand AS brand,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT category, brand, rev_cents,
       CAST(rev_cents * 10000 //
            SUM(rev_cents) OVER (PARTITION BY category) AS BIGINT)
         AS share_bp
FROM brand_rev
ORDER BY category, share_bp DESC, brand
"""


@query(
    "ds87_category_revenue_share", _DS87_ORACLE,
    doc="TPC-DS Q12/Q20/Q98 class: each item's share of its class total "
        "as a ratio against a window SUM over the reduced (category, "
        "brand) grain — share in integer basis points",
)
def ds87(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_type").alias("category"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long").alias("rev_cents")
        )
    )
    w = Window.partitionBy("category")
    return (
        brand_rev.select(
            "category", "brand", "rev_cents",
            F.sum("rev_cents").over(w).alias("_cat_tot"),
        )
        .select(
            "category", "brand", "rev_cents",
            F.expr("rev_cents * 10000 DIV _cat_tot").cast("long")
            .alias("share_bp"),
        )
        .orderBy("category", F.desc("share_bp"), "brand")
    )


# --- ds88: disjunctive existence (TPC-DS Q15/Q45 class) -----------------------------
# Q45 keeps a row when a LOCAL predicate holds OR the key appears in a
# subquery — an existence test under a disjunction, which CANNOT lower
# to a plain semi-join (the OR would drop the local arm). The subquery
# side reduces to distinct keys and joins LEFT with a match flag; the
# filter is (local OR flag) — one join, no union-of-arms double scan.

_DS88_ORACLE = """
WITH big_buyers AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(CASE WHEN c.c_nationkey IN (2, 5, 11) THEN 1 END)
            AS BIGINT) AS n_local_arm,
       CAST(COUNT(CASE WHEN b.o_custkey IS NOT NULL THEN 1 END)
            AS BIGINT) AS n_subquery_arm
FROM customer c LEFT JOIN big_buyers b ON c.c_custkey = b.o_custkey
WHERE c.c_nationkey IN (2, 5, 11) OR b.o_custkey IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


@query(
    "ds88_disjunctive_existence", _DS88_ORACLE,
    doc="TPC-DS Q15/Q45 class: local predicate OR subquery membership — "
        "existence under a disjunction, lowered to ONE left join with a "
        "match flag (a plain semi-join would drop the local arm; a "
        "union of arms would scan twice)",
)
def ds88(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
        .distinct()
    )
    local_arm = F.col("c_nationkey").isin(2, 5, 11)
    flagged = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    return (
        flagged.filter(local_arm | F.col("o_custkey").isNotNull())
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.count(F.when(local_arm, 1)).cast("long").alias("n_local_arm"),
            F.count(F.when(F.col("o_custkey").isNotNull(), 1))
            .cast("long").alias("n_subquery_arm"),
        )
        .orderBy("segment")
    )


# =============================================================================
# Round 13: TPC-DS template tail (classes Q42/52/55, Q37/82, Q61, Q92,
# Q96, Q71, Q75/80, Q84/91, Q76, Q81 — reference benchmark/tpcds/*.tpl)
# and the final two LDBC SNB BI classes (BI-5, BI-9 —
# benchmark/ldbc/bi-5.sql, bi-9.sql). Same conventions: quantised
# integer sums, broadcast dimensions, reductions before windows.
# =============================================================================


# --- ds89: month x brand revenue top-k (TPC-DS Q42/Q52/Q55 class) ----------
# The simplest DS star: date-dim x brand revenue, top-k by revenue.
# Filter reaches the part scan (p_size), the year bound reaches the
# lineitem scan; the brand dim broadcasts; TakeOrderedAndProject caps
# the result — the plan a 1000-executor run wants.

_DS89_ORACLE = """
SELECT date_trunc('month', l_shipdate)::DATE AS mon, p_brand,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0)
           AS BIGINT)) AS BIGINT) AS rev_q
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size < 15
  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
GROUP BY 1, 2
ORDER BY rev_q DESC, mon, p_brand LIMIT 10
"""


@query(
    "ds89_brand_month_topk", _DS89_ORACLE,
    doc="TPC-DS Q42/Q52/Q55 class: date x brand star revenue, top-10 by "
        "revenue — broadcast dim, pushed year bound, "
        "TakeOrderedAndProject",
)
def ds89(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.to_date(F.date_trunc("month", "l_shipdate")).alias("mon"),
            "p_brand",
        )
        .agg(
            F.sum(
                _q(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev_q")
        )
        .orderBy(F.desc("rev_q"), "mon", "p_brand")
        .limit(10)
    )


# --- ds90: item attributes x sales-window existence (Q37/Q82 class) --------
# Item attribute listing restricted to items that SOLD inside a 90-day
# window — the inventory-band existence shape, as a distinct-count over
# the window-restricted fact join (the attribute dim broadcasts).

_DS90_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_size IN (2, 9, 23, 38)
  AND p_retailprice BETWEEN 500 AND 1500
  AND l_shipdate >= '1997-03-01' AND l_shipdate < '1997-06-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3 LIMIT 100
"""


@query(
    "ds90_item_window_existence", _DS90_ORACLE,
    doc="TPC-DS Q37/Q82 class: item-attribute listing restricted to a "
        "90-day sales window — distinct-order count per attribute "
        "triple, dim filters pushed to the part scan",
)
def ds90(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(2, 9, 23, 38)
        & F.col("p_retailprice").between(500, 1500)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-06-01")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
        .orderBy("p_brand", "p_type", "p_size")
        .limit(100)
    )


# --- ds91: promotional share of revenue (Q61 class) -------------------------
# Promo-vs-total ratio per month: both arms come from ONE conditional-
# aggregate scan (Q61 runs two correlated star subqueries; the fused
# form reads the fact once), ratio reported in integer basis points.

_DS91_ORACLE = """
SELECT date_trunc('month', l_shipdate)::DATE AS mon,
       CAST(SUM(CASE WHEN l_discount >= 0.05
           THEN CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)
           ELSE 0 END) AS BIGINT) AS promo_q,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT))
           AS BIGINT) AS total_q,
       CAST(SUM(CASE WHEN l_discount >= 0.05
           THEN CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)
           ELSE 0 END) * 10000
           // NULLIF(SUM(CAST(FLOOR(l_extendedprice * 10000.0)
                        AS BIGINT)), 0) AS BIGINT) AS promo_bp
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type = 'ECONOMY'
GROUP BY 1 ORDER BY 1
"""


@query(
    "ds91_promo_share", _DS91_ORACLE,
    doc="TPC-DS Q61 class: promotional vs total revenue ratio per month "
        "— Q61's two correlated star subqueries fused into ONE "
        "conditional-aggregate scan, exact basis points via integer "
        "division",
)
def ds91(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    pq = F.sum(
        F.when(F.col("l_discount") >= 0.05, _q(F.col("l_extendedprice")))
        .otherwise(F.lit(0))
    )
    tq = F.sum(_q(F.col("l_extendedprice")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("mon"))
        .agg(pq.alias("promo_q"), tq.alias("total_q"))
        .withColumn(
            "promo_bp",
            # exact integer basis points at ANY scale: DECIMAL(38,0)
            # widening + integral DIV mirrors DuckDB's HUGEINT `//`
            # bit-for-bit (a double-precision floor diverges once the
            # numerator exceeds 2^53 — self-review r13)
            F.expr(
                "CAST(CAST(promo_q AS DECIMAL(38,0)) * 10000"
                " DIV NULLIF(total_q, 0) AS BIGINT)"
            ),
        )
        .orderBy("mon")
    )


# --- ds92: excess-discount lines (Q92 class) ---------------------------------
# Lines whose discount exceeds 1.3x their part's window-average
# discount. The comparison is EXACT integer (10*d_q*n > 13*sum_q —
# algebraically d > 1.3*avg without a float average), so both engines
# agree at every boundary; the per-part aggregate joins back on
# l_partkey, the window bound prunes both scans.

_DS92_ORACLE = """
WITH pa AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_discount * 10000.0) AS BIGINT)) AS sum_q,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-07-01'
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_excess,
       CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0)
           AS BIGINT)) AS BIGINT) AS excess_amt_q
FROM lineitem JOIN pa USING (l_partkey)
WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-07-01'
  AND CAST(FLOOR(l_discount * 10000.0) AS BIGINT) * 10 * pa.n
      > 13 * pa.sum_q
"""


@query(
    "ds92_excess_discount", _DS92_ORACLE,
    doc="TPC-DS Q92 class: lines discounted above 1.3x their part's "
        "window-average — the correlated average becomes a grouped "
        "re-join, threshold compared in exact integer space",
)
def ds92(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1998-07-01")
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum(_q(F.col("l_discount"))).alias("sum_q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        li.join(pa, "l_partkey")
        .filter(
            _q(F.col("l_discount")) * 10 * F.col("n")
            > 13 * F.col("sum_q")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_excess"),
            F.sum(
                _q(F.col("l_extendedprice") * F.col("l_discount"))
            ).alias("excess_amt_q"),
        )
    )


# --- ds93: pure multi-predicate selectivity count (Q96 class) ----------------
# Q96 is a bare COUNT(*) under hour x demographic x store predicates —
# the plan-shape point is that EVERYTHING pushes to the scan and the
# count is a partial-aggregate merge with NO shuffle of data rows.

_DS93_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS cnt
FROM events
WHERE EXTRACT(hour FROM ts) = 20
  AND event_type = 'click'
  AND value BETWEEN 5 AND 50
"""


@query(
    "ds93_selectivity_count", _DS93_ORACLE,
    doc="TPC-DS Q96 class: bare COUNT(*) under hour x type x value-band "
        "predicates — all filters at the scan, partial-count merge, "
        "zero data-row shuffle",
)
def ds93(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.hour("ts") == 20)
            & (F.col("event_type") == "click")
            & F.col("value").between(5, 50)
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


# --- ds94: hour-of-day revenue across a channel union (Q71 class) ------------
# Q71 unions three sales channels and reports brand revenue by hour.
# Two event-type arms play the channels; the union is computed ONCE
# per arm with its own pushed filter, then a single (channel, hour)
# aggregation — never a per-hour rescan.

_DS94_ORACLE = """
WITH ch AS (
  SELECT 'clicks' AS channel, EXTRACT(hour FROM ts) AS hr, value
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'views' AS channel, EXTRACT(hour FROM ts) AS hr, value
  FROM events WHERE event_type = 'view'
)
SELECT channel, CAST(hr AS BIGINT) AS hr,
       CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS BIGINT) AS amt_q,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ch GROUP BY 1, 2
ORDER BY amt_q DESC, channel, hr LIMIT 24
"""


@query(
    "ds94_hourly_channel_union", _DS94_ORACLE,
    doc="TPC-DS Q71 class: hour-of-day revenue across a UNION ALL of "
        "channels — per-arm pushed type filter, one aggregation over "
        "the union, top-24 by amount",
)
def ds94(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def arm(label: str, etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select(
            F.lit(label).alias("channel"),
            F.hour("ts").cast("long").alias("hr"),
            "value",
        )

    return (
        arm("clicks", "click").unionByName(arm("views", "view"))
        .groupBy("channel", "hr")
        .agg(
            F.sum(_q(F.col("value"))).alias("amt_q"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy(F.desc("amt_q"), "channel", "hr")
        .limit(24)
    )


# --- ds95: year-over-year decline by brand across channels (Q75/Q80 class) --
# Per (brand, year) quantity/amount across a two-channel union, self-
# joined to the prior year, reporting brands whose quantity declined.
# The yoy comparison runs on the |brands| x |years| reduction — the
# self-join input is tiny at any corpus scale.

_DS95_ORACLE = """
WITH ch AS (
  SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS yr,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0)
              AS BIGINT) AS amt_q
  FROM lineitem WHERE l_linestatus = 'F'
  UNION ALL
  SELECT l_partkey, EXTRACT(year FROM l_shipdate),
         CAST(l_quantity AS BIGINT),
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0)
              AS BIGINT)
  FROM lineitem WHERE l_linestatus = 'O'
),
by_year AS (
  SELECT p_brand, yr, SUM(qty) AS qty, SUM(amt_q) AS amt_q
  FROM ch JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT cur.p_brand, CAST(cur.yr AS BIGINT) AS yr,
       CAST(prv.qty AS BIGINT) AS prev_qty, CAST(cur.qty AS BIGINT) AS cur_qty,
       CAST(cur.amt_q - prv.amt_q AS BIGINT) AS amt_delta_q
FROM by_year cur JOIN by_year prv
  ON cur.p_brand = prv.p_brand AND cur.yr = prv.yr + 1
WHERE cur.qty * 10 < prv.qty * 9
ORDER BY amt_delta_q, cur.p_brand, yr LIMIT 100
"""


@query(
    "ds95_yoy_brand_decline", _DS95_ORACLE,
    doc="TPC-DS Q75/Q80 class: year-over-year decline by brand across a "
        "channel union — channels reduced to (brand, year) BEFORE the "
        "yoy self-join, decline test in integer space (qty*10 < prev*9)",
)
def ds95(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def arm(status: str) -> DataFrame:
        return li.filter(F.col("l_linestatus") == status).select(
            "l_partkey",
            F.year("l_shipdate").alias("yr"),
            F.col("l_quantity").cast("long").alias("qty"),
            _q(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("amt_q"),
        )

    by_year = (
        arm("F").unionByName(arm("O"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "yr")
        .agg(F.sum("qty").alias("qty"), F.sum("amt_q").alias("amt_q"))
    )
    cur, prv = by_year.alias("cur"), by_year.alias("prv")
    return (
        cur.join(
            prv,
            (F.col("cur.p_brand") == F.col("prv.p_brand"))
            & (F.col("cur.yr") == F.col("prv.yr") + 1),
        )
        .filter(F.col("cur.qty") * 10 < F.col("prv.qty") * 9)
        .select(
            F.col("cur.p_brand").alias("p_brand"),
            F.col("cur.yr").cast("long").alias("yr"),
            F.col("prv.qty").alias("prev_qty"),
            F.col("cur.qty").alias("cur_qty"),
            (F.col("cur.amt_q") - F.col("prv.amt_q")).alias("amt_delta_q"),
        )
        .orderBy("amt_delta_q", "p_brand", "yr")
        .limit(100)
    )


# --- ds96: multi-dimension row fetch with formatting (Q84/Q91 class) ---------
# Customer lookup through two snowflaked dims with band predicates and
# a concatenated display identity — Q84's "customer by income band and
# city" as nation/region/segment/balance bands. Pure broadcast-dim
# pipeline, top-100 by key.

_DS96_ORACLE = """
SELECT c_custkey, c_name || ' [' || n_name || ']' AS ident, c_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_mktsegment = 'BUILDING'
  AND c_acctbal BETWEEN 4000 AND 6000
ORDER BY c_custkey LIMIT 100
"""


@query(
    "ds96_snowflake_row_fetch", _DS96_ORACLE,
    doc="TPC-DS Q84/Q91 class: customer fetch through snowflaked "
        "region->nation dims with band predicates and a concatenated "
        "display identity — broadcast dims, ordered top-100",
)
def ds96(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "BUILDING")
        & F.col("c_acctbal").between(4000, 6000)
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        cust.join(
            F.broadcast(
                nat.join(reg, nat.n_regionkey == reg.r_regionkey)
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            F.concat(
                F.col("c_name"), F.lit(" ["), F.col("n_name"), F.lit("]")
            ).alias("ident"),
            "c_acctbal",
        )
        .orderBy("c_custkey")
        .limit(100)
    )


# --- ds97: dangling-dimension census per channel x year (Q76 class) ----------
# Q76 counts fact rows whose dimension surrogate is NULL per channel.
# The corpus has no orphan keys, so the class is modelled as a
# RESTRICTED dimension (only large parts registered): the LEFT JOIN
# miss is the NULL-surrogate census, grouped by channel x year.

_DS97_ORACLE = """
WITH ch AS (
  SELECT 'open' AS channel, l_partkey, l_extendedprice, l_shipdate
  FROM lineitem WHERE l_linestatus = 'O'
  UNION ALL
  SELECT 'closed', l_partkey, l_extendedprice, l_shipdate
  FROM lineitem WHERE l_linestatus = 'F'
),
dim AS (SELECT p_partkey FROM part WHERE p_size > 40)
SELECT channel, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_dangling,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT))
           AS BIGINT) AS amt_q
FROM ch LEFT JOIN dim ON l_partkey = p_partkey
WHERE p_partkey IS NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query(
    "ds97_dangling_dim_census", _DS97_ORACLE,
    doc="TPC-DS Q76 class: NULL-surrogate census per channel x year — "
        "LEFT JOIN miss against a restricted dimension plays the "
        "orphan-key count; the dim side broadcasts",
)
def ds97(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") > 40)
        .select("p_partkey")
    )

    def arm(label: str, status: str) -> DataFrame:
        return li.filter(F.col("l_linestatus") == status).select(
            F.lit(label).alias("channel"),
            "l_partkey", "l_extendedprice", "l_shipdate",
        )

    return (
        arm("open", "O").unionByName(arm("closed", "F"))
        .join(
            F.broadcast(dim),
            F.col("l_partkey") == dim.p_partkey,
            "left",
        )
        .filter(F.col("p_partkey").isNull())
        .groupBy(
            "channel", F.year("l_shipdate").cast("long").alias("yr")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dangling"),
            F.sum(_q(F.col("l_extendedprice"))).alias("amt_q"),
        )
        .orderBy("channel", "yr")
    )


# --- ds98: returners above 1.2x their nation's average (Q81 class) ----------
# Customers whose returned revenue exceeds 1.2x the average returner in
# their nation. The correlated per-nation average becomes a grouped
# re-join; the comparison is exact integer (ret*10*n > 12*sum) so both
# engines agree at every boundary.

_DS98_ORACLE = """
WITH cr AS (
  SELECT c_custkey, c_nationkey,
         SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS ret_q
  FROM customer
  JOIN orders ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2
),
na AS (
  SELECT c_nationkey, SUM(ret_q) AS sum_q, CAST(COUNT(*) AS BIGINT) AS n
  FROM cr GROUP BY 1
)
SELECT cr.c_custkey, n_name, CAST(cr.ret_q AS BIGINT) AS ret_q
FROM cr JOIN na USING (c_nationkey)
JOIN nation ON n_nationkey = c_nationkey
WHERE cr.ret_q * 10 * na.n > 12 * na.sum_q
ORDER BY cr.ret_q DESC, cr.c_custkey LIMIT 100
"""


@query(
    "ds98_returns_above_nation_avg", _DS98_ORACLE,
    doc="TPC-DS Q81 class: customers returning above 1.2x their "
        "nation's average returner — correlated average as a grouped "
        "re-join on the customer-grain reduction, exact integer "
        "threshold",
)
def ds98(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nat = load_table(spark, sf_dir, "nation")
    cr = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(_q(F.col("l_extendedprice"))).alias("ret_q"))
    )
    na = cr.groupBy("c_nationkey").agg(
        F.sum("ret_q").alias("sum_q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        cr.join(F.broadcast(na), "c_nationkey")
        .filter(F.col("ret_q") * 10 * F.col("n") > 12 * F.col("sum_q"))
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", "n_name", "ret_q")
        .orderBy(F.desc("ret_q"), "c_custkey")
        .limit(100)
    )


# --- bi16: most active posters in a topic (LDBC BI-5 class) ------------------
# BI-5 scores each creator in a topic: 1*messages + 2*replies +
# 10*likes, the reply/like counts arriving as PRE-AGGREGATED left
# joins keyed by message (benchmark/ldbc/bi-5.sql). Here the topic is
# an event type: 'click' events are the messages; an 'error'/'view'
# event replies-to/likes the same user's most recent click (one
# forward-fill window over the user timeline — runs on the events
# table pre-clustered by user_id); the per-message counts group on the
# message id and LEFT JOIN back exactly as BI-5's Cs/Plm subqueries.

_BI16_ORACLE = """
WITH tl AS (
  SELECT user_id, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS parent_click
  FROM events
),
msgs AS (SELECT user_id, event_id FROM tl WHERE event_type = 'click'),
cs AS (SELECT parent_click AS id, CAST(COUNT(*) AS BIGINT) AS c
       FROM tl WHERE event_type = 'error' AND parent_click IS NOT NULL
       GROUP BY 1),
plm AS (SELECT parent_click AS id, CAST(COUNT(*) AS BIGINT) AS c
        FROM tl WHERE event_type = 'view' AND parent_click IS NOT NULL
        GROUP BY 1)
SELECT m.user_id,
       CAST(COUNT(m.event_id) AS BIGINT) AS message_count,
       CAST(SUM(COALESCE(cs.c, 0)) AS BIGINT) AS reply_count,
       CAST(SUM(COALESCE(plm.c, 0)) AS BIGINT) AS like_count,
       CAST(COUNT(m.event_id) + 2 * SUM(COALESCE(cs.c, 0))
            + 10 * SUM(COALESCE(plm.c, 0)) AS BIGINT) AS score
FROM msgs m
LEFT JOIN cs ON cs.id = m.event_id
LEFT JOIN plm ON plm.id = m.event_id
GROUP BY 1
ORDER BY score DESC, m.user_id LIMIT 100
"""


@query(
    "bi16_topic_poster_scores", _BI16_ORACLE,
    doc="LDBC BI-5 class: weighted poster scores (1*msg + 2*reply + "
        "10*like) with reply/like counts as PRE-AGGREGATED left joins "
        "keyed by message — attribution via one forward-fill window "
        "over the user timeline (events pre-clustered by user_id)",
)
def bi16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tl = ev.select(
        "user_id", "event_id", "event_type",
        F.last(
            F.when(F.col("event_type") == "click", F.col("event_id")),
            ignorenulls=True,
        ).over(w).alias("parent_click"),
    )
    msgs = tl.filter(F.col("event_type") == "click").select(
        "user_id", "event_id"
    )

    def per_msg(etype: str) -> DataFrame:
        return (
            tl.filter(
                (F.col("event_type") == etype)
                & F.col("parent_click").isNotNull()
            )
            .groupBy(F.col("parent_click").alias("id"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    cs, plm = per_msg("error"), per_msg("view")
    joined = (
        msgs.join(cs, msgs.event_id == cs.id, "left")
        .drop("id")
        .withColumnRenamed("c", "reply_c")
        .join(plm, msgs.event_id == plm.id, "left")
        .drop("id")
        .withColumnRenamed("c", "like_c")
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("event_id").cast("long").alias("message_count"),
            F.sum(F.coalesce(F.col("reply_c"), F.lit(0)))
            .alias("reply_count"),
            F.sum(F.coalesce(F.col("like_c"), F.lit(0)))
            .alias("like_count"),
        )
        .withColumn(
            "score",
            (
                F.col("message_count")
                + 2 * F.col("reply_count")
                + 10 * F.col("like_count")
            ).cast("long"),
        )
        .orderBy(F.desc("score"), "user_id")
        .limit(100)
    )


# --- bi17: top thread initiators (LDBC BI-9 class) ---------------------------
# BI-9: per person, the number of threads they started in a window and
# the total messages those threads accumulated (benchmark/ldbc/
# bi-9.sql: MPP = per-root message counts, joined to the person's
# posts, grouped by person). A thread here is a (user, day): the
# root id is the day's first event; the per-thread counts come from
# ONE (user, day) reduction, then a second aggregation to the user
# grain, names joined from the customer dim (broadcast).

_BI17_ORACLE = """
WITH mpp AS (
  SELECT user_id, date_trunc('day', ts)::DATE AS d,
         CAST(COUNT(*) AS BIGINT) AS message_count
  FROM events
  WHERE ts >= '2024-01-08' AND ts < '2024-01-22'
  GROUP BY 1, 2
)
SELECT c_custkey AS person_id, c_name AS person_name,
       CAST(COUNT(*) AS BIGINT) AS thread_count,
       CAST(SUM(message_count) AS BIGINT) AS message_count
FROM mpp JOIN customer ON c_custkey = user_id
GROUP BY 1, 2
ORDER BY message_count DESC, person_id LIMIT 100
"""


@query(
    "bi17_thread_initiators", _BI17_ORACLE,
    doc="LDBC BI-9 class: top thread initiators — per-thread message "
        "counts from ONE (user, day) reduction inside the date window, "
        "re-aggregated to the person grain, person names from the "
        "broadcast customer dim",
)
def bi17(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= "2024-01-08") & (F.col("ts") < "2024-01-22")
    )
    cust = load_table(spark, sf_dir, "customer")
    mpp = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("message_count"))
    return (
        mpp.join(
            F.broadcast(cust), mpp.user_id == cust.c_custkey
        )
        .groupBy(
            F.col("c_custkey").alias("person_id"),
            F.col("c_name").alias("person_name"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("thread_count"),
            F.sum("message_count").alias("message_count"),
        )
        .orderBy(F.desc("message_count"), "person_id")
        .limit(100)
    )


# --- ds99: multi-band independent aggregate battery (TPC-DS Q28 class) -------
# Q28 computes (avg price, count, count distinct) for SIX independent
# quantity/price bands of the same fact table — the template spells it
# as six self-joined scalar subqueries, i.e. six table scans. The
# Spark-first form is ONE conditional-aggregation pass: each band's
# aggregates take a CASE-guarded input; the distinct counts become
# count(DISTINCT CASE ...) sharing the single scan through Catalyst's
# Expand (the cluster plan: one read of the fact, never six). Averages
# use the quantised-sum convention so both engines agree bit-for-bit.

_DS99_BANDS = [
    ("lo", "l_quantity <= 5"),
    ("mid", "l_quantity > 5 AND l_quantity <= 20"),
    ("hi", "l_quantity > 20 AND l_quantity <= 35"),
]

_DS99_ORACLE = f"""
SELECT
  {", ".join(
    f'''CAST(SUM(CASE WHEN {cond}
            THEN CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT) END)
          AS DOUBLE)
        / COUNT(CASE WHEN {cond} THEN l_extendedprice END)
        / 10000.0 AS avg_price_{b},
      CAST(COUNT(CASE WHEN {cond} THEN 1 END) AS BIGINT) AS n_{b},
      CAST(COUNT(DISTINCT CASE WHEN {cond} THEN l_partkey END)
          AS BIGINT) AS n_parts_{b}'''
    for b, cond in _DS99_BANDS
  )}
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
"""


@query(
    "ds99_band_aggregate_battery", _DS99_ORACLE,
    doc="TPC-DS Q28 class: (avg, count, count-distinct) over three "
        "independent quantity bands — the template's six scalar-subquery "
        "scans fused into ONE conditional-aggregation pass (distinct "
        "counts share the scan via Expand)",
)
def ds99(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'")
    )
    aggs = []
    for b, cond in _DS99_BANDS:
        aggs.append(F.expr(
            f"CAST(SUM(CASE WHEN {cond} THEN CAST(FLOOR(l_extendedprice"
            f" * 10000.0D) AS BIGINT) END) AS DOUBLE)"
            f" / COUNT(CASE WHEN {cond} THEN l_extendedprice END)"
            f" / 10000.0D AS avg_price_{b}"
        ))
        aggs.append(F.expr(
            f"CAST(COUNT(CASE WHEN {cond} THEN 1 END) AS BIGINT) AS n_{b}"
        ))
        aggs.append(F.expr(
            f"CAST(COUNT(DISTINCT CASE WHEN {cond} THEN l_partkey END)"
            f" AS BIGINT) AS n_parts_{b}"
        ))
    return li.agg(*aggs)
