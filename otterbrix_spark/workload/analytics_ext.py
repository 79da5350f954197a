"""Analytics extensions: sessionization gate, PIVOT, approximate distinct.

Sessionization is the engine's flagship custom operator
(operators/sessionize.py); here its batch form is oracle-gated — the
gaps-and-islands window formulation replayed in DuckDB SQL. PIVOT is an
extension beyond the reference (expressed as conditional aggregation in the
oracle, which is exactly what Spark lowers pivot to). Approx-distinct is a
deliberately rows-only entry: sketch outputs are engine-specific by design,
so the driver records the weaker check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otterbrix_spark.operators.sessionize import session_stats
from otterbrix_spark.sources.registry import load_table
from otterbrix_spark.workload import query

# --- s01: gap-based sessionization (batch gate) -----------------------------

_S01_ORACLE = """
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_seq
  FROM x
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS start_us,
       epoch_us(MAX(ts)) AS end_us,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM s GROUP BY 1, 2
"""


@query("s01_sessionize", _S01_ORACLE, doc="gap-based sessionization (30-min gap)", bench=True)
def s01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, gap_minutes=30).withColumn(
        "session_seq", F.col("session_seq").cast("bigint")
    )


# --- q50: PIVOT (extension) -------------------------------------------------

_Q50_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O,
       CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F
FROM lineitem GROUP BY l_returnflag
"""


@query("q50_pivot", _Q50_ORACLE, doc="PIVOT on linestatus (lowered to conditional agg)")
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["O", "F"])
    )


# --- a01: approximate distinct (rows-only; sketches are engine-specific) ----


@query("a01_approx_distinct", None, doc="approx_count_distinct sketch (rows-only check)")
def a01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
