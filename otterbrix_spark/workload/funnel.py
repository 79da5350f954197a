"""Event-sequence analytics: funnel and cohort-retention — the
interactive-analytics shapes a production events pipeline runs daily, built
purely from joins/windows/aggregations (no UDFs, fully oracle-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otterbrix_spark.sources.registry import load_table
from otterbrix_spark.workload import query

# --- f01: ordered funnel (view -> click -> purchase) ------------------------
# A user converts at step N if their earliest step-N event follows their
# earliest step-(N-1) event. min(ts) comparisons per user — one aggregation,
# no self-joins.

_F01_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS step_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS step_click,
       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
         AS step_purchase
FROM per_user
"""


@query("f01_funnel", _F01_ORACLE, doc="ordered view->click->purchase funnel")
def f01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("step_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("step_purchase"),
    )


# --- f02: cohort retention --------------------------------------------------
# Cohort = first-activity week; retention = distinct users active k weeks
# after their cohort week. first-activity via window-free groupBy + join.

_F02_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(DATE_TRUNC('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(DATEDIFF('week', f.cohort_week, DATE_TRUNC('week', e.ts)) AS INT)
           AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
       COUNT(DISTINCT user_id) AS n_active
FROM activity
WHERE week_offset <= 4
GROUP BY 1, 2
"""


@query("f02_retention", _F02_ORACLE, doc="weekly cohort retention matrix")
def f02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 4)
        .groupBy(F.col("cohort_week").cast("date").alias("cohort_week"), "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --- t05: edit-distance fuzzy matching --------------------------------------
# levenshtein is algorithmically identical across engines (pure integer DP).
# Multi-pass blocking (classic entity-resolution practice) replaces the
# former all-pairs theta join: candidates = pairs sharing a 3-char prefix
# key OR a 3-char suffix key — two equi-joins + distinct, never a cartesian
# — then a length-band filter (|len a − len b| ≤ 3 is necessary for dist ≤ 3,
# zero false negatives) and the exact levenshtein only within blocks. Block
# sizes are bounded by key frequency, so the plan survives corpus scale-up;
# the oracle mirrors the identical blocking so scores compare exactly.

_T05_ORACLE = """
WITH n AS (SELECT p_partkey AS id, p_name AS nm, strlen(p_name) AS ln,
                  substr(p_name, 1, 3) AS k_pre,
                  substr(p_name, strlen(p_name) - 2, 3) AS k_suf
           FROM part),
cand AS (
  SELECT a.id AS a, b.id AS b, a.nm AS na, b.nm AS nb, a.ln AS la, b.ln AS lb
  FROM n a JOIN n b ON a.k_pre = b.k_pre AND a.id < b.id
  UNION
  SELECT a.id, b.id, a.nm, b.nm, a.ln, b.ln
  FROM n a JOIN n b ON a.k_suf = b.k_suf AND a.id < b.id
)
SELECT a, b, CAST(levenshtein(na, nb) AS INT) AS dist
FROM cand
WHERE abs(la - lb) <= 3 AND levenshtein(na, nb) <= 3
"""


@query("t05_edit_distance", _T05_ORACLE, doc="levenshtein fuzzy-match pairs via multi-pass blocking")
def t05(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    named = part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("nm"),
        F.length("p_name").alias("ln"),
        F.substring("p_name", 1, 3).alias("k_pre"),
        F.expr("substring(p_name, -3, 3)").alias("k_suf"),
    )
    # Fan-out guard (guide §2.2/§6, same idiom as llm/dedup._fan_out):
    # `part` is a single scan split below 128MB, and the block pass is a
    # broadcast join whose probe side inherits that ONE partition — the
    # entire ~40M-pair enumeration + levenshtein then runs in a single
    # task. Spreading the (tiny) stream side across the cluster is a
    # no-op shuffle at scale and unlocks full-machine parallelism here.
    # Round-14 (guide §5/§2.4): the projection + fan-out is consumed by
    # both sides of the pair join below — localCheckpoint pins the ~20k
    # small rows once instead of re-scanning part and re-shuffling per
    # consumer (the round-13 shape rebuilt `named` four times).
    named = named.repartition(
        spark.sparkContext.defaultParallelism, F.col("id")
    ).localCheckpoint(eager=False)

    # Round-13 made the two block passes (shared 3-char prefix OR shared
    # 3-char suffix) DISJOINT by construction — the suffix pass excludes
    # pairs that already share a prefix key — eliminating the DISTINCT
    # shuffle over the ~40M-pair candidate union (guide §2.3/§2.4).
    # Round-14 folds both passes into ONE self-join at pair grain: each
    # id emits two (tag, key) rows — ('p', k_pre) and ('s', k_suf) — and
    # the equi-join on (tag, key) enumerates prefix pairs under tag 'p'
    # and suffix pairs under tag 's' in a single stage; the tag-conditional
    # filter drops the same shared-prefix pairs from the suffix side the
    # two-pass form dropped. Identical pair set, half the join stages, one
    # probe pass instead of two. The length band (|la-lb| <= 3, necessary
    # for dist <= 3, zero false negatives) and the banded-DP levenshtein
    # (threshold arg: O(threshold*n) per pair, -1 beyond the band) run
    # inside the pass, so only surviving (a, b, dist) rows leave the stage.
    keyed = named.select(
        "id", "nm", "ln", "k_pre",
        F.explode(
            F.array(
                F.struct(F.lit("p").alias("tag"), F.col("k_pre").alias("k")),
                F.struct(F.lit("s").alias("tag"), F.col("k_suf").alias("k")),
            )
        ).alias("tk"),
    ).select("id", "nm", "ln", "k_pre", "tk.tag", "tk.k")
    a = keyed.select(
        F.col("id").alias("a"), F.col("nm").alias("na"),
        F.col("ln").alias("la"), F.col("k_pre").alias("pre_a"),
        "tag", "k",
    )
    b = keyed.select(
        F.col("id").alias("b"), F.col("nm").alias("nb"),
        F.col("ln").alias("lb"), F.col("k_pre").alias("pre_b"),
        "tag", "k",
    )
    out = (
        a.join(b, ["tag", "k"])
        .filter(F.col("a") < F.col("b"))
        # suffix-tagged pairs that also share a prefix key were already
        # enumerated under tag 'p' — drop them (disjoint by construction)
        .filter(
            (F.col("tag") == "p")
            | ~(F.col("pre_a") == F.col("pre_b"))
            | F.col("pre_a").isNull()
            | F.col("pre_b").isNull()
        )
    )
    return (
        out.filter(F.abs(F.col("la") - F.col("lb")) <= 3)
        .withColumn("dist", F.levenshtein(F.col("na"), F.col("nb"), 3))
        .filter(F.col("dist") >= 0)
        .select("a", "b", F.col("dist").cast("int").alias("dist"))
    )


# --- e03: IVF-style ANN (fixed centroids, nprobe=1) -------------------------
# IVF with deterministic centroids (every 63rd vector): assign each corpus
# vector to its nearest centroid (the "inverted list"), then answer queries
# by scanning only the query's list. The assign step and the search step are
# both equi-joins on the centroid id — the join shape that holds at billions
# of vectors. (Production swaps the fixed centroids for k-means output; the
# plan is identical.)

_E03_ORACLE = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e),
cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 63 = 0),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT n.vec_id, cent.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                              ORDER BY list_dot_product(n.v, cent.cv)
                                       / (n.nrm * cent.cn) DESC, cent.cid) AS rk
    FROM n CROSS JOIN cent
  ) WHERE rk = 1
),
q AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, assign.cid
      FROM n JOIN assign ON n.vec_id = assign.vec_id WHERE n.vec_id < 5),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_dot_product(n.v, q.qv) / (n.nrm * q.qn) AS cos
  FROM n
  JOIN assign ON n.vec_id = assign.vec_id
  JOIN q ON assign.cid = q.cid
  WHERE n.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query("e03_knn_ivf", _E03_ORACLE, doc="IVF ANN: centroid assign + list-local search")
def e03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from otterbrix_spark.llm.similarity import DOT, prepare

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = prepare(emb)
    cent = corpus.filter(F.col("vec_id") % 63 == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored_cent = corpus.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", F.expr(DOT.format(a="v", b="cv")) / (F.col("nrm") * F.col("cn"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    assign = (
        scored_cent.withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    assigned = corpus.join(assign, "vec_id")
    queries = assigned.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "cid",
    )
    scored = (
        assigned.join(F.broadcast(queries), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.expr(DOT.format(a="v", b="qv")) / (F.col("nrm") * F.col("qn")))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 5)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.col("rank").cast("int").alias("rank"))
    )


# --- e05: IVF multi-probe ANN (nprobe=2) ------------------------------------
# The recall upgrade over e03: each query probes its TOP-2 nearest centroid
# lists instead of only its own. The probe set is tiny (queries × centroids,
# broadcast) and the search remains one equi-join of the assigned corpus
# against the exploded (query, probed-list) pairs — at a billion vectors the
# scanned fraction is nprobe/nlists regardless of corpus size, which is the
# whole point of IVF (reference ships ANN search in its vector service;
# plan shape per the FAISS IVF design, Johnson et al. 2017).

_E05_NPROBE = 2

_E05_ORACLE = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e),
cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % 63 = 0),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT n.vec_id, cent.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                              ORDER BY list_dot_product(n.v, cent.cv)
                                       / (n.nrm * cent.cn) DESC, cent.cid) AS rk
    FROM n CROSS JOIN cent
  ) WHERE rk = 1
),
probe AS (
  SELECT query_id, cid FROM (
    SELECT n.vec_id AS query_id, cent.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                              ORDER BY list_dot_product(n.v, cent.cv)
                                       / (n.nrm * cent.cn) DESC, cent.cid) AS rk
    FROM n CROSS JOIN cent WHERE n.vec_id < 5
  ) WHERE rk <= {_E05_NPROBE}
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_dot_product(n.v, q.qv) / (n.nrm * q.qn) AS cos
  FROM n
  JOIN assign ON n.vec_id = assign.vec_id
  JOIN probe ON assign.cid = probe.cid
  JOIN q ON probe.query_id = q.query_id
  WHERE n.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query(
    "e05_knn_ivf_nprobe", _E05_ORACLE,
    doc="IVF multi-probe ANN: top-2 centroid lists per query, equi-join search",
)
def e05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from otterbrix_spark.llm.similarity import DOT, prepare

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = prepare(emb)
    cent = corpus.filter(F.col("vec_id") % 63 == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored_cent = corpus.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", F.expr(DOT.format(a="v", b="cv")) / (F.col("nrm") * F.col("cn"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    ranked = scored_cent.withColumn("rk", F.row_number().over(w_assign))
    assign = ranked.filter(F.col("rk") == 1).select("vec_id", "cid")
    # queries probe their top-nprobe lists (query side is tiny -> broadcast)
    probe = (
        ranked.filter((F.col("vec_id") < 5) & (F.col("rk") <= _E05_NPROBE))
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    probe_q = probe.join(queries, "query_id")
    scored = (
        corpus.join(assign, "vec_id")
        .join(F.broadcast(probe_q), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos", F.expr(DOT.format(a="v", b="qv")) / (F.col("nrm") * F.col("qn"))
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- f03: windowed sequence funnel (ClickHouse windowFunnel semantics) ------
# Max step level reachable through events in time order within a 30-minute
# window from the chain's first step. Pure window functions: each event
# carries the latest preceding view; each purchase reads the latest
# preceding click's carried view (the greedy-latest chain minimises the
# span, so it decides the exists-question exactly). One shuffle on
# user_id, no self-joins — the scalable form of the N-way funnel join.

_F03_WINDOW_US = 30 * 60 * 1_000_000

_F03_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
  FROM events
),
chains1 AS (
  SELECT user_id, event_id, event_type, us,
         MAX(CASE WHEN event_type = 'view' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
  FROM e
),
chains AS (
  SELECT user_id, event_type, us, last_view,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN last_view END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_chain_view
  FROM chains1
),
levels AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
         MAX(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
                   AND us - last_view <= {_F03_WINDOW_US} THEN 1 ELSE 0 END) AS l2,
         MAX(CASE WHEN event_type = 'purchase' AND click_chain_view IS NOT NULL
                   AND us - click_chain_view <= {_F03_WINDOW_US} THEN 1 ELSE 0 END) AS l3
  FROM chains GROUP BY user_id
)
SELECT CAST(CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
                 WHEN l1 = 1 THEN 1 ELSE 0 END AS INT) AS level,
       COUNT(*) AS n_users
FROM levels GROUP BY 1
"""


@query("f03_window_funnel", _F03_ORACLE, doc="windowFunnel: max ordered step level within a 30-min window")
def f03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(w)
    chains = e.withColumn("last_view", last_view).withColumn(
        "click_chain_view",
        F.last(
            F.when(F.col("event_type") == "click", F.col("last_view")),
            ignorenulls=True,
        ).over(w),
    )
    win = F.lit(_F03_WINDOW_US)
    levels = chains.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("l1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & F.col("last_view").isNotNull()
                & (F.col("us") - F.col("last_view") <= win),
                1,
            ).otherwise(0)
        ).alias("l2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("click_chain_view").isNotNull()
                & (F.col("us") - F.col("click_chain_view") <= win),
                1,
            ).otherwise(0)
        ).alias("l3"),
    )
    level = (
        F.when(F.col("l3") == 1, 3)
        .when(F.col("l2") == 1, 2)
        .when(F.col("l1") == 1, 1)
        .otherwise(0)
        .cast("int")
    )
    return levels.groupBy(level.alias("level")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


# --- f04: conversion-latency distribution ------------------------------------
# The product-analytics follow-up to the funnel (f01): among converting
# users (first view -> first later purchase), how long did conversion
# take — exact interpolated percentiles of the latency in whole seconds,
# cohorted by user id band. first-touch attribution per user is two
# conditional MINs in ONE pass over events (no self-join); the
# percentile family is the a02-certified exact order statistic, safe
# cross-engine on integer seconds.

_F04_ORACLE = """
WITH t AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v_us,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p_us
  FROM events GROUP BY user_id),
lat AS (
  SELECT user_id % 4 AS cohort, (p_us - v_us) // 1000000 AS lat_s
  FROM t WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us > v_us)
SELECT cohort,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       quantile_cont(lat_s, 0.50) AS p50_s,
       quantile_cont(lat_s, 0.90) AS p90_s,
       quantile_cont(lat_s, 0.99) AS p99_s
FROM lat GROUP BY cohort ORDER BY cohort
"""


@query(
    "f04_conversion_latency", _F04_ORACLE,
    doc="first-view -> first-purchase conversion latency percentiles per "
        "cohort: two conditional MINs in one pass, exact order statistics",
)
def f04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    t = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    lat = (
        t.filter(
            F.col("v_us").isNotNull()
            & F.col("p_us").isNotNull()
            & (F.col("p_us") > F.col("v_us"))
        )
        .select(
            (F.col("user_id") % 4).alias("cohort"),
            F.expr("(p_us - v_us) DIV 1000000").alias("lat_s"),
        )
    )
    return (
        lat.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.percentile("lat_s", F.lit(0.50)).alias("p50_s"),
            F.percentile("lat_s", F.lit(0.90)).alias("p90_s"),
            F.percentile("lat_s", F.lit(0.99)).alias("p99_s"),
        )
        .orderBy("cohort")
    )
