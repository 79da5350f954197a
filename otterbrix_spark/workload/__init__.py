"""Query inventory: every operator family from SURVEY.md §2 as a named query
with (a) a Spark DataFrame implementation and (b) an equivalent DuckDB oracle
SQL string (``oracle=None`` marks non-SQL-expressible entries that get a
rows-only check).

The registry is what ``__spark_entry__.queries()`` / ``oracle_sql()`` expose
to the correctness driver, and what ``bench.py`` draws its headline set from.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = False  # included in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    """Decorator registering a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, bench)
        return fn

    return deco


# The correctness driver verifies the FIRST 50 registry entries per round.
# Round 1 checked insertion order (CORRECTNESS_r01.json = entries 0-49);
# round 2 front-loaded everything r01 left unverified; round 3's window
# went 50/50 green (CORRECTNESS_r03.json). Round 4 rotates the ENTIRE
# window (minus the q01 smoke anchor) onto gates with no driver-green row
# in ANY round — r02/r03 additions the driver never sampled plus this
# round's new gates — lifting cumulative driver-verified coverage from
# 101/177 to ~150/177. Everything rotated out stayed green in r01-r03
# and keeps passing the identical local DuckDB battery
# (tests/test_workload_oracle.py). Remaining never-sampled gates queued
# for the round-5 window: ds03-ds12, b03-b06, c03-c06/c08-c11/c13,
# l01/l02/l06/l07, plus the later round-4 additions (ds19-ds22, c14/c15,
# s04, l08, p05, t09, m03, j13, aj01, rj01, h01, sk01) — all pass the
# identical local battery at sf0.001 AND sf0.01.
_FRONT_WINDOW = [
    "q01_pricing_summary",  # flagship / bench headline anchor (r03 green)
    # round-4 new gates: streaming certification + TPC-DS long tail
    "s03_streaming_hourly_rollup",
    "ds15_snapshot_selfjoin", "ds16_channel_ratio_anti",
    "ds17_frequent_crossshop", "ds18_ship_together",
    # training-pipeline sampling/packing family (new r3, never sampled;
    # p04 re-planned this round — two-level de-skewed binning)
    "p01_split_assign", "p02_source_mix", "p03_scrub_digits",
    "p04_sequence_pack",
    # never-sampled infra gates: CREATE TYPE DML, multi-probe IVF,
    # vector UDF macro, session-length dist, multimodal frame sampling,
    # winnowing fingerprints, quality filter
    "y01_enum_type_dml", "e05_knn_ivf_nprobe", "u02_vector_udf_macro",
    "s02_session_length_dist", "m02_frame_sampling", "t07_winnowing",
    "t08_quality_filter",
    # TPC-H long tail (r3, never sampled)
    "q68_tpch_q8_market_share", "q69_tpch_q9_profit",
    "q70_tpch_q13_order_dist", "q71_tpch_q17_small_qty",
    "q72_tpch_q19_disjunctive", "q73_tpch_q22_opportunity",
    "q74_recursive_date_spine", "q75_tpch_q12_priority_counts",
    "q76_tpch_q21_waiting_suppliers", "q77_intersect_all", "q78_except_all",
    # parity tail (r2/r3, never sampled)
    "q53_having_hidden_agg", "q54_not_exists_conditional", "q55_self_join",
    "q56_conditional_distinct", "q57_explode_reaggregate",
    "q61_string_agg", "q62_expression_join_key", "q63_safe_divide",
    # TPC-DS / SSB / JOB / ClickBench / LDBC representatives (rest queued
    # for round 5)
    "ds01_cross_period_intersect", "ds02_yoy_revenue_ratio",
    "ds13_channel_intersect", "ds14_returns_netting",
    "b01_ssb_star", "b02_job_join_chain", "b07_job_global_min",
    "b08_job_bridge",
    "c02_value_histogram", "c07_multi_distinct", "c12_point_lookup",
    "l03_central_person", "l04_triangle_count", "l05_top_forum_members",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every workload module (idempotent) and return the registry,
    ordered so the driver's 50-entry correctness window covers every
    operator family and every LLM op (see ``_FRONT_WINDOW``)."""
    from otterbrix_spark.workload import relational  # noqa: F401
    from otterbrix_spark.workload import joins  # noqa: F401
    from otterbrix_spark.workload import subqueries  # noqa: F401
    from otterbrix_spark.workload import jsonq  # noqa: F401
    from otterbrix_spark.workload import llmops  # noqa: F401
    from otterbrix_spark.workload import dmlq  # noqa: F401
    from otterbrix_spark.workload import setops_ext  # noqa: F401
    from otterbrix_spark.workload import tpch_more  # noqa: F401
    from otterbrix_spark.workload import analytics_ext  # noqa: F401
    from otterbrix_spark.workload import funnel  # noqa: F401
    from otterbrix_spark.workload import parity_more  # noqa: F401
    from otterbrix_spark.workload import benchmark_shapes  # noqa: F401
    from otterbrix_spark.workload import streamq  # noqa: F401
    from otterbrix_spark.workload import temporalq  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _FRONT_WINDOW if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
