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


_SCRATCH_BY_PREFIX: dict[str, str] = {}


def scratch_dir(prefix: str) -> str:
    """Per-gate scratch directory for gates that materialise state
    (rollups, landing dirs, persisted indexes). Cleanup is registered
    AT EXIT, not eager: the DataFrame a gate returns reads the directory
    LAZILY (the driver collects it later), so an eager rmtree would yank
    the files out from under the read.

    Re-invoking the SAME gate (same prefix) in a long-lived session —
    driver batteries, bench loops, scale probes — RECLAIMS the previous
    invocation's directory first, so disk use stays bounded at one
    corpus copy per gate instead of one per invocation. Safe because by
    the time a gate is re-invoked, its previous result has been
    consumed (the driver collects each gate's frame before moving on)."""
    import atexit
    import shutil
    import tempfile

    prev = _SCRATCH_BY_PREFIX.pop(prefix, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    path = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_BY_PREFIX[prefix] = path
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def query(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    """Decorator registering a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, bench)
        return fn

    return deco


# The correctness driver verifies the FIRST 50 registry entries per round.
# Rounds 1-5 rotated the window so that 199 distinct gates have a
# driver-green row (r05 certified 49 first-timers, closing the whole
# round-3/4 tail). Round 6 rotates onto the LAST never-sampled cohort: the
# 24 round-5 additions (VERDICT r5 Next #1) plus this round's 24 new gates
# (d13 production SemDeDup, l11 degree-capped FOAF, s07 multi-batch,
# s08 streaming->rollup, aj03 forward-tolerance as-of, g02 interpolating
# gapfill, p07 leakage-free split, e08 ANN recall, ds26-ds30 + c17,
# c18, native-pivot and fact-chain shapes)
# behind the q01 smoke anchor, with the single remaining slot a
# regression re-check of the LEAST-recently-verified gate (last
# driver-green in r01/r02). Everything rotated out stayed green in a prior driver window
# AND keeps passing the identical local DuckDB battery
# (tests/test_workload_oracle.py) at sf0.001 and sf0.01.
_FRONT_WINDOW = [
    "q01_pricing_summary",  # flagship / bench headline anchor (r03-r05 green)
    # round-5 additions, never driver-sampled (24)
    "t10_decontamination", "d11_paragraph_dedup", "d12_semdedup",
    "e06_knn_quantized", "e07_kmeans_assign", "m05_audio_decode",
    "p06_chunk_overlap", "y02_composite_star", "q79_filter_clause",
    "q80_lateral_topn", "q81_distinct_on", "q82_bool_bit_aggs",
    "b11_job_path_join", "b12_job_filter_soup", "ds23_channel_balance",
    "ds24_decile_profile", "ds25_exists_boolean", "l09_foaf_recommend",
    "l10_interaction_strength", "c16_rank_ties_topk", "s05_streaming_join",
    "s06_streaming_anomaly", "w03_groups_frame", "w04_ignore_nulls_fill",
    # round-6 new gates (24)
    "d13_semdedup_production", "l11_foaf_capped", "s07_streaming_multibatch",
    "ds26_window_over_union", "ds27_cumulative_compare",
    "ds28_time_band_matrix", "c17_url_domain_agg",
    "p07_leakage_free_split", "e08_ann_recall", "s08_streaming_into_rollup",
    "aj03_asof_forward_tolerance", "g02_gapfill_interpolate",
    "ds29_month_pivot", "ds30_return_rebuy_chain", "c18_derived_key_group",
    "s09_streaming_dedup", "t11_boilerplate_removal",
    "ds31_inventory_ratio_band", "ds32_frequent_trips",
    "e09_ivf_persisted_index", "j14_jsonb_median", "u03_aggregate_udaf",
    "w05_ranking_battery", "h02_mvcc_continuous_aggregate",
    # regression re-check: least-recently-verified (r01/r02) gate (1)
    "q02_filter_like_regex",
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
