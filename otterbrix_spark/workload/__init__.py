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
# Round-7 window: the q01 anchor; the 3 gates that landed after the
# round-6 window froze and were never driver-sampled (d14, ds33, sk02 —
# VERDICT r6 Next #1, completing 250/250 cumulative certification); the
# 17 early-round-7 additions (e10 trained IVF, s10 restart-from-
# checkpoint, y03 dynamic schema, ds34/ds35/ds36/c19/c20/l12/b13/b15
# breadth shapes, t12 repetition filters, sk03 sketch intersection,
# s11 native session windows, d15 incremental dedup index, e11
# incremental IVF add, s12 sliding windows); the 26 late-round-7
# additions (g03 LOCF, h03 hierarchical rollup, t13 BM25, d16 keep-best
# rep, p08 quota mix, ds37 YoY compare, b16 JOB min-star, c21 regex
# distinct, e12 filtered ANN, s13 stream-static join, d17 minhash
# accuracy, a02 exact percentiles, q83 grouping sets, t14 novelty,
# l13 clustering coefficient, s14 streaming upsert, x02 upsert, j15
# jsonb containment, aj04 nearest as-of, ds38 full-outer channels, c22
# share-of-group, m06 pair integrity, p09 curriculum, sk04 a-not-b,
# w06 exclude-current-row, t15 vocab stats — first-time certification
# outranks re-checks); then the LEAST-recently-verified regression
# fills — the 3 remaining r02 gates. The r01 gates (d01-d02, j01-j11,
# q03-q37) are the round-8 regression backlog; everything rotated out
# keeps passing the identical local DuckDB battery
# (tests/test_workload_oracle.py) at three SFs every round.
_FRONT_WINDOW = [
    "q01_pricing_summary",
    # never driver-sampled (landed post-window in round 6)
    "d14_containment_pairs", "ds33_am_pm_ratio", "sk02_kmv_merge",
    # early round-7 additions
    "e10_ivf_trained_index", "s10_streaming_restart", "y03_dynamic_schema",
    "ds34_week_chain_triple_date", "ds35_cross_channel_intersect",
    "c19_minute_phrase_topk", "l12_weighted_path", "t12_repetition_filters",
    "sk03_kmv_intersection", "s11_session_window_native",
    "d15_incremental_dedup_index", "e11_ivf_incremental_add",
    "s12_sliding_window", "b13_job_triangle", "b15_ssb_flat_revenue",
    "ds36_frequent_best_compose", "c20_row_fetch_topk",
    # late round-7 additions (this window's first-timers)
    "g03_gapfill_locf", "h03_hierarchical_rollup", "t13_bm25_topk",
    "d16_cluster_best_rep", "p08_quota_mix", "ds37_yoy_growth_compare",
    "b16_job_min_star", "c21_regex_multigroup_uniq", "e12_filtered_ann",
    "s13_stream_static_enrich", "d17_minhash_estimate_accuracy",
    "a02_exact_percentiles", "q83_grouping_sets_markers",
    "t14_ngram_novelty", "l13_clustering_coefficient",
    "s14_streaming_upsert", "x02_upsert_on_conflict",
    "j15_jsonb_containment", "aj04_asof_nearest",
    "ds38_channel_full_outer", "c22_share_of_group",
    "m06_pair_integrity", "p09_curriculum_phases",
    "sk04_kmv_a_not_b", "w06_exclude_current_row", "t15_vocab_stats",
    # closing-session first-timers (replacing the r02 regression fills:
    # with 70+ never-driver-verified gates in the registry, a window slot
    # spent re-verifying an r01/r02 gate costs a first-time certification;
    # the displaced regression re-checks move to the round-8 backlog)
    "q87_qualify", "a04_stats_moments", "t17_idf_rarity",
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
