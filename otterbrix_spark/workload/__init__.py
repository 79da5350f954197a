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
# Round-9 window (VERDICT r8 Next #1: "execute the drain exactly as
# written in COVERAGE.md"): the q01 anchor + the first 49 of the
# never-driver-verified backlog in the priority order COVERAGE.md
# wrote down last round — streaming certs first, then statement
# surface, time series, dedup tuning, text, multimodal, and the
# remaining parity/benchmark gates. The three that do not fit
# (ds43, q85, q86) join the round-8 batch-3 additions (ds51-ds53,
# c26, d22, sk13, x10, x11, e20) and the q89-q95 dialect
# passthroughs as the round-10 closeout window — at that point every
# gate in the registry will have a driver row. Everything rotated
# out keeps passing the identical local DuckDB battery
# (tests/test_workload_oracle.py) at three SFs every round.
_FRONT_WINDOW = [
    "q01_pricing_summary",
    # streaming certs (heaviest never-driver-verified family)
    "s15_streaming_left_outer", "s16_dedup_within_watermark",
    "s17_streaming_full_outer", "s18_chained_stateful",
    "s19_milestone_counter", "s20_late_drop", "s22_streaming_sketch",
    # statement surface
    "x04_column_defaults", "x05_prepared_statements",
    "x06_copy_statement", "x07_scd2_dimension", "x08_scd2_asof_join",
    "y04_schema_evolution", "q84_update_from",
    # time series
    "g04_time_weighted_avg", "g05_counter_rate", "g06_lttb_downsample",
    "g07_ewma_truncated", "g08_ohlc_bars", "g09_date_bin",
    "g10_mad_anomaly",
    # dedup tuning
    "d18_url_canonical_dedup", "d19_lsh_tuning_eval",
    "d20_simhash_pairs", "d21_dsir_importance",
    # text
    "t16_bpe_pair_count", "t18_vocab_growth", "t19_bigram_lm_score",
    # multimodal
    "m07_patch_extraction", "m08_audio_framing",
    # remaining parity / operator gates
    "j16_jsonb_agg", "j17_variant_type",
    "a03_ordered_set_aggs", "a05_arg_extremes",
    "w07_interval_range_frame", "w08_filter_over_window",
    "z01_zorder_pruning", "k02_skew_salted_join",
    "h04_join_rollup", "h05_mvcc_time_travel",
    "aj05_asof_strict", "f04_conversion_latency",
    "r01_relation_chain",
    "c23_conditional_src_dst", "c24_regex_replace_backref",
    # benchmark breadth
    "ds39_exists_or_exists", "ds40_monthly_outlier_neighbors",
    "ds41_cte_reused_selfjoin", "ds42_rollup_rank_parent",
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
