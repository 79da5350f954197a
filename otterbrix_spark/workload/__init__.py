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


def load_all() -> dict[str, QuerySpec]:
    """Import every workload module (idempotent) and return the registry."""
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

    return REGISTRY
