"""VARIANT support — Spark 4's native semi-structured type, covering the
reference's UNION/VARIANT logical types (`components/types/types.hpp:73-120`,
`logical_value.hpp:81 create_variant`) and the schema-free half of the
dynamic-table story.

`parse_json` ingests JSON text into a binary variant; `variant_get`
navigates with a path and a target type — the typed-extraction semantics the
reference's `::?` variant-select provides ("pick the value if its type
matches"). `try_variant_get` is the non-throwing form. The sibling
column-branch implementation (typed columns that disagree across batches)
lives in sources/dynamic.py; this module is the row-level encoding.

Scale note: variant is a binary columnar encoding with shredded access paths
— far cheaper than re-parsing JSON text per query, and the natural landing
format for schema-free event ingest at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def to_variant(json_col: Column) -> Column:
    """JSON text -> VARIANT (reference create_variant)."""
    return F.parse_json(json_col)


def variant_path(col: Column, path: str, dtype: str) -> Column:
    """Typed navigation: `variant_get(v, '$.a.b', 'int')` — raises on
    incompatible types (the strict `::` cast contract)."""
    return F.variant_get(col, path, dtype)


def try_variant_path(col: Column, path: str, dtype: str) -> Column:
    """`::?` semantics on variants: value if the type matches, else NULL."""
    return F.try_variant_get(col, path, dtype)


def ingest_json_events(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Replace a JSON text column with its variant encoding."""
    return df.withColumn(json_col, to_variant(F.col(json_col)))
