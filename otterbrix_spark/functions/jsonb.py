"""JSONB path navigation — the reference's PG operators on Spark columns.

The reference implements `->`, `->>`, `#>`, `#>>` (navigate) and `-`, `#-`
(delete) as `jsonb_expand` / `jsonb_delete` expressions over its dynamic
columns (reference `components/expressions/forward.hpp:62-70`,
`components/sql/transformer/impl/transform_select.cpp:641-736`). Here JSON
payloads live in plain string columns (or structs), and navigation lowers to
Spark's built-in JSON functions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _jsonpath(parts: list[str]) -> str:
    out = "$"
    for p in parts:
        if p.lstrip("-").isdigit():
            out += f"[{p}]"
        else:
            out += f".{p}"
    return out


def arrow(col: Column, key: str) -> Column:
    """``col -> key``: navigate one step, result stays JSON text."""
    return F.get_json_object(col, _jsonpath([key]))


def arrow_text(col: Column, key: str) -> Column:
    """``col ->> key``: navigate one step, result as text scalar."""
    return F.get_json_object(col, _jsonpath([key]))


def path(col: Column, keys: list[str]) -> Column:
    """``col #> '{a,b}'``: navigate a path, result stays JSON text."""
    return F.get_json_object(col, _jsonpath(keys))


def path_text(col: Column, keys: list[str]) -> Column:
    """``col #>> '{a,b}'``: navigate a path, result as text scalar."""
    return F.get_json_object(col, _jsonpath(keys))


def struct_delete(col: Column, *fields: str) -> Column:
    """``col - key`` on a STRUCT column: drop named fields (jsonb_delete)."""
    out = col
    for f_ in fields:
        out = out.dropFields(f_)
    return out
