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


def json_delete(col: Column, key: str) -> Column:
    """``col - 'key'`` on a JSON *text* column: drop a top-level key,
    type-preserving via a map<string,variant> round-trip (reference
    jsonb_delete, `transform_select.cpp:641-736`). No UDF."""
    return F.to_json(
        F.map_filter(
            F.from_json(col, "map<string,variant>"), lambda k, v: k != F.lit(key)
        )
    )


def json_delete_path(col: Column, keys: list[str]) -> Column:
    """``col #- '{a,b}'`` on a JSON text column: delete at an object path
    (arbitrary depth, object keys only — see dialect._delete_expr)."""
    if not keys:
        return col
    if len(keys) == 1:
        return json_delete(col, keys[0])
    head, rest = keys[0], keys[1:]
    inner = json_delete_path(F.get_json_object(col, _jsonpath([head])), rest)
    return F.to_json(
        F.transform_values(
            F.from_json(col, "map<string,variant>"),
            lambda k, v: F.when(k == F.lit(head), F.parse_json(inner)).otherwise(v),
        )
    )


def containment_sql(lhs_sql: str, pattern_json: str) -> str:
    """Expand PG jsonb containment ``lhs @> '<pattern>'`` into a
    conjunction of ``get_json_object`` path comparisons — pure Spark SQL
    text, JVM-side, codegen-friendly (the dialect layer calls this at
    REWRITE time, so the pattern must be a literal).

    Supported pattern subset (raises ValueError outside it, which makes
    the dialect leave the operator untouched and fail loudly downstream
    instead of silently mis-evaluating): a JSON OBJECT literal with
    nested-object / string / number / boolean leaves. Numbers compare
    through CAST AS DOUBLE so ``69`` matches ``69.0`` (PG numeric jsonb
    equality); ``null`` leaves and array values are outside the subset —
    ``get_json_object`` cannot distinguish "key missing" from "key null",
    and PG array containment is multiset semantics.
    """
    import json

    obj = json.loads(pattern_json)
    if not isinstance(obj, dict):
        raise ValueError("jsonb containment pattern must be a JSON object")
    conds: list[str] = []

    def walk(prefix: list[str], o: dict) -> None:
        for k, v in o.items():
            p = prefix + [k]
            probe = f"get_json_object({lhs_sql}, '{_jsonpath(p)}')"
            if isinstance(v, dict):
                walk(p, v)
            elif isinstance(v, bool):
                conds.append(f"{probe} = '{'true' if v else 'false'}'")
            elif v is None or isinstance(v, list):
                raise ValueError(
                    "null/array values unsupported in jsonb containment "
                    "pattern"
                )
            elif isinstance(v, (int, float)):
                conds.append(f"CAST({probe} AS DOUBLE) = {float(v)!r}")
            else:
                esc = str(v).replace("'", "''")
                conds.append(f"{probe} = '{esc}'")

    walk([], obj)
    return "(" + " AND ".join(conds) + ")" if conds else "true"


def key_exists_sql(lhs_sql: str, key: str) -> str:
    """``lhs ? 'key'``: top-level object key existence as Spark SQL text.
    Subset note: PG's ``?`` on a json NULL value yields true (the key
    exists); ``get_json_object`` returns NULL for both missing and null,
    so null-valued keys read as absent here — same boundary as
    containment_sql."""
    esc = key.replace("'", "''")
    return f"get_json_object({lhs_sql}, '{_jsonpath([esc])}') IS NOT NULL"
