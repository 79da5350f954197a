"""Deterministic numeric aggregates for cross-engine reproducibility.

Floating-point SUM/AVG are order-dependent: Spark's partial aggregation over
shuffled partitions and DuckDB's sequential scan produce results differing in
the last bits, failing a value-hash comparison. Worse, double→DECIMAL casts
round differently across engines (Java BigDecimal rounds the shortest decimal
representation HALF_UP; DuckDB rounds the scaled double), so a decimal-cast
sum is *also* not portable.

The engine's convention — applied identically in the Spark plans and in the
DuckDB oracle SQL — quantises with pure IEEE ops before aggregating:

    SUM_det(x)  =  SUM(CAST(FLOOR(x * 10^4) AS BIGINT)) / 10^4

``x * 10000.0`` and ``FLOOR`` are single IEEE-754 operations (bit-identical
everywhere); the integer sum is exact and order-insensitive; the final
divide is one more deterministic double op. Truncation at 1e-4 is the
documented contract of these aggregates.

Scale posture: the quantised sum is map-side-combinable (partial BIGINT sums)
and skew-free; |sum| stays under 2^53 for anything the harness runs. A
production deployment summing quadrillions would swap the BIGINT for
DECIMAL(38,0) — same shape, no plan change.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCALE = 10000.0  # 4 decimal digits


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive, engine-portable SUM of a double expression.

    Accepts either a Column or a SQL expression string. The string form
    builds the whole aggregate in ONE ``F.expr`` py4j round-trip instead
    of ~8 Column-op calls — driver-side plan construction is ~25% of the
    sequential headline wall at bench scale (SCALE.md round-13
    decomposition), and the py4j socket hop is its entire cost. Both
    forms parse to the identical Catalyst tree (``D`` suffix keeps the
    scale literal a DOUBLE, matching ``F.lit(SCALE)``)."""
    if isinstance(col, str):
        return F.expr(
            f"CAST(SUM(CAST(FLOOR(({col}) * {SCALE}D) AS BIGINT)) AS DOUBLE)"
            f" / {SCALE}D AS {alias}"
        )
    q = F.floor(col * F.lit(SCALE)).cast("long")
    return (F.sum(q).cast("double") / F.lit(SCALE)).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive AVG: quantised exact sum / non-null count.

    String form: one ``F.expr`` round-trip (see :func:`dsum`)."""
    if isinstance(col, str):
        return F.expr(
            f"CAST(SUM(CAST(FLOOR(({col}) * {SCALE}D) AS BIGINT)) AS DOUBLE)"
            f" / COUNT({col}) / {SCALE}D AS {alias}"
        )
    q = F.floor(col * F.lit(SCALE)).cast("long")
    return ((F.sum(q).cast("double") / F.count(col)) / F.lit(SCALE)).alias(alias)


def oracle_dsum_expr(expr: str) -> str:
    """Bare (un-aliased) DuckDB expression form of :func:`dsum`."""
    return f"CAST(SUM(CAST(FLOOR(({expr}) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0"


def oracle_davg_expr(expr: str) -> str:
    """Bare (un-aliased) DuckDB expression form of :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 10000.0) AS BIGINT)) AS DOUBLE)"
        f" / COUNT({expr})) / 10000.0"
    )


def oracle_dsum(expr: str, alias: str) -> str:
    """DuckDB SQL equivalent of :func:`dsum` (same quantisation)."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0"
        f" AS {alias}"
    )


def oracle_davg(expr: str, alias: str) -> str:
    """DuckDB SQL equivalent of :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 10000.0) AS BIGINT)) AS DOUBLE)"
        f" / COUNT({expr})) / 10000.0 AS {alias}"
    )
