"""Skew mitigation: salted aggregation and salted broadcast-replicated joins.

AQE's skew-join splitting (enabled session-wide) is the first line of
defence; these helpers are the explicit second line for the cases AQE cannot
fix — a skewed *aggregation* key, or a skewed join where the build side must
be replicated.

Pattern (the standard two-phase rewrite):
  - salted aggregate: key -> (key, salt) partial agg -> re-agg by key. The
    heavy key's rows spread over `n_salts` reducers; the second aggregation
    touches only n_salts rows per key.
  - salted join: fact side gets a random-ish salt derived from a stable hash
    of other columns; the small side is replicated n_salts times. Equi-join
    on (key, salt) spreads the hot key's probe rows.

Determinism note: the salt must be *stable per row* (derived by hash, never
rand()) so results are reproducible and retries/stage-replays see the same
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def stable_salt(cols: list[str], n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts) from a stable hash."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_count_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe COUNT + quantised SUM grouped by ``key``.

    Phase 1 aggregates by (key, salt) — map-side combine still applies;
    phase 2 merges the ≤ n_salts partials per key. Output: (key, n, total).
    """
    q = F.floor(F.col(value) * F.lit(10000.0)).cast("long")
    salt = stable_salt(salt_cols or [value], n_salts)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(q).alias("_qs"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        (F.sum("_qs").cast("double") / F.lit(10000.0)).alias("total"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact salted per row, dim replicated n_salts
    times, join on (key, salt). Use when one fact key dominates and the dim
    side is small enough to replicate but too large to broadcast whole."""
    salt_source = salt_cols or [c for c in fact.columns if c != key][:1] or [key]
    salted_fact = fact.withColumn("_salt", stable_salt(salt_source, n_salts))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")
