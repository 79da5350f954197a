"""Slowly-changing-dimension (Type 2) maintenance.

The warehouse pattern the reference's UPDATE/MERGE machinery
(components/physical_plan/operators — update/raw-data ops; the x03 MERGE
gate is the row-level sibling) gets used for in practice: instead of
overwriting a dimension attribute, CLOSE the current version
(``valid_to`` = change time) and open a new one, so every fact row can
join the attribute *as of its own timestamp*.

Scale posture: one equi-join of the dimension's OPEN rows against the
change batch plus a union — the closed-history rows are never touched
(append-only), which is what makes SCD2 viable on a billions-row
dimension: per batch cost is O(|open| ⋈ |changes|), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one change batch to a Type-2 dimension.

    ``dim`` carries (key, attr, valid_from, valid_to) with open rows
    marked ``valid_to IS NULL``; ``changes`` carries (key, attr, ts_col)
    with AT MOST one change per key (pre-aggregate upstream — the
    deterministic-batch contract PG's MERGE imposes too; x03 enforces
    the same). A change whose attr equals the open row's attr is a
    no-op. Changes for unknown keys open a brand-new version.
    """
    open_rows = dim.filter(F.col(valid_to).isNull())
    closed_rows = dim.filter(F.col(valid_to).isNotNull())

    ch = changes.select(
        F.col(key),
        F.col(attr).alias("__new_attr"),
        F.col(ts_col).alias("__ts"),
    )
    joined = open_rows.join(ch, key, "full_outer")

    untouched = joined.filter(
        F.col("__new_attr").isNull()
        | (F.col("__new_attr") == F.col(attr))
    ).select(*dim.columns)

    closing = joined.filter(
        F.col("__new_attr").isNotNull()
        & F.col(attr).isNotNull()
        & (F.col("__new_attr") != F.col(attr))
    )
    closed_now = closing.select(
        *[
            F.col("__ts").alias(valid_to) if c == valid_to else F.col(c)
            for c in dim.columns
        ]
    )
    opened_now = closing.select(
        F.col(key),
        F.col("__new_attr").alias(attr),
        F.col("__ts").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    ).select(*dim.columns)

    brand_new = joined.filter(
        F.col("__new_attr").isNotNull() & F.col(attr).isNull()
    ).select(
        F.col(key),
        F.col("__new_attr").alias(attr),
        F.col("__ts").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    ).select(*dim.columns)

    return (
        closed_rows.unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(opened_now)
        .unionByName(brand_new)
    )
