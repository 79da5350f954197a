"""Physical-layout tooling: bucketed tables for shuffle-free co-located
joins — the 100 TB substitute for the reference's user indexes
(SURVEY.md §2.1: index_scan -> "Z-order/partitioning/bucketing").

`bucketBy` writes hash-bucketed files with bucket metadata in the session
catalog; two tables bucketed on the same key with the same bucket count
join with NO Exchange on either side — the single biggest shuffle saver for
repeated large-large joins (orders⋈lineitem at 100 TB). The layout test
asserts the Exchange-free plan mechanically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (session catalog).

    Drops any previous incarnation first — including the ORPHANED case
    where a prior session's managed location survives on disk without a
    catalog entry in this session (saveAsTable then fails with
    LOCATION_ALREADY_EXISTS)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(
            f"{warehouse.rstrip('/')}/{table_name.lower()}",
            ignore_errors=True,
        )
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key bucketed tables — planner elides both shuffles."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def zorder_value(a_col: str, b_col: str, bits: int = 6) -> "Column":
    """Morton/Z-order interleave of two small-domain integer columns
    (each in [0, 2^bits)) as a pure-codegen expression — the multi-
    dimensional clustering key behind Delta OPTIMIZE ZORDER BY and the
    reference's §2.1 index substitution: sorting by the interleaved key
    keeps rows close in BOTH dimensions, so per-file min/max zone maps
    prune rectangle predicates that a single-column sort cannot."""
    from pyspark.sql import functions as F

    terms = []
    for i in range(bits):
        terms.append(
            f"(shiftright({a_col}, {i}) & 1) * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"(shiftright({b_col}, {i}) & 1) * {1 << (2 * i)}"
        )
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    n_files: int = 32,
    bits: int = 6,
) -> None:
    """Write ``df`` parquet z-ordered on (a_col, b_col): range-partition
    by the Morton key (a sampled range exchange — NOT a single-partition
    global sort, so the layout write itself scales), sort within each
    partition, one file per partition. Readers then prune whole files
    from parquet min/max statistics on BOTH columns."""
    zdf = df.withColumn("__z", zorder_value(a_col, b_col, bits))
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
