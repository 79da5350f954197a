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
