"""Relation API facade — entry point B of the reference (Python DataFrame
surface: `connect() -> from_df(...)` then `project/filter/group/order/join/
cross/limit/select` + expression overloads —
`integration/python/otterbrix_wrapper/relation_initialize.cpp:35-62`).

The facade is intentionally thin: a Relation wraps a PySpark DataFrame, every
method appends to the same Catalyst logical plan the SQL path produces, and
``pyspark.sql.Column`` already provides the reference's expression operator
overloads (`==`, `>`, arithmetic, `.alias`, `.asc/.desc`, `.rlike`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from otterbrix_spark.session import get_spark


class Relation:
    def __init__(self, df: DataFrame):
        self.df = df

    # -- relational verbs (reference names) ---------------------------------
    def project(self, *cols) -> "Relation":
        return Relation(self.df.select(*cols))

    select = project

    def filter(self, cond) -> "Relation":
        return Relation(self.df.filter(cond))

    def group(self, by, aggs) -> "Relation":
        """group(["k"], {"total": F.sum("x")}) — dict values may be Columns
        or (fn_name, col_name) tuples mirroring the reference registry names
        (count/sum/avg/min/max)."""
        agg_cols = []
        for alias, spec in aggs.items():
            if isinstance(spec, Column):
                agg_cols.append(spec.alias(alias))
            else:
                fn, col = spec
                agg_cols.append(getattr(F, fn)(col).alias(alias))
        by = [by] if isinstance(by, (str, Column)) else list(by)
        return Relation(self.df.groupBy(*by).agg(*agg_cols))

    def order(self, *cols) -> "Relation":
        return Relation(self.df.orderBy(*cols))

    sort = order

    def join(self, other: "Relation", on, how: str = "inner") -> "Relation":
        # reference relation API supports inner/left only
        # (`relation_initialize.cpp:49-56`); we expose Spark's full set.
        return Relation(self.df.join(other.df, on, how))

    def cross(self, other: "Relation") -> "Relation":
        return Relation(self.df.crossJoin(other.df))

    def limit(self, n: int, offset: int = 0) -> "Relation":
        df = self.df.offset(offset) if offset else self.df
        return Relation(df.limit(n))

    def distinct(self) -> "Relation":
        return Relation(self.df.distinct())

    # -- materialisation -----------------------------------------------------
    def fetchall(self) -> list[tuple]:
        return [tuple(r) for r in self.df.collect()]

    def fetchdf(self):
        return self.df.toPandas()

    def __getattr__(self, item):
        # column access: rel.c_acctbal -> Column (expression building)
        return getattr(self.df, item)


def from_df(obj, spark: SparkSession | None = None) -> Relation:
    """Ingest pandas / pyarrow / list-of-dict / Spark DataFrame into a
    Relation (reference `from_df`; Arrow-accelerated via Spark's conversion).
    """
    spark = spark or get_spark()
    if isinstance(obj, DataFrame):
        return Relation(obj)
    try:
        import pyarrow as pa

        if isinstance(obj, pa.Table):
            return Relation(spark.createDataFrame(obj.to_pandas()))
    except ImportError:
        pass
    # polars (reference test_polars_ingest.py): duck-typed — polars is not
    # installed in this container, but any frame exposing to_arrow() takes
    # the Arrow path
    if hasattr(obj, "to_arrow") and callable(obj.to_arrow):
        return Relation(spark.createDataFrame(obj.to_arrow().to_pandas()))
    return Relation(spark.createDataFrame(obj))
