"""Engine facade — entry point A of the reference (`execute_sql(str) ->
Cursor`, `integration/cpp/wrapper_dispatcher.cpp:91-118`).

`spark.sql` subsumes the reference's parse → transform → resolve → optimise →
execute lifecycle (SURVEY.md §3); this facade adds the PG-dialect rewrite,
table registration, and the cursor contract. Parameterised queries (``$1``
placeholders, reference `parameter_node_t`) map onto Spark's native
parameterised `spark.sql(query, args)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from otterbrix_spark.catalog import Catalog
from otterbrix_spark.cursor import Cursor
from otterbrix_spark.dialect import rewrite
from otterbrix_spark.session import configure_session, get_spark
from otterbrix_spark.sources.registry import register_views


class Engine:
    def __init__(self, spark: SparkSession | None = None, table_dir: str | None = None):
        self.spark = spark or get_spark()
        configure_session(self.spark)
        self.catalog = Catalog(self.spark, table_dir)

    # -- catalog ------------------------------------------------------------
    def register_corpus(self, sf_dir: str) -> None:
        """Register the synthetic test corpus directory as temp views."""
        register_views(self.spark, sf_dir)

    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    # -- entry point A ------------------------------------------------------
    def execute_sql(self, sql: str, *params) -> Cursor:
        """PG-dialect SQL -> rewritten Spark SQL -> Cursor.

        ``$1``-style positional parameters are bound via Spark's native
        parameterised SQL (constants extracted exactly like the reference's
        parameter_node_t). Semicolon-separated multi-statement batches run
        sequentially (reference operator_sequence/operator_batch); the last
        statement's cursor is returned.
        """
        statements = _split_statements(sql)
        if len(statements) > 1:
            cur = None
            for stmt in statements:
                cur = self.execute_sql(stmt, *params)
            return cur
        body = rewrite(sql)
        if params:
            import re

            body = re.sub(r"\$(\d+)", lambda m: f":p{m.group(1)}", body)
            args = {f"p{i + 1}": v for i, v in enumerate(params)}
            return Cursor(self.spark.sql(body, args=args))
        if self.catalog.handles(body):
            return Cursor(self.catalog.route(body))
        return Cursor(self.spark.sql(body))

    def sql(self, sql: str, *params) -> DataFrame:
        return self.execute_sql(sql, *params).df

    # -- entry point B bridge ----------------------------------------------
    def from_df(self, obj, name: str | None = None):
        from otterbrix_spark.relation import from_df

        rel = from_df(obj, spark=self.spark)
        if name:
            rel.df.createOrReplaceTempView(name)
        return rel


def _split_statements(sql: str) -> list[str]:
    """Split a batch on top-level semicolons (string-literal aware)."""
    out, cur, in_str = [], "", False
    for ch in sql:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            if cur.strip():
                out.append(cur.strip())
            cur = ""
            continue
        cur += ch
    if cur.strip():
        out.append(cur.strip())
    return out


def connect(spark: SparkSession | None = None) -> Engine:
    """Mirror of the reference Python `connect()` entry point."""
    return Engine(spark)


def explain_sql(engine: Engine, sql: str, mode: str = "formatted") -> str:
    """EXPLAIN facade: rewritten-dialect SQL -> physical plan text."""
    df = engine.sql(sql)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)
