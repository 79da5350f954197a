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
        body = self.catalog.canonicalize(rewrite(sql))
        if params:
            if self.catalog.handles(body):
                # routed statements (DML/DDL on managed tables, SET ...) go
                # through the Catalog, which has no parameter binder — inline
                # the literals exactly as the reference's parameter_node_t
                # folds constants into the plan
                import re

                body = re.sub(
                    r"\$(\d+)",
                    lambda m: _sql_literal(params[int(m.group(1)) - 1]),
                    body,
                )
                return Cursor(self.catalog.route(body))
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


def _sql_literal(value) -> str:
    """Render a Python value as a SQL literal (for routed-statement binding)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):  # before int: bool is an int subclass
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        # repr() of non-finite floats ('inf', 'nan') is not valid SQL
        if value != value:
            return "CAST('NaN' AS DOUBLE)"
        if value == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if value == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(value)
    if isinstance(value, int):
        return repr(value)
    # Spark treats backslash as an escape inside string literals — double it
    # before quote-doubling so a trailing '\' can't swallow the closing quote
    return "'" + str(value).replace("\\", "\\\\").replace("'", "''") + "'"


def _only_comments(stmt: str) -> bool:
    """True when a segment contains nothing but comments/whitespace (e.g.
    a trailing `/* ... */` after the final ';') — not a statement."""
    import re

    stripped = re.sub(r"--[^\n]*", "", stmt)
    stripped = re.sub(r"/\*.*?\*/", "", stripped, flags=re.DOTALL)
    return not stripped.strip()


def _split_statements(sql: str) -> list[str]:
    """Split a batch on top-level semicolons — string-literal AND
    comment-aware: a ';' inside '...', a `--` line comment, or a `/* */`
    block comment never splits the batch (comments are preserved verbatim;
    Spark's parser accepts both forms). Comment-only segments are dropped."""
    import re as _re

    out: list[str] = []
    cur = ""
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "$":  # PG dollar-quoted string: $tag$ ... $tag$
            m = _re.match(r"\$[A-Za-z_]\w*\$|\$\$", sql[i:])
            if m:
                tag = m.group(0)
                j = sql.find(tag, i + len(tag))
                j = n if j == -1 else j + len(tag)
                cur += sql[i:j]
                i = j
                continue
        if ch == "'":  # string literal; '' is an escaped quote inside it
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur += sql[i : j + 1]
            i = j + 1
            continue
        if ch == "-" and sql[i : i + 2] == "--":  # line comment
            j = sql.find("\n", i)
            j = n if j == -1 else j
            cur += sql[i:j]
            i = j
            continue
        if ch == "/" and sql[i : i + 2] == "/*":  # block comment
            j = sql.find("*/", i + 2)
            j = n if j == -1 else j + 2
            cur += sql[i:j]
            i = j
            continue
        if ch == ";":
            if cur.strip() and not _only_comments(cur):
                out.append(cur.strip())
            cur = ""
            i += 1
            continue
        cur += ch
        i += 1
    if cur.strip() and not _only_comments(cur):
        out.append(cur.strip())
    return out


def connect(spark: SparkSession | None = None) -> Engine:
    """Mirror of the reference Python `connect()` entry point."""
    return Engine(spark)


def explain_sql(engine: Engine, sql: str, mode: str = "formatted") -> str:
    """EXPLAIN facade: rewritten-dialect SQL -> physical plan text."""
    df = engine.sql(sql)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)
