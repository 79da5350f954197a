"""otterbrix_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the otterbrix reference engine
(https://github.com/otterbrix/otterbrix), re-expressed Spark-first.

The reference is a single-node embedded C++ OLAP/OLTP hybrid (PG-dialect SQL,
relation API, columnar 1024-row vectorised execution). This package keeps its
*semantics* — the operator inventory catalogued in SURVEY.md §2 — but the
*execution* is entirely Spark: DataFrame/SQL plans optimised by Catalyst and
run by Tungsten, designed to scale from local[32] to a 1000-executor cluster.

Public surface:
  - ``get_spark()``                 — tuned SparkSession factory (session.py)
  - ``Engine`` / ``connect()``      — SQL entry point A: ``execute_sql(str) -> Cursor``
  - ``Relation`` / ``from_df()``    — DataFrame entry point B (relation API facade)
  - ``otterbrix_spark.workload``    — the full query inventory + DuckDB oracle SQL
  - ``otterbrix_spark.llm``         — dedup / similarity / text-analysis / multimodal
"""

from otterbrix_spark.session import get_spark
from otterbrix_spark.engine import Engine, connect
from otterbrix_spark.relation import Relation, from_df

__all__ = ["get_spark", "Engine", "connect", "Relation", "from_df"]
__version__ = "0.1.0"
