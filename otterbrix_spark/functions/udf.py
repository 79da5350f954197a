"""UDF registry surface — the reference's function registry mapped to Spark.

Reference (`components/compute/function.hpp:216-246`):
  - `row_function`   (tuple-at-a-time)  -> `spark.udf.register` (Python UDF)
  - `vector_function` (batch)           -> `pandas_udf` (Arrow-batched)
  - `aggregate_function`                -> `pandas_udf` GROUPED_AGG
  - SQL `CREATE FUNCTION` macros        -> Spark SQL functions (`CREATE
    FUNCTION ... RETURN expr`, the reference's SQL-body substitution)

Registered UDFs are usable in projections *and* WHERE clauses — the
reference's `function_predicate` (`operators/predicates/
function_predicate.cpp`). Registration is per-session; the reference fans
registration out to per-executor registries, which Spark does automatically
when shipping the serialised function.

Scale note: row UDFs are the documented slow path (pickled Python per row);
vector UDFs run over Arrow batches (~10-100x faster). Anything expressible
as built-in `F.*` expressions should never be a UDF at all.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class FunctionRegistry:
    """Session-scoped UDF registry mirroring register_udf/unregister_udf
    (`integration/cpp/test/test_udfs.cpp:199-214,386-392`)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._registered: dict[str, str] = {}

    def register_row_udf(self, name: str, fn, return_type: str) -> None:
        """Tuple-at-a-time UDF (reference row_function)."""
        self.spark.udf.register(name, fn, return_type)
        self._registered[name] = "row"

    def register_vector_udf(self, name: str, fn, return_type: str) -> None:
        """Arrow-batched UDF over pandas Series (reference vector_function)."""
        self.spark.udf.register(name, F.pandas_udf(fn, return_type))
        self._registered[name] = "vector"

    def register_agg_udf(self, name: str, fn, return_type: str) -> None:
        """Grouped-aggregate UDF: pandas Series -> scalar."""
        self.spark.udf.register(
            name, F.pandas_udf(fn, return_type, F.PandasUDFType.GROUPED_AGG)
        )
        self._registered[name] = "aggregate"

    def register_macro(
        self, name: str, params: list[str], return_type: str, body_expr: str
    ) -> None:
        """SQL macro: the reference lowers CREATE FUNCTION to SQL-body
        substitution (`transform_macro.cpp`); Spark ≥3.4 has native SQL UDFs.
        ``params`` are typed declarations, e.g. ``["x DOUBLE", "y DOUBLE"]``.
        """
        plist = ", ".join(params)
        self.spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({plist}) "
            f"RETURNS {return_type} RETURN {body_expr}"
        )
        self._registered[name] = "macro"

    def unregister(self, name: str) -> None:
        if self._registered.pop(name, None) == "macro":
            self.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
        else:
            # Spark has no public unregister; shadow with an erroring stub
            def gone(*_args):
                raise RuntimeError(f"UDF {name} was unregistered")

            self.spark.udf.register(name, gone, "string")

    def names(self) -> list[str]:
        return sorted(self._registered)
