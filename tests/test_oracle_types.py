"""Guard against DuckDB type-widening artifacts in oracle SQL.

The correctness driver's value-hash is type-sensitive: DuckDB types
``SUM(<int expr>)`` as HUGEINT (int128), which pandas/arrow renders
differently from Spark's BIGINT even when the values are identical
(round-1 q22 failure). Every oracle output column must therefore land
on a standard type — BIGINT/INT/DOUBLE/VARCHAR/DATE/TIMESTAMP/BOOLEAN
or lists/structs thereof — never HUGEINT or DECIMAL.

No SparkSession needed: this only type-checks the SQL against DuckDB.
"""

from __future__ import annotations

import pytest

from otterbrix_spark.workload import load_all
from tests.oracle import duck_con

SF_DIR = "/root/testdata/sf0.001"

_BANNED = ("HUGEINT", "INT128", "UHUGEINT", "DECIMAL")


@pytest.mark.parametrize(
    "name", [n for n, s in load_all().items() if s.oracle is not None]
)
def test_oracle_output_types_are_hashable(name):
    spec = load_all()[name]
    rel = duck_con(SF_DIR).sql(spec.oracle)
    offenders = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(b in str(typ).upper() for b in _BANNED)
    ]
    assert not offenders, (
        f"{name}: oracle columns {offenders} would widen to a type the "
        f"driver hashes differently from Spark — add an explicit CAST"
    )
