"""UDF surface tests — reference `test_udfs.cpp` shapes: register row/vector/
aggregate UDFs + SQL macros, use them in projections and WHERE
(function_predicate), unregister."""

from __future__ import annotations

import pandas as pd
import pytest

from otterbrix_spark.functions.udf import FunctionRegistry


@pytest.fixture(scope="module")
def registry(spark, sf_dir):
    from otterbrix_spark.sources.registry import register_views

    register_views(spark, sf_dir)
    return FunctionRegistry(spark)


def test_row_udf_in_projection_and_where(spark, registry):
    registry.register_row_udf("otx_double_it", lambda x: x * 2, "bigint")
    got = spark.sql("SELECT otx_double_it(21) AS v").collect()[0]["v"]
    assert got == 42
    # function_predicate: UDF in WHERE
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM nation WHERE otx_double_it(n_nationkey) > 40"
    ).collect()[0]["n"]
    assert n == 4  # nationkeys 21..24


def test_vector_udf(spark, registry):
    registry.register_vector_udf(
        "otx_vec_norm", lambda s: (s - s.mean()) / 1.0, "double"
    )
    out = spark.sql(
        "SELECT otx_vec_norm(CAST(n_nationkey AS DOUBLE)) AS z FROM nation"
    ).collect()
    assert len(out) == 25


def test_agg_udf(spark, registry):
    registry.register_agg_udf("otx_span", lambda s: float(s.max() - s.min()), "double")
    got = spark.sql(
        "SELECT otx_span(CAST(n_nationkey AS DOUBLE)) AS span FROM nation"
    ).collect()[0]["span"]
    assert got == 24.0


def test_sql_macro(spark, registry):
    registry.register_macro(
        "otx_net_price", ["price DOUBLE", "disc DOUBLE"], "DOUBLE", "price * (1 - disc)"
    )
    got = spark.sql("SELECT otx_net_price(100.0, 0.25) AS v").collect()[0]["v"]
    assert got == 75.0


def test_unregister(spark, registry):
    registry.register_row_udf("otx_temp_fn", lambda x: x, "bigint")
    assert spark.sql("SELECT otx_temp_fn(1) AS v").collect()[0]["v"] == 1
    registry.unregister("otx_temp_fn")
    with pytest.raises(Exception):
        spark.sql("SELECT otx_temp_fn(1) AS v").collect()


# -- CREATE FUNCTION through SQL + pg_proc-style persistence -----------------
# (reference transform_macro.cpp lambda bodies, test_sql_features.cpp:4478;
#  operator_register_udf.cpp persists function rows across sessions)


def test_create_function_lambda_body(spark, tmp_path, sf_dir):
    from otterbrix_spark.engine import Engine

    eng = Engine(spark, table_dir=str(tmp_path))
    eng.register_corpus(sf_dir)
    eng.sql("CREATE DATABASE ddlfn")
    eng.sql(
        "CREATE FUNCTION ddlfn.ddl_double(x INT) RETURNS INT AS 'x -> x * 2'"
    )
    assert eng.sql("SELECT ddlfn.ddl_double(21) AS v").collect()[0][0] == 42
    # usable in WHERE over a real table
    n = eng.sql(
        "SELECT COUNT(*) AS c FROM nation WHERE ddlfn.ddl_double(CAST(n_nationkey AS INT)) >= 40"
    ).collect()[0][0]
    assert n == 5  # nationkeys 20..24


def test_create_function_return_form_and_drop(spark, tmp_path, sf_dir):
    from otterbrix_spark.engine import Engine

    eng = Engine(spark, table_dir=str(tmp_path))
    eng.sql(
        "CREATE FUNCTION add3(a INT, b INT, c INT) RETURNS INT RETURN a + b + c"
    )
    assert eng.sql("SELECT add3(1, 2, 3) AS v").collect()[0][0] == 6
    eng.sql("DROP FUNCTION add3")
    import pytest as _pytest

    with _pytest.raises(Exception):
        eng.sql("SELECT add3(1, 2, 3) AS v").collect()


def test_functions_persist_across_engines(spark, tmp_path, sf_dir):
    from otterbrix_spark.engine import Engine

    d = str(tmp_path)
    eng1 = Engine(spark, table_dir=d)
    eng1.sql("CREATE FUNCTION persisted_sq(x DOUBLE) RETURNS DOUBLE AS 'x -> x * x'")
    # a brand-new engine over the same table_dir replays the registry
    eng2 = Engine(spark, table_dir=d)
    assert eng2.sql("SELECT persisted_sq(4.0) AS v").collect()[0][0] == 16.0
    assert "persisted_sq" in eng2.catalog.functions
