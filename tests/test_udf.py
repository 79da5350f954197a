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
