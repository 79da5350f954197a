"""Dynamic-schema ("computing") table tests — the F4 fixture shapes
(FIXTURES.md): schema grows per batch, reads see the union schema with
NULLs, same-name/different-type columns resolve via variant-select."""

from __future__ import annotations

from pyspark.sql import functions as F

from otterbrix_spark.sources.dynamic import DynamicTable


def _dt(spark, tmp_path) -> DynamicTable:
    return DynamicTable(spark, str(tmp_path / "dyn"))


def test_schema_grows_with_batches(spark, tmp_path):
    t = _dt(spark, tmp_path)
    t.insert(spark.createDataFrame([(1, "a")], "id: bigint, a: string"))
    assert set(t.df().columns) == {"id", "a"}

    t.insert(spark.createDataFrame([(2, "b", 2.5)], "id: bigint, a: string, b: double"))
    df = t.df()
    assert set(df.columns) == {"id", "a", "b"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["b"] is None  # missing column reads as NULL
    assert rows[2]["b"] == 2.5


def test_nested_struct_batch(spark, tmp_path):
    t = _dt(spark, tmp_path)
    t.insert(spark.createDataFrame([(1, "a")], "id: bigint, a: string"))
    t.insert(
        spark.createDataFrame(
            [(3, (7, "y"))], "id: bigint, c: struct<x: bigint, y: string>"
        )
    )
    df = t.df()
    assert set(df.columns) == {"id", "a", "c"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["c"] is None
    assert rows[3]["c"]["x"] == 7 and rows[3]["a"] is None


def test_type_conflict_widens_and_variant_select(spark, tmp_path):
    t = _dt(spark, tmp_path)
    t.insert(spark.createDataFrame([(1, 42)], "id: bigint, d: bigint"))
    t.insert(spark.createDataFrame([(2, "hello")], "id: bigint, d: string"))

    # merged read widens d to string (both values visible)
    df = t.df()
    rows = {r["id"]: r["d"] for r in df.collect()}
    assert rows == {1: "42", 2: "hello"}

    # variant-select `d ::? bigint` keeps only genuinely-numeric branches
    sel = t.variant_select("d", "bigint")
    assert [(r["id"], r["d"]) for r in sel.collect()] == [(1, 42)]


def test_numeric_widening(spark, tmp_path):
    t = _dt(spark, tmp_path)
    t.insert(spark.createDataFrame([(1, 5)], "id: bigint, v: int"))
    t.insert(spark.createDataFrame([(2, 2.5)], "id: bigint, v: double"))
    df = t.df()
    assert dict(df.dtypes)["v"] == "double"
    assert {r["id"]: r["v"] for r in df.collect()} == {1: 5.0, 2: 2.5}


def test_variant_select_excludes_nonintegral_doubles(spark, tmp_path):
    # self-review r13 pass 3: the widened-column try_cast TRUNCATED
    # 2.5 -> 2; branch selection must exclude it
    t = _dt(spark, tmp_path)
    t.insert(spark.createDataFrame([(1, 42)], "id: bigint, v: bigint"))
    t.insert(spark.createDataFrame([(2, 2.5)], "id: bigint, v: double"))
    t.insert(spark.createDataFrame([(3, 7.0)], "id: bigint, v: double"))
    sel = {r["id"]: r["v"] for r in t.variant_select("v", "bigint").collect()}
    # 42 is a bigint; 7.0 is exactly representable; 2.5 is NOT
    assert sel == {1: 42, 3: 7}


def test_long_float_widen_to_double(spark, tmp_path):
    t = _dt(spark, tmp_path)
    big = 9007199254740993  # not representable in float OR double exactly±
    t.insert(spark.createDataFrame([(1, big)], "id: bigint, v: bigint"))
    t.insert(
        spark.createDataFrame(
            [(2, 1.5)], "id: bigint, v: float"
        )
    )
    assert dict(t.df().dtypes)["v"] == "double"
