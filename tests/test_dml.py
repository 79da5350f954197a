"""DML/DDL emulation tests — reference shapes from
`integration/cpp/test/` (INSERT/UPDATE/DELETE with RETURNING, constraints,
FK cascade, matview refresh — SURVEY.md §2.10) on the F2 employees/
departments fixture (FIXTURES.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otterbrix_spark.operators.dml import (
    ConstraintViolation,
    ManagedTable,
    MaterializedView,
    check_constraint,
    fk_cascade_delete,
    fk_check,
    with_sequence,
)


@pytest.fixture()
def departments(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "eng", 1000), (2, "sales", 500), (3, "ops", 300)],
        "id: bigint, name: string, budget: bigint",
    )
    return ManagedTable.create(spark, str(tmp_path / "departments"), df)


@pytest.fixture()
def employees(spark, tmp_path):
    rows = [
        (1, "ada", 120, 1),
        (2, "bob", 80, 1),
        (3, "cyd", 95, 2),
        (4, "dan", 60, 2),
        (5, "eve", 70, 3),
    ]
    df = spark.createDataFrame(rows, "id: bigint, name: string, salary: bigint, dept_id: bigint")
    return ManagedTable.create(spark, str(tmp_path / "employees"), df)


def test_insert_values_and_returning(spark, employees):
    new = spark.createDataFrame(
        [(6, "fay", 100, 1)], "id: bigint, name: string, salary: bigint, dept_id: bigint"
    )
    returned = employees.insert(new, returning=True)
    assert [tuple(r) for r in returned.collect()] == [(6, "fay", 100, 1)]
    assert employees.df().count() == 6


def test_update_set_exprs_returning(spark, employees):
    # UPDATE employees SET salary = salary + 10 WHERE dept_id = 1 RETURNING *
    result = employees.update(
        F.col("dept_id") == 1, {"salary": F.col("salary") + 10}, returning=True
    )
    got = {r["name"]: r["salary"] for r in result.collect()}
    assert got == {"ada": 130, "bob": 90}
    persisted = {r["name"]: r["salary"] for r in employees.df().collect()}
    assert persisted["ada"] == 130 and persisted["cyd"] == 95


def test_delete_returning(employees):
    result = employees.delete(F.col("salary") < 75, returning=True)
    assert {r["name"] for r in result.collect()} == {"dan", "eve"}
    assert employees.df().count() == 3


def test_check_constraint(spark, employees):
    check_constraint(employees.df(), F.col("salary") > 0, "positive_salary")
    with pytest.raises(ConstraintViolation):
        check_constraint(employees.df(), F.col("salary") > 100, "rich_only")


def test_fk_check(spark, employees, departments):
    fk_check(employees.df(), departments.df(), "dept_id", "id")
    dangling = spark.createDataFrame(
        [(9, "zoe", 50, 99)], "id: bigint, name: string, salary: bigint, dept_id: bigint"
    )
    employees.insert(dangling)
    with pytest.raises(ConstraintViolation):
        fk_check(employees.df(), departments.df(), "dept_id", "id")


def test_fk_cascade_delete(employees, departments):
    n_parents, n_children = fk_cascade_delete(
        departments, employees, F.col("name") == "eng", "dept_id", "id"
    )
    assert (n_parents, n_children) == (1, 2)
    assert departments.df().count() == 2
    assert {r["name"] for r in employees.df().collect()} == {"cyd", "dan", "eve"}


def test_matview_refresh(spark, tmp_path, employees):
    mv = MaterializedView(
        spark,
        str(tmp_path / "mv_dept_salary"),
        lambda: employees.df().groupBy("dept_id").agg(F.sum("salary").alias("total")),
    )
    before = {r["dept_id"]: r["total"] for r in mv.df().collect()}
    assert before[1] == 200
    employees.update(F.col("name") == "ada", {"salary": F.lit(200)})
    # stale until refreshed (matview semantics)
    assert {r["dept_id"]: r["total"] for r in mv.df().collect()}[1] == 200
    mv.refresh()
    assert {r["dept_id"]: r["total"] for r in mv.df().collect()}[1] == 280


def test_sequence(spark):
    df = spark.createDataFrame([("x",), ("y",), ("z",)], "v: string")
    out = with_sequence(df, "id", start=10)
    assert sorted(r["id"] for r in out.collect()) == [10, 11, 12]
