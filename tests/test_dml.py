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


# -- round-2 semantics fixes (ADVICE r01) ------------------------------------


def test_update_evaluates_where_and_sets_on_old_row(spark, employees):
    # UPDATE ... SET salary = .., dept_id = .. WHERE salary = 80:
    # PG evaluates WHERE and ALL SET exprs against the OLD row, so modifying
    # a WHERE column must not skip later assignments or empty RETURNING.
    result = employees.update(
        F.col("salary") == 80,
        {"salary": F.col("salary") + 1, "dept_id": F.col("salary")},
        returning=True,
    )
    rows = [tuple(r) for r in result.select("name", "salary", "dept_id").collect()]
    assert rows == [("bob", 81, 80)]  # dept_id = OLD salary, not 81
    persisted = {r["name"]: (r["salary"], r["dept_id"]) for r in employees.df().collect()}
    assert persisted["bob"] == (81, 80)


def test_update_swap_of_two_columns_uses_old_values(spark, tmp_path):
    df = spark.createDataFrame([(1, 10, 20)], "id: bigint, a: bigint, b: bigint")
    t = ManagedTable.create(spark, str(tmp_path / "swap"), df)
    t.update(F.lit(True), {"a": F.col("b"), "b": F.col("a")})
    assert [tuple(r) for r in t.df().collect()] == [(1, 20, 10)]


def test_delete_null_predicate_keeps_rows(spark, tmp_path):
    # three-valued logic: DELETE WHERE x > 5 must KEEP rows with NULL x
    df = spark.createDataFrame(
        [(1, 10), (2, 3), (3, None)], "id: bigint, x: bigint"
    )
    t = ManagedTable.create(spark, str(tmp_path / "tvl"), df)
    n = t.delete(F.col("x") > 5)
    assert n == 1
    kept = sorted(r["id"] for r in t.df().collect())
    assert kept == [2, 3]  # the NULL-x row survives


def test_update_null_predicate_leaves_rows_unchanged(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "id: bigint, x: bigint"
    )
    t = ManagedTable.create(spark, str(tmp_path / "unull"), df)
    n = t.update(F.col("x") > 5, {"x": F.lit(0)})
    assert n == 1
    got = {r["id"]: r["x"] for r in t.df().collect()}
    assert got == {1: 0, 2: None}


def test_fk_cascade_is_join_based_no_driver_collect(spark, tmp_path):
    # a wide cascade: 10_000 doomed parent keys must never materialise on
    # the driver (the old collect+isin path); semi/anti joins handle it
    parents = spark.range(20_000).select(
        F.col("id").alias("pid"), (F.col("id") % 2).alias("doomed")
    )
    children = spark.range(40_000).select(
        F.col("id").alias("cid"), (F.col("id") % 20_000).alias("pid")
    )
    pt = ManagedTable.create(spark, str(tmp_path / "p"), parents)
    ct = ManagedTable.create(spark, str(tmp_path / "c"), children)
    n_parents, n_children = fk_cascade_delete(
        pt, ct, F.col("doomed") == 1, "pid", "pid"
    )
    assert n_parents == 10_000
    assert n_children == 20_000
    assert pt.df().count() == 10_000
    assert ct.df().count() == 20_000


def test_with_sequence_dense_multi_partition_no_global_window(spark):
    df = spark.range(0, 10_000, 1, 8).select(
        (F.col("id") * 7 % 13).alias("payload")
    )
    out = with_sequence(df, "seq", start=100)
    ids = sorted(r["seq"] for r in out.collect())
    assert ids == list(range(100, 10_100))
    # plan audit: no global (partition-less) Window over the full frame —
    # every Window must either be partitioned or run on the tiny offsets side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "spark_partition_id" in plan.lower() or "_pid" in plan


# -- writer mutex (reference transaction_manager.hpp single-node scope) ------


def test_swap_blocks_on_held_writer_lock(spark, tmp_path):
    import fcntl
    import os
    import threading
    import time

    from otterbrix_spark.operators.dml import ManagedTable

    path = str(tmp_path / "locked_table")
    mt = ManagedTable.create(
        spark, path, spark.range(5).toDF("id"), "locked_table"
    )

    # a second "engine" holds the writer lock on the same table directory
    fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.flock(fd, fcntl.LOCK_EX)

    done = threading.Event()

    def writer():
        mt._swap_in(mt.df().filter("id < 3"))
        done.set()

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    # while the lock is held, the swap must NOT complete
    assert not done.wait(timeout=1.5), "swap proceeded under a held writer lock"
    fcntl.flock(fd, fcntl.LOCK_UN)
    os.close(fd)
    # released: the queued swap completes and the state is the new frame
    assert done.wait(timeout=30), "swap never completed after lock release"
    t.join()
    assert mt.df().count() == 3


def test_concurrent_inserts_serialise(spark, tmp_path):
    import threading

    from otterbrix_spark.operators.dml import ManagedTable

    path = str(tmp_path / "conc_table")
    mt = ManagedTable.create(
        spark, path, spark.range(0).toDF("id"), "conc_table"
    )
    errors = []

    def insert_batch(offset: int):
        try:
            for i in range(3):
                mt.insert(spark.range(offset + i * 10, offset + i * 10 + 5).toDF("id"))
        except Exception as exc:  # pragma: no cover - failure detail
            errors.append(exc)

    threads = [threading.Thread(target=insert_batch, args=(k,)) for k in (100, 200)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # every appended row is present exactly once
    assert mt.df().count() == 30
    assert mt.df().select("id").distinct().count() == 30
