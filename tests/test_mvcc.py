"""MVCC semantics for versioned managed tables — the snapshot-isolation /
first-committer-wins contract of the reference's transaction layer
(`components/table/transaction.hpp:38-62`,
`components/table/transaction_manager.hpp`), on parquet version
directories with an atomic pointer."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import Row, functions as F

from otterbrix_spark.operators.mvcc import VersionedTable, WriteConflict


@pytest.fixture()
def table(spark, tmp_path):
    src = spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(10)]
    )
    return VersionedTable.create(spark, str(tmp_path / "vt"), src)


def test_snapshot_is_repeatable_across_commits(table):
    ver, pinned = table.snapshot()
    assert ver == 1
    w = table.begin()
    w.commit(w.frame.filter(F.col("k") < 5))  # v2: delete half
    # the pinned snapshot still sees all 10 rows; a fresh one sees 5
    assert pinned.count() == 10
    assert table.current_version() == 2
    assert table.df().count() == 5


def test_first_committer_wins(table):
    a = table.begin()
    b = table.begin()
    a.commit(a.frame.withColumn("v", F.col("v") + 1))
    with pytest.raises(WriteConflict):
        b.commit(b.frame.withColumn("v", F.col("v") * 2))
    # the loser changed nothing: current state is exactly a's commit
    assert table.current_version() == 2
    got = {r["k"]: r["v"] for r in table.df().collect()}
    assert got == {i: float(i) + 1 for i in range(10)}


def test_time_travel_reads_each_version(table):
    w = table.begin()
    w.commit(w.frame.filter(F.col("k") >= 2))
    w = table.begin()
    w.commit(w.frame.filter(F.col("k") >= 4))
    assert table.as_of(1).count() == 10
    assert table.as_of(2).count() == 8
    assert table.as_of(3).count() == 6


def test_concurrent_increments_never_lose_updates(table):
    """The lost-update litmus: N threads each add 1 to every v with
    optimistic retry. Under snapshot isolation + first-committer-wins,
    every commit lands exactly once — the final v of row k is k + N."""
    n_threads, errors = 4, []

    def bump():
        try:
            for _ in range(20):  # retry budget
                w = table.begin()
                try:
                    w.commit(w.frame.withColumn("v", F.col("v") + 1))
                    return
                except WriteConflict:
                    continue
            errors.append("retry budget exhausted")
        except Exception as exc:  # pragma: no cover
            errors.append(repr(exc))

    threads = [threading.Thread(target=bump) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert table.current_version() == 1 + n_threads
    got = {r["k"]: r["v"] for r in table.df().collect()}
    assert got == {i: float(i) + n_threads for i in range(10)}


def test_vacuum_keeps_current_readable(table):
    for _ in range(3):
        w = table.begin()
        w.commit(w.frame)
    dropped = table.vacuum(keep=2)
    assert 1 in dropped
    assert table.df().count() == 10  # current unaffected
    with pytest.raises(ValueError):
        table.as_of(1)


def test_orphaned_version_dir_is_reclaimed(table):
    """A writer that crashed between the version-dir rename and the pointer
    update leaves an unreferenced v{n+1}; the next commit must clear and
    reuse it instead of wedging every subsequent commit."""
    import os

    orphan = table._version_path(table.current_version() + 1)
    os.makedirs(os.path.join(orphan, "junk"))  # non-empty: rename would fail
    w = table.begin()
    n = w.commit(w.frame.filter(F.col("k") < 3))
    assert n == 2
    assert table.df().count() == 3
    # and the table keeps working afterwards
    w = table.begin()
    assert w.commit(w.frame) == 3
