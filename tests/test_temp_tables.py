"""PG temporary tables (x29): session scoping, ON COMMIT actions,
reopen cleanup. Reference parity target: PG CREATE TEMP TABLE
semantics (parsenodes CreateStmt relpersistence='t')."""

from __future__ import annotations

import os
import tempfile

import pytest

from otterbrix_spark.catalog import Catalog
from otterbrix_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    tdir = tempfile.mkdtemp(prefix="otx-temp-")
    return Engine(spark, table_dir=tdir)


def test_temp_table_basic_and_reopen_cleanup(eng):
    eng.sql("CREATE TEMP TABLE scratch (a INT, b TEXT)")
    eng.sql("INSERT INTO scratch VALUES (1, 'x'), (2, 'y')")
    assert sorted(tuple(r) for r in eng.sql("SELECT * FROM scratch").collect()) == [
        (1, "x"), (2, "y"),
    ]
    eng.sql("CREATE TABLE perm AS SELECT 7 AS v")
    base = eng.catalog.base_dir
    reopened = Catalog(eng.spark, base)
    assert "perm" in reopened.tables
    assert "scratch" not in reopened.tables
    assert not os.path.isdir(os.path.join(base, "scratch"))
    assert reopened.temp_tables == {}


def test_temp_spellings_accepted(eng):
    eng.sql("CREATE TEMPORARY TABLE t1 (a INT)")
    eng.sql("CREATE GLOBAL TEMP TABLE t2 (a INT)")
    eng.sql("CREATE LOCAL TEMPORARY TABLE t3 (a INT)")
    assert {"t1", "t2", "t3"} <= set(eng.catalog.temp_tables)


def test_on_commit_delete_rows_fires_every_commit(eng):
    eng.sql("CREATE TEMP TABLE stage (v INT) ON COMMIT DELETE ROWS")
    for batch in ((1, 2), (3,)):
        eng.sql("BEGIN")
        eng.sql(
            "INSERT INTO stage VALUES "
            + ", ".join(f"({v})" for v in batch)
        )
        assert eng.sql("SELECT COUNT(*) FROM stage").collect()[0][0] == len(batch)
        eng.sql("COMMIT")
        # PG: the truncate fires AT COMMIT, after the txn's writes land
        assert eng.sql("SELECT COUNT(*) FROM stage").collect()[0][0] == 0


def test_on_commit_drop_in_txn(eng):
    eng.sql("BEGIN")
    eng.sql("CREATE TEMP TABLE eph (q INT) ON COMMIT DROP")
    eng.sql("INSERT INTO eph VALUES (5)")
    assert eng.sql("SELECT * FROM eph").collect()[0][0] == 5
    eng.sql("COMMIT")
    assert "eph" not in eng.catalog.tables


def test_on_commit_drop_outside_txn_is_immediate(eng):
    # PG: outside a txn block the implicit commit fires immediately,
    # so the table is created and dropped within the one statement
    eng.sql("CREATE TEMP TABLE flash (z INT) ON COMMIT DROP")
    assert "flash" not in eng.catalog.tables


def test_on_commit_drop_rolled_back_never_fires(eng):
    eng.sql("BEGIN")
    eng.sql("CREATE TEMP TABLE eph2 (q INT) ON COMMIT DROP")
    eng.sql("ROLLBACK")
    assert "eph2" not in eng.catalog.tables
    assert eng.catalog._txn_temp_drop == []
    # a later unrelated commit must not try to drop anything
    eng.sql("BEGIN")
    eng.sql("COMMIT")


def test_drop_temp_table_clears_marker(eng):
    eng.sql("CREATE TEMP TABLE gone (a INT)")
    assert "gone" in eng.catalog.temp_tables
    eng.sql("DROP TABLE gone")
    assert "gone" not in eng.catalog.temp_tables


def test_temp_metadata_purged_on_reopen(eng):
    eng.sql(
        "CREATE TEMP TABLE tmeta (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "v INT CHECK (v > 0))"
    )
    eng.sql("INSERT INTO tmeta (v) VALUES (1)")
    base = eng.catalog.base_dir
    reopened = Catalog(eng.spark, base)
    assert "tmeta" not in reopened.tables
    assert "tmeta" not in reopened.table_constraints
    assert "tmeta" not in reopened.identity_cols


def test_temp_table_nextval_default_stays_per_row(eng):
    """A nextval DEFAULT inside CREATE TEMP TABLE must stay a stored
    expression (per-row at INSERT), not be eagerly folded to one
    statement-level constant by the nextval substitution pass."""
    eng.sql("CREATE SEQUENCE tseq START 10")
    eng.sql("CREATE TEMP TABLE tn (id INT DEFAULT nextval('tseq'), v INT)")
    eng.sql("INSERT INTO tn (v) VALUES (1)")
    eng.sql("INSERT INTO tn (v) VALUES (2)")
    ids = sorted(r[0] for r in eng.sql("SELECT id FROM tn").collect())
    assert ids == [10, 11], ids
