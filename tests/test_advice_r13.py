"""ADVICE r12 regressions (fixed round 13): table-rename relocation of
enum/domain/temp metadata, DROP/RENAME COLUMN dependency upkeep,
cross-kind DROP TYPE/DOMAIN dispatch, literal-safe VALUE substitution,
and ON COMMIT DELETE ROWS autocommit parity."""

from __future__ import annotations

import tempfile

import pytest

from otterbrix_spark.catalog import Catalog
from otterbrix_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    return Engine(spark, table_dir=tempfile.mkdtemp(prefix="otx-adv13-"))


# -- RENAME TO relocates enum_uses / domain_uses / temp_tables -----------

def test_rename_table_moves_enum_uses(eng):
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'happy')")
    eng.sql("CREATE TABLE m (v mood)")
    eng.sql("ALTER TABLE m RENAME TO m2")
    assert "m" not in eng.catalog.enum_uses
    assert eng.catalog.enum_uses["m2"] == {"mood": ["v"]}
    # propagation lands on the RENAMED table, not a phantom old entry
    eng.sql("ALTER TYPE mood ADD VALUE 'ok'")
    eng.sql("INSERT INTO m2 VALUES ('ok')")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO m2 VALUES ('angry')")
    # RENAME VALUE rewrites the renamed table's stored rows
    eng.sql("ALTER TYPE mood RENAME VALUE 'ok' TO 'fine'")
    assert eng.sql("SELECT v FROM m2").collect()[0][0] == "fine"


def test_rename_table_moves_domain_uses(eng):
    eng.sql("CREATE DOMAIN posint AS INT CHECK (VALUE > 0)")
    eng.sql("CREATE TABLE d (v posint)")
    eng.sql("ALTER TABLE d RENAME TO d2")
    assert "d" not in eng.catalog.domain_uses
    assert eng.catalog.domain_uses["d2"] == {"posint": ["v"]}
    with pytest.raises(ValueError, match="depend"):
        eng.sql("DROP DOMAIN posint")
    # ALTER DOMAIN propagates to the renamed dependent
    eng.sql("ALTER DOMAIN posint ADD CONSTRAINT cap CHECK (VALUE < 100)")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO d2 VALUES (200)")


def test_rename_temp_table_stays_temp(eng, spark):
    eng.sql("CREATE TEMP TABLE scratch (a INT)")
    eng.sql("ALTER TABLE scratch RENAME TO scratch2")
    assert "scratch" not in eng.catalog.temp_tables
    assert "scratch2" in eng.catalog.temp_tables
    reopened = Catalog(spark, eng.catalog.base_dir)
    assert "scratch2" not in reopened.tables


# -- DROP / RENAME COLUMN dependency upkeep -------------------------------

def test_drop_column_clears_enum_dependency(eng):
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'happy')")
    eng.sql("CREATE TABLE m (v mood, w INT)")
    eng.sql("ALTER TABLE m DROP COLUMN v")
    assert "mood" not in eng.catalog.enum_uses.get("m", {})
    eng.sql("DROP TYPE mood")  # no phantom dependency refusal
    assert "mood" not in eng.catalog.types
    # the instantiated label CHECK died with the column
    assert not any(
        c["name"] == "v_enum"
        for c in eng.catalog.table_constraints.get("m", [])
    )
    eng.sql("INSERT INTO m VALUES (1)")


def test_drop_column_unblocks_alter_domain(eng):
    eng.sql("CREATE DOMAIN sc AS INT CHECK (VALUE >= 0)")
    eng.sql("CREATE TABLE a (v sc)")
    eng.sql("CREATE TABLE b (v sc, k INT)")
    eng.sql("ALTER TABLE b DROP COLUMN v")
    # the stale b.v entry previously made add_everywhere fail for ALL
    # dependents; now only the live a.v instantiates
    eng.sql("ALTER DOMAIN sc ADD CONSTRAINT cap CHECK (VALUE <= 10)")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO a VALUES (11)")
    eng.sql("INSERT INTO a VALUES (10)")


def test_rename_column_reanchors_domain_checks(eng):
    eng.sql("CREATE DOMAIN posint AS INT CHECK (VALUE > 0)")
    eng.sql("CREATE TABLE r (v posint)")
    eng.sql("ALTER TABLE r RENAME COLUMN v TO amount")
    assert eng.catalog.domain_uses["r"] == {"posint": ["amount"]}
    with pytest.raises(Exception):
        eng.sql("INSERT INTO r VALUES (-1)")
    eng.sql("INSERT INTO r VALUES (3)")
    # domain lifecycle still propagates through the renamed column
    eng.sql("ALTER DOMAIN posint ADD CONSTRAINT cap CHECK (VALUE < 5)")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO r VALUES (7)")


def test_rename_column_reanchors_enum_check(eng):
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'happy')")
    eng.sql("CREATE TABLE m (v mood)")
    eng.sql("ALTER TABLE m RENAME COLUMN v TO feeling")
    assert eng.catalog.enum_uses["m"] == {"mood": ["feeling"]}
    with pytest.raises(Exception):
        eng.sql("INSERT INTO m VALUES ('angry')")
    eng.sql("ALTER TYPE mood ADD VALUE 'ok'")
    eng.sql("INSERT INTO m VALUES ('ok')")


# -- cross-kind DROP TYPE / DROP DOMAIN dispatch ---------------------------

def test_drop_type_on_in_use_domain_refused(eng):
    eng.sql("CREATE DOMAIN posint AS INT CHECK (VALUE > 0)")
    eng.sql("CREATE TABLE t (v posint)")
    with pytest.raises(ValueError, match="depend"):
        eng.sql("DROP TYPE posint")  # PG: DROP TYPE works on domains
    eng.sql("DROP TABLE t")
    eng.sql("DROP TYPE posint")
    assert "posint" not in eng.catalog.types


def test_drop_domain_on_enum_refused(eng):
    eng.sql("CREATE TYPE mood AS ENUM ('sad')")
    with pytest.raises(ValueError, match="not a domain"):
        eng.sql("DROP DOMAIN mood")
    assert "mood" in eng.catalog.types


# -- literal-safe VALUE substitution ---------------------------------------

def test_domain_check_value_in_string_literal(eng):
    eng.sql("CREATE DOMAIN nv AS TEXT CHECK (VALUE <> 'value')")
    eng.sql("CREATE TABLE t (v nv)")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO t VALUES ('value')")
    # under the old \b substitution the check became v <> 'v', which
    # would wrongly refuse the literal 'v' and accept 'value'
    eng.sql("INSERT INTO t VALUES ('v')")
    assert eng.sql("SELECT v FROM t").collect()[0][0] == "v"


def test_domain_check_escaped_quote_literal(eng):
    eng.sql("CREATE DOMAIN ne AS TEXT CHECK (VALUE <> 'it''s value')")
    eng.sql("CREATE TABLE t (v ne)")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO t VALUES ('it''s value')")
    eng.sql("INSERT INTO t VALUES ('other')")


# -- ON COMMIT DELETE ROWS autocommit parity -------------------------------

def test_delete_rows_autocommit_truncates_per_statement(eng):
    eng.sql("CREATE TEMP TABLE stage (v INT) ON COMMIT DELETE ROWS")
    # outside a txn block every statement is its own transaction: the
    # implicit commit empties the table right after the INSERT (PG parity)
    eng.sql("INSERT INTO stage VALUES (1), (2)")
    assert eng.sql("SELECT COUNT(*) FROM stage").collect()[0][0] == 0
    # inside an explicit block the rows survive until COMMIT
    eng.sql("BEGIN")
    eng.sql("INSERT INTO stage VALUES (3)")
    assert eng.sql("SELECT COUNT(*) FROM stage").collect()[0][0] == 1
    eng.sql("COMMIT")
    assert eng.sql("SELECT COUNT(*) FROM stage").collect()[0][0] == 0
