"""PG enum lifecycle (x32): ALTER TYPE ADD VALUE / RENAME VALUE with
dependent-check rewriting and stored-row renames; DROP TYPE dependency
refusal for in-use enums."""

from __future__ import annotations

import tempfile

import pytest

from otterbrix_spark.catalog import Catalog
from otterbrix_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    return Engine(spark, table_dir=tempfile.mkdtemp(prefix="otx-enum-"))


def test_drop_type_refused_while_in_use(eng):
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'happy')")
    eng.sql("CREATE TABLE m (v mood)")
    with pytest.raises(ValueError, match="depend"):
        eng.sql("DROP TYPE mood")
    eng.sql("DROP TABLE m")
    eng.sql("DROP TYPE mood")
    assert "mood" not in eng.catalog.types


def test_add_value_extends_dependent_checks(eng):
    eng.sql("CREATE TYPE mood AS ENUM ('sad', 'happy')")
    eng.sql("CREATE TABLE m (v mood)")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO m VALUES ('ok')")
    eng.sql("ALTER TYPE mood ADD VALUE 'ok'")
    eng.sql("INSERT INTO m VALUES ('ok')")
    with pytest.raises(Exception):
        eng.sql("INSERT INTO m VALUES ('angry')")
    # positions + IF NOT EXISTS + duplicate refusal
    eng.sql("ALTER TYPE mood ADD VALUE 'meh' BEFORE 'happy'")
    assert eng.catalog.types["mood"]["labels"] == ["sad", "meh", "happy", "ok"]
    eng.sql("ALTER TYPE mood ADD VALUE IF NOT EXISTS 'ok'")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER TYPE mood ADD VALUE 'ok'")
    # a column added via ALTER TABLE participates too
    eng.sql("CREATE TABLE m2 (a INT)")
    eng.sql("ALTER TABLE m2 ADD COLUMN v mood")
    eng.sql("ALTER TYPE mood ADD VALUE 'wow'")
    eng.sql("INSERT INTO m2 VALUES (1, 'wow')")


def test_rename_value_rewrites_stored_rows(eng):
    eng.sql("CREATE TYPE sz AS ENUM ('s', 'm', 'l')")
    eng.sql("CREATE TABLE t (v sz)")
    eng.sql("INSERT INTO t VALUES ('s'), ('m'), ('s')")
    eng.sql("ALTER TYPE sz RENAME VALUE 's' TO 'small'")
    rows = sorted(r[0] for r in eng.sql("SELECT v FROM t").collect())
    assert rows == ["m", "small", "small"]
    with pytest.raises(Exception):
        eng.sql("INSERT INTO t VALUES ('s')")  # old label gone
    eng.sql("INSERT INTO t VALUES ('small')")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("ALTER TYPE sz RENAME VALUE 'nope' TO 'x'")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER TYPE sz RENAME VALUE 'm' TO 'l'")


def test_enum_uses_persist_across_reopen(eng):
    eng.sql("CREATE TYPE c AS ENUM ('a', 'b')")
    eng.sql("CREATE TABLE p (v c)")
    reopened = Catalog(eng.spark, eng.catalog.base_dir)
    assert reopened.enum_uses == {"p": {"c": ["v"]}}
    with pytest.raises(ValueError, match="depend"):
        reopened.route("DROP TYPE c")
