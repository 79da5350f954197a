"""Constraint DDL through the SQL surface (reference
integration/cpp/test/test_correctness_bugs.cpp:410-560 — CHECK and FK with
autocommit-abort semantics; test_large_aggregate_dml.cpp:211-260 — ON DELETE
CASCADE with >1024 children)."""

from __future__ import annotations

import pytest

from otterbrix_spark.engine import Engine
from otterbrix_spark.operators.dml import ConstraintViolation


@pytest.fixture()
def engine(spark, tmp_path, sf_dir):
    eng = Engine(spark, table_dir=str(tmp_path))
    eng.register_corpus(sf_dir)
    return eng


def test_check_violation_autocommit_no_linger(engine):
    # mirrors test_correctness_bugs.cpp:410-476 (check_violation_autocommit)
    engine.sql("CREATE TABLE acc (id bigint, age bigint)")
    engine.sql("ALTER TABLE acc ADD CONSTRAINT chk_age CHECK (age > 0)")
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO acc VALUES (1, -5)")
    # the bad row must be absent (statement aborted, state unchanged)
    assert engine.sql("SELECT COUNT(id) AS c FROM acc").collect()[0][0] == 0
    # a valid re-insert of the same id succeeds and yields exactly one row
    engine.sql("INSERT INTO acc VALUES (1, 42)")
    assert engine.sql("SELECT COUNT(id) AS c FROM acc").collect()[0][0] == 1
    engine.sql("DROP TABLE acc")


def test_check_violation_on_update(engine):
    engine.sql("CREATE TABLE acc2 (id bigint, age bigint)")
    engine.sql("ALTER TABLE acc2 ADD CONSTRAINT chk CHECK (age > 0)")
    engine.sql("INSERT INTO acc2 VALUES (1, 10)")
    with pytest.raises(ConstraintViolation):
        engine.sql("UPDATE acc2 SET age = -1 WHERE id = 1")
    assert engine.sql("SELECT age FROM acc2").collect()[0][0] == 10
    engine.sql("UPDATE acc2 SET age = 20 WHERE id = 1")
    assert engine.sql("SELECT age FROM acc2").collect()[0][0] == 20
    engine.sql("DROP TABLE acc2")


def test_add_constraint_validates_existing_rows(engine):
    engine.sql("CREATE TABLE pre (id bigint)")
    engine.sql("INSERT INTO pre VALUES (-3)")
    with pytest.raises(ConstraintViolation):
        engine.sql("ALTER TABLE pre ADD CONSTRAINT pos CHECK (id > 0)")
    # rejected DDL must not leave the constraint behind
    engine.sql("INSERT INTO pre VALUES (-4)")
    assert engine.sql("SELECT COUNT(*) AS c FROM pre").collect()[0][0] == 2
    engine.sql("DROP TABLE pre")


def test_fk_violation_autocommit_no_linger(engine):
    # mirrors test_correctness_bugs.cpp:478-560 (fk_violation_autocommit)
    engine.sql("CREATE TABLE parent (id bigint, name text)")
    engine.sql("CREATE TABLE child (id bigint, parent_id bigint)")
    engine.sql(
        "ALTER TABLE child ADD CONSTRAINT fk_p "
        "FOREIGN KEY (parent_id) REFERENCES parent (id)"
    )
    engine.sql("INSERT INTO parent VALUES (1, 'p1')")
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO child VALUES (7, 99)")
    assert engine.sql("SELECT COUNT(*) AS c FROM child").collect()[0][0] == 0
    engine.sql("INSERT INTO child VALUES (7, 1)")
    assert engine.sql("SELECT COUNT(*) AS c FROM child").collect()[0][0] == 1
    # restrict: deleting a referenced parent is rejected
    with pytest.raises(ConstraintViolation):
        engine.sql("DELETE FROM parent WHERE id = 1")
    assert engine.sql("SELECT COUNT(*) AS c FROM parent").collect()[0][0] == 1
    engine.sql("DROP TABLE child")
    engine.sql("DROP TABLE parent")


def test_fk_on_delete_cascade(engine):
    # mirrors test_large_aggregate_dml.cpp:211-260 (cascade ordering)
    engine.sql("CREATE TABLE p2 (id bigint, name text)")
    engine.sql("CREATE TABLE c2 (id bigint, parent_id bigint)")
    engine.sql(
        "ALTER TABLE c2 ADD CONSTRAINT fk_c "
        "FOREIGN KEY (parent_id) REFERENCES p2 (id) ON DELETE CASCADE"
    )
    engine.sql("INSERT INTO p2 VALUES (1, 'keep'), (2, 'doomed')")
    engine.sql("INSERT INTO c2 VALUES (10, 1), (20, 2), (21, 2), (22, NULL)")
    engine.sql("DELETE FROM p2 WHERE id = 2")
    rows = sorted(r["id"] for r in engine.sql("SELECT id FROM c2").collect())
    assert rows == [10, 22]  # children of doomed parent gone; NULL fk survives
    assert engine.sql("SELECT COUNT(*) AS c FROM p2").collect()[0][0] == 1
    engine.sql("DROP TABLE c2")
    engine.sql("DROP TABLE p2")


def test_constraints_in_create_table(engine):
    engine.sql(
        "CREATE TABLE typed_con ("
        " id bigint PRIMARY KEY,"
        " age bigint NOT NULL CHECK (age >= 0),"
        " CONSTRAINT big_age CHECK (age < 200))"
    )
    engine.sql("INSERT INTO typed_con VALUES (1, 30)")
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO typed_con VALUES (2, -1)")  # column CHECK
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO typed_con VALUES (3, 500)")  # table CHECK
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO typed_con VALUES (4, NULL)")  # NOT NULL
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO typed_con VALUES (1, 40)")  # PK duplicate
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO typed_con VALUES (NULL, 50)")  # PK null
    assert engine.sql("SELECT COUNT(*) AS c FROM typed_con").collect()[0][0] == 1
    engine.sql("DROP TABLE typed_con")


def test_fk_in_create_table_with_cascade(engine):
    engine.sql("CREATE TABLE p3 (id bigint)")
    engine.sql(
        "CREATE TABLE c3 (id bigint, pid bigint,"
        " CONSTRAINT fkx FOREIGN KEY (pid) REFERENCES p3 (id) ON DELETE CASCADE)"
    )
    engine.sql("INSERT INTO p3 VALUES (1), (2)")
    engine.sql("INSERT INTO c3 VALUES (100, 1), (200, 2)")
    engine.sql("DELETE FROM p3 WHERE id = 1")
    assert [r["id"] for r in engine.sql("SELECT id FROM c3").collect()] == [200]
    engine.sql("DROP TABLE c3")
    engine.sql("DROP TABLE p3")


def test_unique_constraint_update_collision(engine):
    engine.sql("CREATE TABLE uniq (id bigint UNIQUE, v bigint)")
    engine.sql("INSERT INTO uniq VALUES (1, 10), (2, 20)")
    with pytest.raises(ConstraintViolation):
        engine.sql("UPDATE uniq SET id = 1 WHERE id = 2")
    # non-colliding update (key unchanged) passes
    engine.sql("UPDATE uniq SET v = 25 WHERE id = 2")
    got = dict((r["id"], r["v"]) for r in engine.sql("SELECT * FROM uniq").collect())
    assert got == {1: 10, 2: 25}
    engine.sql("DROP TABLE uniq")


def test_constraints_inside_transaction(engine):
    engine.sql("CREATE TABLE tacc (id bigint, age bigint)")
    engine.sql("ALTER TABLE tacc ADD CONSTRAINT chk CHECK (age > 0)")
    engine.sql("BEGIN")
    engine.sql("INSERT INTO tacc VALUES (1, 5)")
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO tacc VALUES (2, -5)")
    engine.sql("COMMIT")
    assert engine.sql("SELECT COUNT(*) AS c FROM tacc").collect()[0][0] == 1
    engine.sql("DROP TABLE tacc")


def test_cascade_inside_transaction_rollback(engine):
    engine.sql("CREATE TABLE tp (id bigint)")
    engine.sql(
        "CREATE TABLE tc (id bigint, pid bigint,"
        " CONSTRAINT tfk FOREIGN KEY (pid) REFERENCES tp (id) ON DELETE CASCADE)"
    )
    engine.sql("INSERT INTO tp VALUES (1), (2)")
    engine.sql("INSERT INTO tc VALUES (10, 1), (20, 2)")
    engine.sql("BEGIN")
    engine.sql("DELETE FROM tp WHERE id = 2")
    # read-your-writes: cascade visible inside the txn
    assert engine.sql("SELECT COUNT(*) AS c FROM tc").collect()[0][0] == 1
    engine.sql("ROLLBACK")
    assert engine.sql("SELECT COUNT(*) AS c FROM tc").collect()[0][0] == 2
    assert engine.sql("SELECT COUNT(*) AS c FROM tp").collect()[0][0] == 2
    engine.sql("DROP TABLE tc")
    engine.sql("DROP TABLE tp")


def test_drop_constraint(engine):
    engine.sql("CREATE TABLE dcon (id bigint)")
    engine.sql("ALTER TABLE dcon ADD CONSTRAINT pos CHECK (id > 0)")
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO dcon VALUES (-1)")
    engine.sql("ALTER TABLE dcon DROP CONSTRAINT pos")
    engine.sql("INSERT INTO dcon VALUES (-1)")
    assert engine.sql("SELECT COUNT(*) AS c FROM dcon").collect()[0][0] == 1
    engine.sql("DROP TABLE dcon")


# -- dotted database.table names (reference dispatcher scoping: every -------
# -- collection is addressed as database.collection, e.g. t.acc) ------------


def test_dotted_names_check_constraint_flow(engine):
    # the exact reference flow from test_correctness_bugs.cpp:410-476
    engine.sql("CREATE DATABASE t")
    engine.sql("CREATE TABLE t.acc (id bigint, age bigint)")
    engine.sql("ALTER TABLE t.acc ADD CONSTRAINT chk_age CHECK (age > 0)")
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO t.acc (id, age) VALUES (1, -5)")
    assert engine.sql("SELECT COUNT(id) AS c FROM t.acc").collect()[0][0] == 0
    engine.sql("INSERT INTO t.acc (id, age) VALUES (1, 42)")
    assert engine.sql("SELECT COUNT(id) AS c FROM t.acc").collect()[0][0] == 1
    assert engine.sql("SELECT id FROM t.acc WHERE id = 1").collect()[0][0] == 1
    engine.sql("DROP TABLE t.acc")


def test_dotted_names_fk_cascade_flow(engine):
    # mirrors test_large_aggregate_dml.cpp:211-260 (AggDb.parent/child)
    engine.sql("CREATE DATABASE AggDb")
    engine.sql("CREATE TABLE AggDb.parent (id bigint, name text)")
    engine.sql("CREATE TABLE AggDb.child (id bigint, parent_id bigint)")
    engine.sql(
        "ALTER TABLE AggDb.child ADD CONSTRAINT fk_c "
        "FOREIGN KEY (parent_id) REFERENCES AggDb.parent (id) ON DELETE CASCADE"
    )
    engine.sql("INSERT INTO AggDb.parent VALUES (1, 'p'), (2, 'q')")
    engine.sql("INSERT INTO AggDb.child VALUES (10, 1), (20, 2), (21, 2)")
    engine.sql("DELETE FROM AggDb.parent WHERE id = 2")
    assert engine.sql("SELECT COUNT(*) AS c FROM AggDb.child").collect()[0][0] == 1
    engine.sql("DROP TABLE AggDb.child")
    engine.sql("DROP TABLE AggDb.parent")


def test_dotted_names_join_and_sequence(engine):
    engine.sql("CREATE DATABASE ddb")
    engine.sql("CREATE SEQUENCE ddb.ids START 5")
    engine.sql("CREATE TABLE ddb.a AS SELECT n_nationkey, n_name FROM nation")
    engine.sql("CREATE TABLE ddb.b AS SELECT n_nationkey, n_regionkey FROM nation")
    got = engine.sql(
        "SELECT COUNT(*) AS c FROM ddb.a JOIN ddb.b "
        "ON ddb.a.n_nationkey = ddb.b.n_nationkey"
    ).collect()[0][0]
    assert got == 25
    assert engine.sql("SELECT nextval('ddb.ids') AS v").collect()[0][0] == 5
    assert engine.sql("SELECT currval('ddb.ids') AS v").collect()[0][0] == 5
    engine.sql("DROP TABLE ddb.a")
    engine.sql("DROP TABLE ddb.b")
    engine.sql("DROP SEQUENCE ddb.ids")


def test_named_unique_and_pk_constraints(engine):
    """CONSTRAINT name UNIQUE (cols) / PRIMARY KEY (cols) — the NAMED
    table-level forms (previously only the anonymous forms parsed);
    a named PK also imposes per-column NOT NULL, inline and via
    ALTER TABLE ADD CONSTRAINT."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS nuq")
    eng.sql("CREATE TABLE nuq (k bigint, v bigint, "
            "CONSTRAINT nuq_k_key UNIQUE (k))")
    eng.sql("INSERT INTO nuq VALUES (1, 10)")
    with _pytest.raises(Exception):
        eng.sql("INSERT INTO nuq VALUES (1, 11)")  # duplicate arbiter key
    # the named arbiter supports ON CONFLICT (PG requires a real index)
    eng.sql("INSERT INTO nuq VALUES (1, 12) ON CONFLICT (k) DO NOTHING")
    assert eng.sql("SELECT v FROM nuq WHERE k = 1").collect()[0].v == 10
    eng.sql("DROP TABLE IF EXISTS npk")
    eng.sql("CREATE TABLE npk (k bigint, "
            "CONSTRAINT npk_pkey PRIMARY KEY (k))")
    with _pytest.raises(Exception):
        eng.sql("INSERT INTO npk VALUES (NULL)")  # PK implies NOT NULL
    eng.sql("DROP TABLE IF EXISTS apk")
    eng.sql("CREATE TABLE apk (k bigint)")
    eng.sql("ALTER TABLE apk ADD CONSTRAINT apk_pkey PRIMARY KEY (k)")
    with _pytest.raises(Exception):
        eng.sql("INSERT INTO apk VALUES (NULL)")
