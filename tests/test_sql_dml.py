"""SQL-statement DML/DDL routing tests — entry point A's full statement
surface: CREATE TABLE AS / INSERT / UPDATE / DELETE (with RETURNING) routed
through the managed-table catalog, mirroring reference
`integration/cpp/test/test_sql_features.cpp` DML cases."""

from __future__ import annotations

import pytest

from otterbrix_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path, sf_dir):
    eng = Engine(spark, table_dir=str(tmp_path))
    eng.register_corpus(sf_dir)
    return eng


def test_create_table_as_select(engine):
    engine.execute_sql(
        "CREATE TABLE rich AS SELECT c_custkey, c_name, c_acctbal "
        "FROM customer WHERE c_acctbal > 9000"
    )
    n = engine.execute_sql("SELECT COUNT(*) AS n FROM rich").value("n", 0)
    assert n > 0


def test_insert_values_sql(engine):
    engine.execute_sql("CREATE TABLE t1 AS SELECT 1 AS id, 'a' AS name")
    engine.execute_sql("INSERT INTO t1 VALUES (2, 'b'), (3, 'c')")
    rows = sorted(engine.execute_sql("SELECT * FROM t1").fetchall())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_insert_from_select_sql(engine):
    engine.execute_sql(
        "CREATE TABLE nk AS SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 3"
    )
    engine.execute_sql(
        "INSERT INTO nk SELECT n_nationkey AS k FROM nation WHERE n_nationkey >= 22"
    )
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM nk").value("n", 0) == 6


def test_update_where_returning(engine):
    engine.execute_sql("CREATE TABLE emp AS SELECT 1 AS id, 100 AS salary")
    engine.execute_sql("INSERT INTO emp VALUES (2, 200)")
    cur = engine.execute_sql(
        "UPDATE emp SET salary = salary * 2 WHERE id = 2 RETURNING *"
    )
    assert cur.fetchall() == [(2, 400)]
    rows = dict(engine.execute_sql("SELECT * FROM emp").fetchall())
    assert rows == {1: 100, 2: 400}


def test_update_multiple_set_exprs(engine):
    engine.execute_sql("CREATE TABLE m AS SELECT 1 AS id, 10 AS a, 'x' AS b")
    engine.execute_sql("UPDATE m SET a = a + 5, b = upper(b)")
    assert engine.execute_sql("SELECT a, b FROM m").fetchall() == [(15, "X")]


def test_delete_where_returning(engine):
    engine.execute_sql("CREATE TABLE d AS SELECT 1 AS id UNION ALL SELECT 2 UNION ALL SELECT 3")
    cur = engine.execute_sql("DELETE FROM d WHERE id >= 2 RETURNING *")
    assert sorted(r[0] for r in cur.fetchall()) == [2, 3]
    assert engine.execute_sql("SELECT * FROM d").fetchall() == [(1,)]


def test_drop_table(engine):
    engine.execute_sql("CREATE TABLE gone AS SELECT 1 AS v")
    engine.execute_sql("DROP TABLE gone")
    with pytest.raises(Exception):
        engine.execute_sql("SELECT * FROM gone").fetchall()


def test_select_still_native(engine):
    assert engine.execute_sql("SELECT 1 + 1 AS v").fetchall() == [(2,)]


def test_set_timezone(engine):
    engine.execute_sql("SET TIME ZONE 'America/New_York'")
    assert engine.spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    engine.execute_sql("SET TIME ZONE 'UTC'")
    assert engine.spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_txn_noops_and_index_accept(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql("CREATE TABLE tx AS SELECT 1 AS v")
    engine.execute_sql("CREATE INDEX idx_tx ON tx (v)")
    engine.execute_sql("COMMIT")
    assert engine.execute_sql("SELECT * FROM tx").fetchall() == [(1,)]
    engine.execute_sql("DROP INDEX idx_tx")


def test_alter_table_add_rename_drop(engine):
    engine.execute_sql("CREATE TABLE alt AS SELECT 1 AS id, 'x' AS name")
    engine.execute_sql("ALTER TABLE alt ADD COLUMN score double")
    assert engine.execute_sql("SELECT id, name, score FROM alt").fetchall() == [(1, "x", None)]
    engine.execute_sql("UPDATE alt SET score = 9.5")
    engine.execute_sql("ALTER TABLE alt RENAME COLUMN score TO rating")
    assert engine.execute_sql("SELECT rating FROM alt").fetchall() == [(9.5,)]
    engine.execute_sql("ALTER TABLE alt DROP COLUMN name")
    assert engine.execute_sql("SELECT * FROM alt").columns == ["id", "rating"]


def test_vacuum_checkpoint_noops(engine):
    engine.execute_sql("VACUUM")
    engine.execute_sql("CHECKPOINT")


def test_multi_statement_batch(engine):
    cur = engine.execute_sql(
        "CREATE TABLE batch1 AS SELECT 1 AS v; "
        "INSERT INTO batch1 VALUES (2), (3); "
        "SELECT COUNT(*) AS n FROM batch1"
    )
    assert cur.value("n", 0) == 3


def test_semicolon_inside_literal_not_split(engine):
    cur = engine.execute_sql("SELECT 'a;b' AS s")
    assert cur.fetchall() == [("a;b",)]


# -- round-2 router fixes (ADVICE r01) ---------------------------------------


def test_parameterised_dml_routes_to_managed_table(engine):
    engine.sql("CREATE TABLE pt AS SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, tag)")
    engine.sql("DELETE FROM pt WHERE id = $1", 2)
    assert sorted(r["id"] for r in engine.sql("SELECT * FROM pt").collect()) == [1, 3]
    engine.sql("UPDATE pt SET tag = $1 WHERE id = $2", "z", 3)
    got = {r["id"]: r["tag"] for r in engine.sql("SELECT * FROM pt").collect()}
    assert got == {1: "a", 3: "z"}


def test_parameterised_string_literal_escaping(engine):
    engine.sql("CREATE TABLE esc AS SELECT * FROM (VALUES (1, 'x')) AS t(id, tag)")
    engine.sql("UPDATE esc SET tag = $1 WHERE id = $2", "it's", 1)
    assert engine.sql("SELECT tag FROM esc").collect()[0][0] == "it's"


def test_insert_with_column_list_reorders(engine):
    engine.sql("CREATE TABLE cl AS SELECT * FROM (VALUES (1, 'a', 10)) AS t(id, tag, val)")
    engine.sql("INSERT INTO cl (val, id) VALUES (20, 2)")
    rows = {r["id"]: (r["tag"], r["val"]) for r in engine.sql("SELECT * FROM cl").collect()}
    assert rows == {1: ("a", 10), 2: (None, 20)}  # tag NULL-backfilled


def test_insert_with_column_list_from_select(engine):
    engine.sql("CREATE TABLE cls AS SELECT * FROM (VALUES (1, 'a', 10)) AS t(id, tag, val)")
    engine.sql("INSERT INTO cls (id, tag) SELECT id + 100, tag FROM cls")
    rows = {r["id"]: (r["tag"], r["val"]) for r in engine.sql("SELECT * FROM cls").collect()}
    assert rows == {1: ("a", 10), 101: ("a", None)}


def test_semicolon_inside_comments_not_split(engine):
    df = engine.sql(
        "SELECT 1 AS a -- trailing; comment\n"
        "/* block; with ; semicolons */ , 2 AS b"
    )
    assert [tuple(r) for r in df.collect()] == [(1, 2)]


def test_multi_statement_with_comments(engine):
    engine.sql(
        "CREATE TABLE mc AS SELECT 1 AS x; -- make it; \n"
        "INSERT INTO mc VALUES (2); /* and; another */"
    )
    assert sorted(r["x"] for r in engine.sql("SELECT * FROM mc").collect()) == [1, 2]


def test_escaped_quote_in_literal_not_split(engine):
    df = engine.sql("SELECT 'a;b''c;d' AS s")
    assert df.collect()[0][0] == "a;b'c;d"


def test_create_view_and_query(engine):
    engine.sql("CREATE OR REPLACE VIEW v_two AS SELECT 1 AS a UNION ALL SELECT 2")
    assert sorted(r["a"] for r in engine.sql("SELECT * FROM v_two").collect()) == [1, 2]
    engine.sql("DROP VIEW v_two")


def test_materialized_view_snapshot_and_refresh(engine):
    engine.sql("CREATE TABLE mvsrc AS SELECT * FROM (VALUES (1), (2)) AS t(x)")
    engine.sql("CREATE MATERIALIZED VIEW mv_sum AS SELECT CAST(SUM(x) AS BIGINT) AS s FROM mvsrc")
    assert engine.sql("SELECT s FROM mv_sum").collect()[0][0] == 3
    # matview is a snapshot: base-table change not visible until REFRESH
    engine.sql("INSERT INTO mvsrc VALUES (10)")
    assert engine.sql("SELECT s FROM mv_sum").collect()[0][0] == 3
    engine.sql("REFRESH MATERIALIZED VIEW mv_sum")
    assert engine.sql("SELECT s FROM mv_sum").collect()[0][0] == 13
    engine.sql("DROP MATERIALIZED VIEW mv_sum")


def test_refresh_unknown_matview_raises(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown materialized view"):
        engine.sql("REFRESH MATERIALIZED VIEW nope")


# -- multi-statement transactions (round 2) ----------------------------------


def test_txn_commit_multi_table(engine):
    engine.sql("CREATE TABLE ta AS SELECT * FROM (VALUES (1, 10), (2, 20)) AS t(id, v)")
    engine.sql("CREATE TABLE tb AS SELECT * FROM (VALUES (1, 'x'), (2, 'y')) AS t(id, s)")
    engine.sql("BEGIN")
    engine.sql("UPDATE ta SET v = v + 1 WHERE id = 1")
    engine.sql("DELETE FROM tb WHERE id = 2")
    # read-your-writes inside the transaction
    assert {tuple(r) for r in engine.sql("SELECT * FROM ta").collect()} == {(1, 11), (2, 20)}
    assert [tuple(r) for r in engine.sql("SELECT * FROM tb").collect()] == [(1, "x")]
    engine.sql("COMMIT")
    assert {tuple(r) for r in engine.sql("SELECT * FROM ta").collect()} == {(1, 11), (2, 20)}
    assert [tuple(r) for r in engine.sql("SELECT * FROM tb").collect()] == [(1, "x")]


def test_txn_rollback_restores_state(engine):
    engine.sql("CREATE TABLE tr AS SELECT * FROM (VALUES (1), (2), (3)) AS t(x)")
    engine.sql("BEGIN")
    engine.sql("DELETE FROM tr WHERE x > 1")
    assert engine.sql("SELECT COUNT(*) AS n FROM tr").collect()[0][0] == 1
    engine.sql("ROLLBACK")
    assert engine.sql("SELECT COUNT(*) AS n FROM tr").collect()[0][0] == 3


def test_txn_chained_statements_compose(engine):
    engine.sql("CREATE TABLE tc AS SELECT * FROM (VALUES (1, 100)) AS t(id, v)")
    engine.sql("BEGIN")
    engine.sql("INSERT INTO tc VALUES (2, 200)")
    engine.sql("UPDATE tc SET v = v * 2")       # sees the inserted row -> 200/400
    engine.sql("DELETE FROM tc WHERE v = 200")  # deletes the original row
    engine.sql("COMMIT")
    got = {r["id"]: r["v"] for r in engine.sql("SELECT * FROM tc").collect()}
    assert got == {2: 400}


def test_txn_batch_script_with_commit(engine):
    engine.sql("CREATE TABLE ts2 AS SELECT * FROM (VALUES (5)) AS t(x)")
    engine.sql(
        "BEGIN; INSERT INTO ts2 VALUES (6); UPDATE ts2 SET x = x + 1; COMMIT"
    )
    assert sorted(r["x"] for r in engine.sql("SELECT * FROM ts2").collect()) == [6, 7]


def test_dollar_quoted_strings_not_split():
    from otterbrix_spark.engine import _split_statements

    got = _split_statements("SELECT $$a;b$$ AS x; SELECT $tag$c;d$tag$ AS y")
    assert got == ["SELECT $$a;b$$ AS x", "SELECT $tag$c;d$tag$ AS y"]
    # unterminated dollar quote swallows to end (no bogus split)
    assert _split_statements("SELECT $q$oops; no close") == [
        "SELECT $q$oops; no close"
    ]


# -- PG array syntax (reference test_list_array.cpp) --------------------------


def test_array_literals_and_one_based_subscript(engine):
    engine.sql(
        "CREATE TABLE arr AS SELECT * FROM "
        "(VALUES (1, ARRAY[10, 20, 30]), (2, ARRAY[40, 50, 60])) AS t(id, v)"
    )
    rows = dict(engine.sql("SELECT id, v[1] FROM arr").collect())
    assert rows == {1: 10, 2: 40}  # 1-based, as in PG
    assert dict(engine.sql("SELECT id, v[3] FROM arr").collect()) == {1: 30, 2: 60}


def test_array_element_update(engine):
    engine.sql(
        "CREATE TABLE arru AS SELECT * FROM (VALUES (1, ARRAY[10, 20, 30])) AS t(id, v)"
    )
    engine.sql("UPDATE arru SET v[1] = 99 WHERE id = 1")
    assert engine.sql("SELECT v FROM arru").collect()[0][0] == [99, 20, 30]


def test_array_update_expression_uses_old_element(engine):
    engine.sql(
        "CREATE TABLE arre AS SELECT * FROM (VALUES (1, ARRAY[5, 6])) AS t(id, v)"
    )
    engine.sql("UPDATE arre SET v[2] = v[1] + 100")
    assert engine.sql("SELECT v FROM arre").collect()[0][0] == [5, 105]


def test_typed_create_table_and_insert(engine):
    # reference test_list_array.cpp: typed empty table + ARRAY inserts
    engine.sql("CREATE DATABASE TestDatabase")
    engine.sql("CREATE TABLE tarr (id bigint, v int[3])")
    assert engine.sql("SELECT * FROM tarr").collect() == []
    engine.sql("INSERT INTO tarr VALUES (1, ARRAY[10, 20, 30])")
    engine.sql("INSERT INTO tarr VALUES (2, ARRAY[40, 50, 60])")
    rows = {r["id"]: r["v"] for r in engine.sql("SELECT * FROM tarr").collect()}
    assert rows == {1: [10, 20, 30], 2: [40, 50, 60]}
    assert dict(engine.sql("SELECT id, v[2] FROM tarr").collect()) == {1: 20, 2: 50}
    # schema is the declared one (int array, bigint id)
    dt = dict(engine.sql("SELECT * FROM tarr").dtypes)
    assert dt == {"id": "bigint", "v": "array<int>"}


def test_typed_create_table_scalar_types(engine):
    engine.sql(
        "CREATE TABLE tt (a int, b varchar(10), c double precision, "
        "d decimal(10,2), e timestamp, f bytea)"
    )
    dt = dict(engine.sql("SELECT * FROM tt").dtypes)
    assert dt == {
        "a": "int", "b": "string", "c": "double",
        "d": "decimal(10,2)", "e": "timestamp_ntz", "f": "binary",
    }


def test_dynamic_table_schema_on_write_via_sql(engine):
    # reference JSONBench flow: CREATE TABLE t (); insert batches whose
    # columns differ; reads resolve the union schema with NULL fill
    engine.sql("CREATE TABLE dynt ()")
    assert engine.sql("SELECT * FROM dynt").collect() == []
    engine.sql("INSERT INTO dynt (did, kind) VALUES (1, 'post')")
    engine.sql("INSERT INTO dynt (did, likes) VALUES (2, 7)")
    rows = {r["did"]: (r["kind"], r["likes"]) for r in engine.sql("SELECT * FROM dynt").collect()}
    assert rows == {1: ("post", None), 2: (None, 7)}
    engine.sql("DROP TABLE dynt")


# -- sequences through SQL (reference operator_sequence.cpp) ------------------


def test_sequence_create_nextval_currval(engine):
    engine.sql("CREATE SEQUENCE seq1 START 100")
    assert engine.sql("SELECT nextval('seq1') AS v").collect()[0][0] == 100
    assert engine.sql("SELECT nextval('seq1') AS v").collect()[0][0] == 101
    assert engine.sql("SELECT currval('seq1') AS v").collect()[0][0] == 101
    engine.sql("DROP SEQUENCE seq1")


def test_sequence_in_insert(engine):
    engine.sql("CREATE SEQUENCE ids")
    engine.sql("CREATE TABLE seqt AS SELECT CAST(0 AS BIGINT) AS id, 'seed' AS tag")
    engine.sql("INSERT INTO seqt VALUES (nextval('ids'), 'a')")
    engine.sql("INSERT INTO seqt VALUES (nextval('ids'), 'b')")
    rows = {r["tag"]: r["id"] for r in engine.sql("SELECT * FROM seqt").collect()}
    assert rows == {"seed": 0, "a": 1, "b": 2}


def test_unknown_sequence_raises(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown sequence"):
        engine.sql("SELECT nextval('nope')")


def test_currval_before_nextval_raises(engine):
    engine.sql("CREATE SEQUENCE fresh START 100")
    with pytest.raises(ValueError, match="not yet defined"):
        engine.sql("SELECT currval('fresh')")
    engine.sql("DROP SEQUENCE fresh")


# -- parameter binding edge cases ---------------------------------------------


def test_param_with_trailing_backslash(engine):
    row = engine.sql("SELECT $1 AS v", "path\\").collect()[0]
    assert row["v"] == "path\\"


def test_param_nonfinite_floats(engine):
    import math

    row = engine.sql("SELECT $1 AS a, $2 AS b, $3 AS c",
                     float("nan"), float("inf"), float("-inf")).collect()[0]
    assert math.isnan(row["a"]) and row["b"] == float("inf") and row["c"] == float("-inf")


def test_txn_insert_coerces_to_declared_schema(engine):
    engine.sql("CREATE TABLE coercet (id INT, v INT)")
    engine.sql("BEGIN")
    engine.sql("INSERT INTO coercet VALUES (1, 2.9)")
    engine.sql("COMMIT")
    df = engine.sql("SELECT * FROM coercet")
    assert dict(df.dtypes)["v"] == "int"
    assert df.collect()[0]["v"] == 2
    engine.sql("DROP TABLE coercet")


# -- CREATE TYPE: enum + composite (reference transformer.cpp:75-80, ---------
# -- test_collection_sql.cpp:660-740, test_correctness_bugs.cpp:337-392) -----


def test_create_type_enum_round_trip(engine):
    from otterbrix_spark.operators.dml import ConstraintViolation

    engine.sql("CREATE TYPE oddness_t AS ENUM('even','odd')")
    engine.sql("CREATE TABLE te (n INT, kind oddness_t)")
    engine.sql(
        "INSERT INTO te VALUES (1,'odd'),(2,'even'),(3,'odd'),(4,'even')"
    )
    got = engine.sql("SELECT n FROM te WHERE kind = 'even'").collect()
    assert sorted(r["n"] for r in got) == [2, 4]
    # a non-label value must be rejected (enum CHECK), state unchanged
    with pytest.raises(ConstraintViolation):
        engine.sql("INSERT INTO te VALUES (5, 'invalid_xyz')")
    assert engine.sql("SELECT COUNT(*) AS c FROM te").collect()[0][0] == 4
    engine.sql("DROP TABLE te")
    engine.sql("DROP TYPE oddness_t")


def test_create_type_composite_nested(engine):
    engine.sql("CREATE TYPE custom_type_field AS (f1 float, f2 int)")
    engine.sql(
        "CREATE TYPE custom_type_name AS (f1 int, f2 string, f3 custom_type_field)"
    )
    engine.sql("CREATE TABLE tc (custom_type custom_type_name, oddness string)")
    engine.sql(
        "INSERT INTO tc VALUES (ROW(1, 'text_1', ROW(1.5, 2)), 'odd'),"
        " (ROW(2, 'text_2', ROW(2.5, 4)), 'even')"
    )
    rows = engine.sql(
        "SELECT custom_type.f1 AS f1, custom_type.f3.f2 AS inner_f2 FROM tc"
    ).collect()
    assert sorted((r["f1"], r["inner_f2"]) for r in rows) == [(1, 2), (2, 4)]
    # struct round-trips through INSERT ... SELECT (reference copy test)
    engine.sql("CREATE TABLE tc2 (custom_type custom_type_name, oddness string)")
    engine.sql("INSERT INTO tc2 SELECT * FROM tc")
    assert engine.sql("SELECT COUNT(*) AS c FROM tc2").collect()[0][0] == 2
    engine.sql("DROP TABLE tc2")
    engine.sql("DROP TABLE tc")
    engine.sql("DROP TYPE custom_type_name")
    engine.sql("DROP TYPE custom_type_field")


def test_create_type_unknown_member_rejected(engine):
    with pytest.raises(ValueError, match="unsupported column type"):
        engine.sql("CREATE TYPE badt AS (f1 nosuchtype)")


def test_sequence_increment_by(engine):
    # reference: CREATE SEQUENCE DdlEmptyDb.ddl_seq START 10 INCREMENT 2
    # (test_sql_features.cpp:4471)
    engine.sql("CREATE SEQUENCE stepped START 10 INCREMENT 2")
    vals = [engine.sql("SELECT nextval('stepped') AS v").collect()[0][0] for _ in range(3)]
    assert vals == [10, 12, 14]
    engine.sql("DROP SEQUENCE stepped")


def test_per_row_nextval_in_insert_select(engine):
    # PG semantics: every source row gets a DISTINCT sequence value
    engine.sql("CREATE SEQUENCE rowids START 100")
    engine.sql(
        "CREATE TABLE seq_rows AS SELECT CAST(-1 AS BIGINT) AS id, n_name AS nm "
        "FROM nation WHERE 1 = 0"
    )
    engine.sql("INSERT INTO seq_rows SELECT nextval('rowids'), n_name FROM nation")
    rows = engine.sql("SELECT id FROM seq_rows").collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(100, 125))  # 25 nations, distinct consecutive ids
    # statement-level nextval continues AFTER the bulk assignment
    assert engine.sql("SELECT nextval('rowids') AS v").collect()[0][0] == 125
    assert engine.sql("SELECT currval('rowids') AS v").collect()[0][0] == 125
    engine.sql("DROP TABLE seq_rows")
    engine.sql("DROP SEQUENCE rowids")


def test_time_type_columns(engine):
    # reference test_sql_features.cpp: TIME / TIME WITH TIME ZONE columns
    # compared against TIME literals (Spark 4.1 TIME type, enabled by
    # spark.sql.timeType.enabled in session.py; TZ-less like PG's time)
    engine.sql(
        "CREATE TABLE shifts (id int, start_t time, end_t time with time zone)"
    )
    engine.sql("INSERT INTO shifts VALUES (1, TIME '09:00:00', TIME '17:00:00')")
    engine.sql("INSERT INTO shifts VALUES (2, TIME '12:30:15', TIME '20:45:00')")
    pick = lambda sql: sorted(r["id"] for r in engine.sql(sql).collect())
    assert pick("SELECT id FROM shifts WHERE start_t = TIME '12:30:15'") == [2]
    assert pick("SELECT id FROM shifts WHERE start_t < TIME '10:00:00'") == [1]
    assert pick("SELECT id FROM shifts WHERE end_t > TIME '18:00:00'") == [2]
    # string literals coerce to the declared TIME column on insert
    engine.sql("INSERT INTO shifts VALUES (3, '23:59:59', '00:00:01')")
    assert pick("SELECT id FROM shifts WHERE start_t > TIME '23:00:00'") == [3]
    engine.sql("DROP TABLE shifts")


def test_interval_type_columns(engine):
    # reference test_sql_features.cpp: "WHERE greater than on INTERVAL" —
    # PG interval maps to Spark's day-time interval; PG-style multi-unit
    # literals (INTERVAL '1 day 2 hours') parse natively
    engine.sql("CREATE TABLE spans (id int, dur interval)")
    engine.sql("INSERT INTO spans VALUES (1, INTERVAL '2 hours')")
    engine.sql("INSERT INTO spans VALUES (2, INTERVAL '1 day 2 hours')")
    pick = lambda sql: sorted(r["id"] for r in engine.sql(sql).collect())
    assert pick("SELECT id FROM spans WHERE dur > INTERVAL '1 day'") == [2]
    assert pick("SELECT id FROM spans WHERE dur = INTERVAL '2 hours'") == [1]
    import datetime
    rows = dict(engine.sql("SELECT id, dur FROM spans").collect())
    assert rows[2] == datetime.timedelta(days=1, hours=2)
    engine.sql("DROP TABLE spans")


def test_unrecognised_owned_ddl_raises_not_fallthrough(engine):
    """A DDL statement in a router-owned family that no rule matches must
    raise a clear error — never silently fall through to spark.sql, where
    it could act on Spark's own catalog and diverge from the managed-table
    state (round-4 router guard)."""
    for bad in (
        "ALTER TABLE nosuch SET TBLPROPERTIES ('k'='v')",
        "CREATE TABLE part_t PARTITION OF parent DEFAULT",
        "DROP TYPE IF EXISTS nope CASCADE RESTRICT EXTRA",
    ):
        with pytest.raises(Exception) as exc:
            engine.execute_sql(bad)
        assert "unrecognised DDL" in str(exc.value), bad
    # a statement a rule DOES claim but cannot parse raises its own
    # explicit error — also never a silent fall-through (PARTITION BY is
    # supported since round 10; all-columns partitioning is the refusal)
    with pytest.raises(Exception, match="all of the table's columns"):
        engine.execute_sql("CREATE TABLE weird (a int) PARTITION BY RANGE (a)")
    with pytest.raises(Exception, match="unsupported column type"):
        engine.execute_sql("CREATE TABLE weird2 (a notatype)")


# --- INSERT ... ON CONFLICT (PG upsert) -------------------------------------


def test_upsert_do_update_accumulate(engine):
    engine.execute_sql("CREATE TABLE kv (k INT PRIMARY KEY, v INT)")
    engine.execute_sql("INSERT INTO kv VALUES (1, 10), (2, 20)")
    n = engine.execute_sql(
        "INSERT INTO kv VALUES (2, 5), (3, 30) "
        "ON CONFLICT (k) DO UPDATE SET v = kv.v + EXCLUDED.v"
    ).value("upserted", 0)
    assert n == 2
    rows = dict(engine.execute_sql("SELECT * FROM kv").fetchall())
    assert rows == {1: 10, 2: 25, 3: 30}


def test_upsert_do_nothing_skips_conflicts(engine):
    engine.execute_sql("CREATE TABLE kn (k INT PRIMARY KEY, v INT)")
    engine.execute_sql("INSERT INTO kn VALUES (1, 10)")
    n = engine.execute_sql(
        "INSERT INTO kn VALUES (1, 99), (2, 20), (2, 21) "
        "ON CONFLICT (k) DO NOTHING"
    ).value("upserted", 0)
    # k=1 conflicts with the table, the second k=2 conflicts with the
    # first proposed k=2 (PG: first proposed row wins within the batch)
    assert n == 1
    rows = dict(engine.execute_sql("SELECT * FROM kn").fetchall())
    assert rows == {1: 10, 2: 20}


def test_upsert_returning_affected_rows(engine):
    engine.execute_sql("CREATE TABLE kr (k INT PRIMARY KEY, v INT)")
    engine.execute_sql("INSERT INTO kr VALUES (1, 1)")
    rows = sorted(
        engine.execute_sql(
            "INSERT INTO kr VALUES (1, 100), (5, 50) "
            "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v RETURNING *"
        ).fetchall()
    )
    assert rows == [(1, 100), (5, 50)]


def test_upsert_requires_arbiter_constraint(engine):
    import pytest

    engine.execute_sql("CREATE TABLE na (k INT, v INT)")
    with pytest.raises(ValueError, match="arbiter"):
        engine.execute_sql(
            "INSERT INTO na VALUES (1, 1) ON CONFLICT (k) DO NOTHING"
        )


def test_upsert_duplicate_arbiter_in_batch_raises(engine):
    import pytest

    from otterbrix_spark.operators.dml import ConstraintViolation

    engine.execute_sql("CREATE TABLE dup (k INT PRIMARY KEY, v INT)")
    with pytest.raises(ConstraintViolation, match="second time"):
        engine.execute_sql(
            "INSERT INTO dup VALUES (1, 1), (1, 2) "
            "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v"
        )


def test_upsert_inside_transaction_rolls_back(engine):
    engine.execute_sql("CREATE TABLE tx (k INT PRIMARY KEY, v INT)")
    engine.execute_sql("INSERT INTO tx VALUES (1, 10)")
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "INSERT INTO tx VALUES (1, 99), (2, 20) "
        "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v"
    )
    staged = dict(engine.execute_sql("SELECT * FROM tx").fetchall())
    assert staged == {1: 99, 2: 20}  # read-your-writes inside the txn
    engine.execute_sql("ROLLBACK")
    rows = dict(engine.execute_sql("SELECT * FROM tx").fetchall())
    assert rows == {1: 10}


# --- UPDATE ... FROM (PG join-update) ---------------------------------------


def test_update_from_join(engine):
    engine.execute_sql("CREATE TABLE acct AS SELECT 1 AS id, 100 AS bal")
    engine.execute_sql("INSERT INTO acct VALUES (2, 200), (3, 300)")
    engine.execute_sql("CREATE TABLE adj AS SELECT 1 AS aid, 5 AS delta")
    engine.execute_sql("INSERT INTO adj VALUES (3, 30)")
    n = engine.execute_sql(
        "UPDATE acct SET bal = acct.bal + adj.delta FROM adj "
        "WHERE acct.id = adj.aid"
    ).value("updated", 0)
    assert n == 2
    rows = dict(engine.execute_sql("SELECT * FROM acct").fetchall())
    assert rows == {1: 105, 2: 200, 3: 330}


def test_update_from_alias_and_returning(engine):
    engine.execute_sql("CREATE TABLE uf AS SELECT 1 AS id, 'old' AS tag")
    engine.execute_sql("CREATE TABLE names AS SELECT 1 AS nid, 'new' AS nm")
    rows = engine.execute_sql(
        "UPDATE uf SET tag = s.nm FROM names AS s WHERE uf.id = s.nid "
        "RETURNING *"
    ).fetchall()
    assert rows == [(1, "new")]


def test_update_from_multimatch_refused(engine):
    import pytest

    from otterbrix_spark.operators.dml import ConstraintViolation

    engine.execute_sql("CREATE TABLE mm AS SELECT 1 AS id, 0 AS v")
    engine.execute_sql("CREATE TABLE srcm AS SELECT 1 AS sid, 10 AS d")
    engine.execute_sql("INSERT INTO srcm VALUES (1, 20)")
    with pytest.raises(ConstraintViolation, match="multiple source rows"):
        engine.execute_sql(
            "UPDATE mm SET v = srcm.d FROM srcm WHERE mm.id = srcm.sid"
        )


def test_update_with_subquery_where_still_plain_update(engine):
    # the join-update router must NOT hijack a plain UPDATE whose WHERE
    # carries a subquery containing FROM/WHERE
    engine.execute_sql("CREATE TABLE pu AS SELECT 1 AS id, 0 AS v")
    engine.execute_sql("INSERT INTO pu VALUES (2, 0), (3, 0)")
    engine.execute_sql("CREATE TABLE pk AS SELECT 2 AS kid, 1 AS flag")
    engine.execute_sql(
        "UPDATE pu SET v = 9 "
        "WHERE id IN (SELECT kid FROM pk WHERE flag = 1)"
    )
    rows = dict(engine.execute_sql("SELECT * FROM pu").fetchall())
    assert rows == {1: 0, 2: 9, 3: 0}


def test_update_from_inside_transaction(engine):
    engine.execute_sql("CREATE TABLE txu AS SELECT 1 AS id, 10 AS v")
    engine.execute_sql("CREATE TABLE txs AS SELECT 1 AS sid, 99 AS nv")
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "UPDATE txu SET v = txs.nv FROM txs WHERE txu.id = txs.sid"
    )
    assert dict(engine.execute_sql("SELECT * FROM txu").fetchall()) == {1: 99}
    engine.execute_sql("ROLLBACK")
    assert dict(engine.execute_sql("SELECT * FROM txu").fetchall()) == {1: 10}


# --- MERGE INTO (PG 15 statement, catalog._merge_into) ----------------------


def _merge_fixture(engine):
    engine.execute_sql("CREATE TABLE m_t (k BIGINT PRIMARY KEY, v BIGINT)")
    engine.execute_sql("INSERT INTO m_t VALUES (1, 10), (2, -5), (3, 30)")
    engine.execute_sql(
        "CREATE TABLE m_s AS SELECT * FROM "
        "(VALUES (2, 100), (3, 200), (4, 400)) AS s(k, d)"
    )


def test_merge_three_clauses(engine):
    _merge_fixture(engine)
    n = engine.execute_sql(
        "MERGE INTO m_t USING m_s ON m_t.k = m_s.k "
        "WHEN MATCHED AND m_t.v < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = m_t.v + m_s.d "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (m_s.k, m_s.d)"
    ).value("merged", 0)
    assert n == 3  # 1 delete + 1 update + 1 insert
    rows = sorted(engine.execute_sql("SELECT * FROM m_t").fetchall())
    assert rows == [(1, 10), (3, 230), (4, 400)]


def test_merge_first_match_wins_clause_order(engine):
    _merge_fixture(engine)
    # the unconditional UPDATE precedes the DELETE, so the DELETE can
    # never fire (PG evaluates WHEN clauses in statement order)
    engine.execute_sql(
        "MERGE INTO m_t USING m_s ON m_t.k = m_s.k "
        "WHEN MATCHED THEN UPDATE SET v = 0 "
        "WHEN MATCHED AND m_t.v < 0 THEN DELETE"
    )
    rows = sorted(engine.execute_sql("SELECT * FROM m_t").fetchall())
    assert rows == [(1, 10), (2, 0), (3, 0)]


def test_merge_do_nothing_and_unmatched_rows_kept(engine):
    _merge_fixture(engine)
    # matched rows with non-negative v fall through every MATCHED clause
    # and stay unchanged; NOT MATCHED DO NOTHING suppresses the insert
    engine.execute_sql(
        "MERGE INTO m_t USING m_s ON m_t.k = m_s.k "
        "WHEN MATCHED AND m_t.v < 0 THEN UPDATE SET v = m_s.d "
        "WHEN NOT MATCHED THEN DO NOTHING"
    )
    rows = sorted(engine.execute_sql("SELECT * FROM m_t").fetchall())
    assert rows == [(1, 10), (2, 100), (3, 30)]


def test_merge_multimatch_refused(engine):
    _merge_fixture(engine)
    engine.execute_sql("INSERT INTO m_s VALUES (3, 999)")
    with pytest.raises(Exception, match="multiple source rows"):
        engine.execute_sql(
            "MERGE INTO m_t USING m_s ON m_t.k = m_s.k "
            "WHEN MATCHED THEN UPDATE SET v = m_s.d"
        )


def test_merge_insert_defaults_missing_columns_to_null(engine):
    engine.execute_sql(
        "CREATE TABLE m3 (k BIGINT PRIMARY KEY, a BIGINT, b STRING)"
    )
    engine.execute_sql("INSERT INTO m3 VALUES (1, 1, 'x')")
    engine.execute_sql(
        "CREATE TABLE m3s AS SELECT * FROM (VALUES (7), (8)) AS s(k)"
    )
    engine.execute_sql(
        "MERGE INTO m3 USING m3s ON m3.k = m3s.k "
        "WHEN NOT MATCHED THEN INSERT (k, a) VALUES (m3s.k, m3s.k * 2)"
    )
    rows = sorted(engine.execute_sql("SELECT * FROM m3").fetchall())
    assert rows == [(1, 1, "x"), (7, 14, None), (8, 16, None)]


def test_merge_inside_transaction_rolls_back(engine):
    _merge_fixture(engine)
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "MERGE INTO m_t USING m_s ON m_t.k = m_s.k "
        "WHEN MATCHED THEN UPDATE SET v = 0"
    )
    staged = sorted(engine.execute_sql("SELECT * FROM m_t").fetchall())
    assert staged == [(1, 10), (2, 0), (3, 0)]  # read-your-writes
    engine.execute_sql("ROLLBACK")
    rows = sorted(engine.execute_sql("SELECT * FROM m_t").fetchall())
    assert rows == [(1, 10), (2, -5), (3, 30)]


# --- column DEFAULTs (catalog.table_defaults) -------------------------------


def test_default_applied_on_omitted_column(engine):
    engine.execute_sql(
        "CREATE TABLE d1 (k BIGINT, v BIGINT DEFAULT 7, s STRING DEFAULT 'x')"
    )
    engine.execute_sql("INSERT INTO d1 (k) VALUES (1)")
    engine.execute_sql("INSERT INTO d1 (k, v) VALUES (2, 99)")
    rows = sorted(engine.execute_sql("SELECT * FROM d1").fetchall())
    assert rows == [(1, 7, "x"), (2, 99, "x")]


def test_default_expression_and_clause_order(engine):
    engine.execute_sql(
        "CREATE TABLE d2 (k BIGINT, a BIGINT DEFAULT 6 * 7 NOT NULL, "
        "b BIGINT NOT NULL DEFAULT -5)"
    )
    engine.execute_sql("INSERT INTO d2 (k) VALUES (1)")
    assert engine.execute_sql("SELECT * FROM d2").fetchall() == [(1, 42, -5)]


def test_default_short_values_fill(engine):
    engine.execute_sql(
        "CREATE TABLE d3 (k BIGINT, v BIGINT DEFAULT 3, w BIGINT)"
    )
    engine.execute_sql("INSERT INTO d3 VALUES (1)")  # v -> 3, w -> NULL
    assert engine.execute_sql("SELECT * FROM d3").fetchall() == [(1, 3, None)]


def test_default_in_upsert_insert_path(engine):
    engine.execute_sql(
        "CREATE TABLE d4 (k BIGINT PRIMARY KEY, v BIGINT DEFAULT 11)"
    )
    engine.execute_sql("INSERT INTO d4 (k) VALUES (1)")
    engine.execute_sql(
        "INSERT INTO d4 (k) VALUES (1), (2) ON CONFLICT (k) DO NOTHING"
    )
    rows = sorted(engine.execute_sql("SELECT * FROM d4").fetchall())
    assert rows == [(1, 11), (2, 11)]


def test_broken_default_fails_at_create_time(engine):
    with pytest.raises(Exception):
        engine.execute_sql(
            "CREATE TABLE d5 (k BIGINT, v BIGINT DEFAULT no_such_fn(1))"
        )


# --- COPY statement (PG CopyStmt) --------------------------------------------


def test_copy_to_from_csv_roundtrip(engine, tmp_path):
    engine.execute_sql("CREATE TABLE cp_src (k BIGINT, v STRING)")
    engine.execute_sql(
        "INSERT INTO cp_src VALUES (1, 'a'), (2, 'has, comma'), (3, NULL)"
    )
    engine.execute_sql(
        f"COPY cp_src TO '{tmp_path}/out' WITH (FORMAT csv, HEADER)"
    )
    engine.execute_sql("CREATE TABLE cp_dst (k BIGINT, v STRING)")
    engine.execute_sql(f"COPY cp_dst FROM '{tmp_path}/out' (FORMAT csv, HEADER)")
    rows = sorted(engine.execute_sql("SELECT * FROM cp_dst").fetchall())
    assert rows == [(1, "a"), (2, "has, comma"), (3, None)]


def test_copy_query_to_parquet(engine, tmp_path):
    engine.execute_sql("CREATE TABLE cp_q (k BIGINT, v STRING)")
    engine.execute_sql("INSERT INTO cp_q VALUES (1, 'x'), (2, 'y')")
    engine.execute_sql(
        f"COPY (SELECT k * 10 AS k10 FROM cp_q WHERE k = 2) "
        f"TO '{tmp_path}/q' (FORMAT parquet)"
    )
    assert [tuple(r) for r in
            engine.spark.read.parquet(f"{tmp_path}/q").collect()] == [(20,)]


def test_copy_from_subset_columns_apply_defaults(engine, tmp_path):
    engine.execute_sql("CREATE TABLE cp_d (k BIGINT, v STRING DEFAULT 'dflt')")
    engine.execute_sql("CREATE TABLE cp_d_src (k BIGINT)")
    engine.execute_sql("INSERT INTO cp_d_src VALUES (7)")
    engine.execute_sql(f"COPY cp_d_src TO '{tmp_path}/k' (FORMAT csv, HEADER)")
    engine.execute_sql(f"COPY cp_d (k) FROM '{tmp_path}/k' (FORMAT csv, HEADER)")
    assert engine.execute_sql("SELECT * FROM cp_d").fetchall() == [(7, "dflt")]


def test_copy_from_enforces_constraints(engine, tmp_path):
    engine.execute_sql("CREATE TABLE cp_c_src (k BIGINT)")
    engine.execute_sql("INSERT INTO cp_c_src VALUES (-1)")
    engine.execute_sql(f"COPY cp_c_src TO '{tmp_path}/neg' (FORMAT parquet)")
    engine.execute_sql("CREATE TABLE cp_c (k BIGINT CHECK (k > 0))")
    with pytest.raises(Exception):
        engine.execute_sql(f"COPY cp_c FROM '{tmp_path}/neg' (FORMAT parquet)")


# --- DEFAULT keyword forms (INSERT DEFAULT VALUES / VALUES(DEFAULT) / SET) ---


def test_insert_default_values_row(engine):
    engine.execute_sql(
        "CREATE TABLE dv (k BIGINT DEFAULT 42, v STRING DEFAULT 'x', w BIGINT)"
    )
    engine.execute_sql("INSERT INTO dv DEFAULT VALUES")
    assert engine.execute_sql("SELECT * FROM dv").fetchall() == [(42, "x", None)]


def test_insert_default_keyword_in_values(engine):
    engine.execute_sql(
        "CREATE TABLE dv2 (k BIGINT, v STRING DEFAULT 'dd', w BIGINT DEFAULT 7)"
    )
    engine.execute_sql("INSERT INTO dv2 VALUES (1, DEFAULT, 5), (2, 'y', DEFAULT)")
    rows = sorted(engine.execute_sql("SELECT * FROM dv2").fetchall())
    assert rows == [(1, "dd", 5), (2, "y", 7)]


def test_insert_default_keyword_with_column_list(engine):
    engine.execute_sql(
        "CREATE TABLE dv3 (k BIGINT, v STRING DEFAULT 'z', w BIGINT DEFAULT 9)"
    )
    engine.execute_sql("INSERT INTO dv3 (w, k) VALUES (DEFAULT, 3)")
    assert engine.execute_sql("SELECT * FROM dv3").fetchall() == [(3, "z", 9)]


def test_update_set_default(engine):
    engine.execute_sql(
        "CREATE TABLE dv4 (k BIGINT, v STRING DEFAULT 'restored', w BIGINT)"
    )
    engine.execute_sql("INSERT INTO dv4 VALUES (1, 'changed', 10)")
    engine.execute_sql("UPDATE dv4 SET v = DEFAULT, w = DEFAULT WHERE k = 1")
    assert engine.execute_sql("SELECT * FROM dv4").fetchall() == [
        (1, "restored", None)
    ]


def test_values_string_containing_default_untouched(engine):
    engine.execute_sql("CREATE TABLE dv5 (k BIGINT, v STRING DEFAULT 'a')")
    engine.execute_sql("INSERT INTO dv5 VALUES (1, 'use DEFAULT here')")
    assert engine.execute_sql("SELECT * FROM dv5").fetchall() == [
        (1, "use DEFAULT here")
    ]


def test_alter_add_column_with_default_backfills(engine):
    engine.execute_sql("CREATE TABLE ac (k BIGINT)")
    engine.execute_sql("INSERT INTO ac VALUES (1), (2)")
    engine.execute_sql("ALTER TABLE ac ADD COLUMN v BIGINT DEFAULT 7")
    # existing rows backfilled
    assert sorted(engine.execute_sql("SELECT * FROM ac").fetchall()) == [
        (1, 7), (2, 7)]
    # future INSERTs that omit the column take the default too
    engine.execute_sql("INSERT INTO ac (k) VALUES (3)")
    assert sorted(engine.execute_sql("SELECT * FROM ac").fetchall()) == [
        (1, 7), (2, 7), (3, 7)]


def test_alter_add_column_without_default_nulls(engine):
    engine.execute_sql("CREATE TABLE ac2 (k BIGINT)")
    engine.execute_sql("INSERT INTO ac2 VALUES (1)")
    engine.execute_sql("ALTER TABLE ac2 ADD COLUMN w STRING")
    assert engine.execute_sql("SELECT * FROM ac2").fetchall() == [(1, None)]


def test_truncate_basic_and_txn(engine):
    eng = engine
    eng.sql("DROP TABLE IF EXISTS tr_t")
    eng.sql("CREATE TABLE tr_t (k bigint, v varchar(10))")
    eng.sql("INSERT INTO tr_t VALUES (1, 'a'), (2, 'b')")
    eng.sql("TRUNCATE tr_t")
    assert eng.sql("SELECT COUNT(*) AS n FROM tr_t").collect()[0].n == 0
    # schema and DML keep working after truncate
    eng.sql("INSERT INTO tr_t VALUES (3, 'c')")
    assert eng.sql("SELECT COUNT(*) AS n FROM tr_t").collect()[0].n == 1
    # transactional truncate rolls back
    eng.sql("BEGIN")
    eng.sql("TRUNCATE tr_t")
    assert eng.sql("SELECT COUNT(*) AS n FROM tr_t").collect()[0].n == 0
    eng.sql("ROLLBACK")
    assert eng.sql("SELECT COUNT(*) AS n FROM tr_t").collect()[0].n == 1


def test_truncate_multi_table_and_identity(engine):
    eng = engine
    eng.sql("DROP TABLE IF EXISTS tr_a")
    eng.sql("DROP TABLE IF EXISTS tr_b")
    eng.sql("DROP SEQUENCE IF EXISTS tr_seq")
    eng.sql("CREATE SEQUENCE tr_seq START 7")
    eng.sql("CREATE TABLE tr_a (id bigint DEFAULT nextval('tr_seq'), x bigint)")
    eng.sql("CREATE TABLE tr_b (y bigint)")
    eng.sql("INSERT INTO tr_a (x) VALUES (1)")
    eng.sql("INSERT INTO tr_a (x) VALUES (2)")
    eng.sql("INSERT INTO tr_b VALUES (9)")
    # without RESTART the sequence keeps counting
    eng.sql("TRUNCATE tr_a, tr_b")
    eng.sql("INSERT INTO tr_a (x) VALUES (3)")
    assert eng.sql("SELECT MIN(id) AS i FROM tr_a").collect()[0].i == 9
    eng.sql("TRUNCATE tr_a RESTART IDENTITY")
    eng.sql("INSERT INTO tr_a (x) VALUES (4)")
    assert eng.sql("SELECT MIN(id) AS i FROM tr_a").collect()[0].i == 7
    assert eng.sql("SELECT COUNT(*) AS n FROM tr_b").collect()[0].n == 0


def test_explain_dml_does_not_mutate(engine):
    """PG executes DML only under EXPLAIN ANALYZE; plain EXPLAIN plans the
    write inside a discarded implicit transaction (ADVICE r7, medium)."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS ex_t")
    eng.sql("CREATE TABLE ex_t (k bigint, v bigint)")
    eng.sql("INSERT INTO ex_t VALUES (1, 10), (2, 20)")
    rows = eng.sql("EXPLAIN UPDATE ex_t SET v = v + 1 WHERE k = 1").collect()
    assert rows and all(len(r) == 1 for r in rows)  # plan text came back
    # the plan must reflect the WRITE (a real scan/aggregate over the
    # table), not a one-row literal status frame
    assert any("ex_t" in r[0] or "Scan" in r[0] for r in rows)
    assert sorted(
        (r.k, r.v) for r in eng.sql("SELECT * FROM ex_t").collect()
    ) == [(1, 10), (2, 20)]  # the write was NOT applied
    rows = eng.sql("EXPLAIN DELETE FROM ex_t WHERE k = 2").collect()
    assert rows
    assert eng.sql("SELECT COUNT(*) AS n FROM ex_t").collect()[0].n == 2
    rows = eng.sql("EXPLAIN INSERT INTO ex_t VALUES (3, 30)").collect()
    assert rows
    assert eng.sql("SELECT COUNT(*) AS n FROM ex_t").collect()[0].n == 2
    # EXPLAIN ANALYZE executes, as PG does
    eng.sql("EXPLAIN ANALYZE UPDATE ex_t SET v = v + 1 WHERE k = 1").collect()
    assert eng.sql("SELECT v FROM ex_t WHERE k = 1").collect()[0].v == 11
    # utility statements refuse under plain EXPLAIN (PG grammar)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="utility statement"):
        eng.sql("EXPLAIN TRUNCATE ex_t")
    assert eng.sql("SELECT COUNT(*) AS n FROM ex_t").collect()[0].n == 2
    # CTAS plans its source query without creating the table
    rows = eng.sql(
        "EXPLAIN CREATE TABLE ex_ctas AS SELECT k FROM ex_t"
    ).collect()
    assert rows
    assert "ex_ctas" not in eng.catalog.tables


def test_explain_dml_inside_user_txn(engine):
    """Plain EXPLAIN inside BEGIN..COMMIT must not disturb the user's
    staged state (snapshot/restore of the txn dict + temp views)."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS ex_u")
    eng.sql("CREATE TABLE ex_u (k bigint)")
    eng.sql("INSERT INTO ex_u VALUES (1)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO ex_u VALUES (2)")  # staged, read-your-writes
    eng.sql("EXPLAIN UPDATE ex_u SET k = k * 10").collect()
    # the staged state is intact (the probe's stage was discarded)
    assert sorted(
        r.k for r in eng.sql("SELECT * FROM ex_u").collect()
    ) == [1, 2]
    eng.sql("COMMIT")
    assert sorted(
        r.k for r in eng.sql("SELECT * FROM ex_u").collect()
    ) == [1, 2]


def test_execute_wrong_parameter_count(engine):
    """EXECUTE referencing $k beyond the argument list raises PG's 'wrong
    number of parameters', not a bare IndexError (ADVICE r7)."""
    import pytest as _pytest

    eng = engine
    eng.execute_sql("DEALLOCATE ALL")
    eng.execute_sql("PREPARE exq AS SELECT $1 + $2 AS s")
    with _pytest.raises(ValueError, match="wrong number of parameters"):
        eng.execute_sql("EXECUTE exq(1)")
    assert eng.sql("EXECUTE exq(1, 2)").collect()[0].s == 3


def test_truncate_restart_schema_qualified_sequence(engine):
    """RESTART IDENTITY resets sequences referenced with schema-qualified
    names in DEFAULTs — nextval('db.seq') canonicalizes like
    _default_expr does (ADVICE r7)."""
    eng = engine
    eng.sql("CREATE DATABASE IF NOT EXISTS trq")
    eng.sql("DROP TABLE IF EXISTS trq.tt")
    eng.sql("DROP SEQUENCE IF EXISTS trq.sq")
    eng.sql("CREATE SEQUENCE trq.sq START 5")
    eng.sql(
        "CREATE TABLE trq.tt (id bigint DEFAULT nextval('trq.sq'), x bigint)"
    )
    eng.sql("INSERT INTO trq.tt (x) VALUES (1)")
    eng.sql("INSERT INTO trq.tt (x) VALUES (2)")
    eng.sql("TRUNCATE trq.tt RESTART IDENTITY")
    eng.sql("INSERT INTO trq.tt (x) VALUES (3)")
    assert eng.sql("SELECT MIN(id) AS i FROM trq.tt").collect()[0].i == 5


def test_explain_never_consumes_sequences(engine):
    """Plain EXPLAIN must not evaluate nextval — neither in a SELECT nor
    through an INSERT's DEFAULT (PG plans the call, it does not run it);
    currval must stay undefined after the probe."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS ex_sq")
    eng.sql("DROP SEQUENCE IF EXISTS ex_seq")
    eng.sql("CREATE SEQUENCE ex_seq START 100")
    # SELECT carrying nextval: plans (peek substitution), does not consume
    rows = eng.sql("EXPLAIN SELECT nextval('ex_seq') AS v").collect()
    assert rows
    with _pytest.raises(ValueError, match="currval"):
        eng.sql("SELECT currval('ex_seq')")
    # INSERT whose DEFAULT calls nextval: staged probe restores seq state
    eng.sql(
        "CREATE TABLE ex_sq (id bigint DEFAULT nextval('ex_seq'), x bigint)"
    )
    eng.sql("EXPLAIN INSERT INTO ex_sq (x) VALUES (1)").collect()
    eng.sql("INSERT INTO ex_sq (x) VALUES (1)")
    assert eng.sql("SELECT MIN(id) AS i FROM ex_sq").collect()[0].i == 100


def test_explain_execute_prepared(engine):
    """EXPLAIN EXECUTE plans the bound prepared statement (PG's standard
    way to inspect a prepared plan) without executing catalog DML."""
    eng = engine
    eng.execute_sql("DEALLOCATE ALL")
    eng.execute_sql("PREPARE exp AS SELECT $1 + 1 AS v")
    rows = eng.sql("EXPLAIN EXECUTE exp(41)").collect()
    assert rows and any("42" in r[0] or "41" in r[0] for r in rows)
    # prepared DML under plain EXPLAIN stays plan-only
    eng.sql("DROP TABLE IF EXISTS ex_pe")
    eng.sql("CREATE TABLE ex_pe (k bigint)")
    eng.sql("INSERT INTO ex_pe VALUES (1)")
    eng.execute_sql("PREPARE exp2 AS DELETE FROM ex_pe WHERE k = $1")
    eng.sql("EXPLAIN EXECUTE exp2(1)").collect()
    assert eng.sql("SELECT COUNT(*) AS n FROM ex_pe").collect()[0].n == 1


def test_execute_zero_args_wrong_count(engine):
    """EXECUTE name (no argument list) of a $n-referencing statement gets
    PG's wrong-number error, not a Spark parse error on '$'."""
    import pytest as _pytest

    eng = engine
    eng.execute_sql("DEALLOCATE ALL")
    eng.execute_sql("PREPARE exz AS SELECT $1 + $2 AS s")
    with _pytest.raises(ValueError, match="wrong number of parameters"):
        eng.execute_sql("EXECUTE exz")
    # engine-level pass-through params remain the supported combination
    assert eng.sql("EXECUTE exz", 1, 2).collect()[0].s == 3


def test_explain_dml_on_unmanaged_spark_table(engine):
    """Plain EXPLAIN of DML on a table the Catalog does NOT manage must
    not execute the write either — it delegates to Spark's own EXPLAIN
    (spark.sql runs DML commands eagerly, so routing would mutate)."""
    spark = engine.spark
    spark.sql("DROP TABLE IF EXISTS ex_native")
    spark.sql("CREATE TABLE ex_native (x INT) USING parquet")
    try:
        rows = engine.sql("EXPLAIN INSERT INTO ex_native VALUES (1)").collect()
        assert rows  # a plan came back...
        assert spark.sql("SELECT COUNT(*) AS n FROM ex_native").collect()[0].n == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS ex_native")


def test_returning_expression_lists(engine):
    """PG RETURNING accepts a full select list, not just * — columns,
    expressions, aliases — on INSERT, UPDATE, DELETE, upsert, and inside
    transactions (post-change values)."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS rexp")
    eng.sql("CREATE TABLE rexp (id bigint, salary bigint)")
    rows = eng.execute_sql(
        "INSERT INTO rexp VALUES (1, 100), (2, 200) RETURNING id, salary + 1 AS s1"
    ).fetchall()
    assert sorted(rows) == [(1, 101), (2, 201)]
    rows = eng.execute_sql(
        "UPDATE rexp SET salary = salary * 2 WHERE id = 2 "
        "RETURNING id, salary AS doubled"
    ).fetchall()
    assert rows == [(2, 400)]
    rows = eng.execute_sql(
        "DELETE FROM rexp WHERE id = 1 RETURNING salary * 10 AS big"
    ).fetchall()
    assert rows == [(1000,)]
    # txn-staged DML projects the same way
    eng.sql("BEGIN")
    rows = eng.execute_sql(
        "UPDATE rexp SET salary = 7 RETURNING id + salary AS k"
    ).fetchall()
    assert rows == [(9,)]
    eng.sql("ROLLBACK")
    assert eng.sql("SELECT salary FROM rexp").collect()[0][0] == 400
    # RETURNING * unchanged
    rows = eng.execute_sql(
        "UPDATE rexp SET salary = 1 RETURNING *"
    ).fetchall()
    assert rows == [(2, 1)]


def test_returning_exprs_on_upsert(engine):
    eng = engine
    eng.sql("DROP TABLE IF EXISTS rup")
    eng.sql("CREATE TABLE rup (k bigint PRIMARY KEY, v bigint)")
    eng.sql("INSERT INTO rup VALUES (1, 10)")
    rows = eng.execute_sql(
        "INSERT INTO rup VALUES (1, 99), (2, 20) ON CONFLICT (k) "
        "DO UPDATE SET v = EXCLUDED.v RETURNING k, v * 2 AS vv"
    ).fetchall()
    assert sorted(rows) == [(1, 198), (2, 40)]


def test_dml_keywords_inside_literals_not_clause_boundaries(engine):
    """RETURNING / WHERE inside a string literal must not split clauses —
    the DML regexes match over string-protected text."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS lit_t")
    eng.sql("CREATE TABLE lit_t (k bigint, v varchar(64))")
    eng.sql("INSERT INTO lit_t VALUES (1, 'gift RETURNING x')")
    rows = eng.sql("SELECT v FROM lit_t").collect()
    assert rows[0][0] == "gift RETURNING x"
    eng.sql("UPDATE lit_t SET v = 'no WHERE here' ")
    assert eng.sql("SELECT v FROM lit_t").collect()[0][0] == "no WHERE here"
    cur = engine.execute_sql(
        "UPDATE lit_t SET v = 'also RETURNING *' RETURNING k, v"
    )
    assert cur.fetchall() == [(1, "also RETURNING *")]
    eng.sql("DELETE FROM lit_t WHERE v = 'also RETURNING *'")
    assert eng.sql("SELECT COUNT(*) AS n FROM lit_t").collect()[0].n == 0


def test_merge_literal_when_then_not_clause_boundaries(engine):
    """MERGE actions whose string literals contain ' WHEN MATCHED ' or
    ' THEN ' must parse intact (clause split over protected text)."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS mg_t")
    eng.sql("DROP TABLE IF EXISTS mg_s")
    eng.sql("CREATE TABLE mg_t (k bigint, note varchar(64))")
    eng.sql("CREATE TABLE mg_s (k bigint)")
    eng.sql("INSERT INTO mg_t VALUES (1, 'old')")
    eng.sql("INSERT INTO mg_s VALUES (1), (2)")
    eng.sql(
        "MERGE INTO mg_t USING mg_s ON mg_t.k = mg_s.k "
        "WHEN MATCHED THEN UPDATE SET note = 'hit WHEN MATCHED THEN x' "
        "WHEN NOT MATCHED THEN INSERT (k, note) "
        "VALUES (mg_s.k, 'new THEN row')"
    )
    rows = dict(eng.sql("SELECT k, note FROM mg_t").collect())
    assert rows == {1: "hit WHEN MATCHED THEN x", 2: "new THEN row"}


def test_explain_insert_dynamic_table_plan_only(engine):
    """Dynamic tables stage per-txn batches (round 8), so plain EXPLAIN
    of DML on them plans without applying the write."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS ex_dyn")
    eng.sql("CREATE TABLE ex_dyn ()")  # schema-on-write dynamic table
    eng.sql("INSERT INTO ex_dyn SELECT 1 AS a")
    rows = eng.sql("EXPLAIN INSERT INTO ex_dyn SELECT 2 AS a").collect()
    assert rows
    assert eng.sql("SELECT COUNT(*) AS n FROM ex_dyn").collect()[0].n == 1


def test_dynamic_table_dml_in_transaction(engine):
    """Dynamic-table INSERT inside BEGIN..ROLLBACK is undone; COMMIT
    lands the staged batches; in-txn reads see the staged rows AND the
    schema they extend (read-your-writes over the union-schema read)."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS dyn_tx")
    eng.sql("CREATE TABLE dyn_tx ()")
    eng.sql("INSERT INTO dyn_tx SELECT 1 AS a")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO dyn_tx SELECT 2 AS a, 'x' AS b")  # new column
    assert eng.sql("SELECT COUNT(*) AS n FROM dyn_tx").collect()[0].n == 2
    assert "b" in eng.sql("SELECT * FROM dyn_tx").columns
    eng.sql("ROLLBACK")
    assert eng.sql("SELECT COUNT(*) AS n FROM dyn_tx").collect()[0].n == 1
    assert "b" not in eng.sql("SELECT * FROM dyn_tx").columns
    eng.sql("BEGIN")
    eng.sql("INSERT INTO dyn_tx SELECT 3 AS a, 'y' AS b")
    eng.sql("COMMIT")
    got = {(r.a, r.b) for r in eng.sql("SELECT a, b FROM dyn_tx").collect()}
    assert got == {(1, None), (3, "y")}


def test_explain_merge_plan_only(engine):
    """Plain EXPLAIN MERGE on a managed table stages lazily: no write,
    and the plan shows the candidate aggregate, not a one-row literal."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS exm_t")
    eng.sql("DROP TABLE IF EXISTS exm_s")
    eng.sql("CREATE TABLE exm_t (k bigint, v bigint)")
    eng.sql("CREATE TABLE exm_s (k bigint, v bigint)")
    eng.sql("INSERT INTO exm_t VALUES (1, 10)")
    eng.sql("INSERT INTO exm_s VALUES (1, 99), (2, 20)")
    rows = eng.sql(
        "EXPLAIN MERGE INTO exm_t USING exm_s ON exm_t.k = exm_s.k "
        "WHEN MATCHED THEN UPDATE SET v = exm_s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (exm_s.k, exm_s.v)"
    ).collect()
    assert rows and any("exm" in r[0] or "Scan" in r[0] for r in rows)
    assert dict(eng.sql("SELECT k, v FROM exm_t").collect()) == {1: 10}


def test_alter_column_type_with_using(engine):
    """PG ALTER COLUMN TYPE: whole-column rewrite, USING expression,
    loud failure (table untouched) when a value cannot convert."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS act")
    eng.sql("CREATE TABLE act (k bigint, v varchar(10))")
    eng.sql("INSERT INTO act VALUES (1, '10'), (2, '20')")
    eng.sql("ALTER TABLE act ALTER COLUMN v TYPE bigint")
    assert [tuple(r) for r in
            eng.sql("SELECT k, v + 1 AS v1 FROM act ORDER BY k").collect()
            ] == [(1, 11), (2, 21)]
    # USING expression drives the conversion
    eng.sql("ALTER TABLE act ALTER v TYPE varchar(20) USING concat('n', v)")
    assert eng.sql("SELECT v FROM act WHERE k = 1").collect()[0][0] == "n10"
    # non-convertible values refuse and leave the table untouched
    with _pytest.raises(ValueError, match="cannot be converted"):
        eng.sql("ALTER TABLE act ALTER COLUMN v TYPE bigint")
    assert eng.sql("SELECT v FROM act WHERE k = 1").collect()[0][0] == "n10"
    # ... and a USING that fixes them succeeds
    eng.sql(
        "ALTER TABLE act ALTER COLUMN v TYPE bigint "
        "USING CAST(substring(v, 2) AS bigint)"
    )
    assert eng.sql("SELECT SUM(v) AS s FROM act").collect()[0].s == 30


def test_alter_column_set_drop_default(engine):
    eng = engine
    eng.sql("DROP TABLE IF EXISTS acd")
    eng.sql("CREATE TABLE acd (k bigint, v bigint DEFAULT 5)")
    eng.sql("INSERT INTO acd (k) VALUES (1)")
    eng.sql("ALTER TABLE acd ALTER COLUMN v SET DEFAULT 9")
    eng.sql("INSERT INTO acd (k) VALUES (2)")
    eng.sql("ALTER TABLE acd ALTER COLUMN v DROP DEFAULT")
    eng.sql("INSERT INTO acd (k) VALUES (3)")
    got = {r.k: r.v for r in eng.sql("SELECT k, v FROM acd").collect()}
    assert got == {1: 5, 2: 9, 3: None}


def test_update_row_form_set(engine):
    """PG row-form SET (a, b) = (e1, e2): pairwise expansion, pre-update
    row semantics preserved (both expressions see OLD values)."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS rfs")
    eng.sql("CREATE TABLE rfs (k bigint, a bigint, b bigint)")
    eng.sql("INSERT INTO rfs VALUES (1, 10, 20)")
    # swap via row form: both RHS evaluate against the pre-update row
    eng.sql("UPDATE rfs SET (a, b) = (b, a) WHERE k = 1")
    assert [tuple(r) for r in eng.sql("SELECT a, b FROM rfs").collect()] == [
        (20, 10)
    ]
    with _pytest.raises(ValueError, match="arity"):
        eng.sql("UPDATE rfs SET (a, b) = (1, 2, 3)")
    with _pytest.raises(ValueError, match="not supported"):
        eng.sql("UPDATE rfs SET (a, b) = (SELECT 1, 2)")


def test_txn_status_cursor_survives_commit(engine):
    """ADVICE r8 (medium): the staged-DML status frame was a LAZY count
    pinning pre-commit parquet files, which COMMIT's directory swap
    deletes — collecting the cursor after COMMIT threw
    FileNotFoundException. The txn path now counts eagerly."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS txc")
    eng.sql("CREATE TABLE txc (k bigint, v bigint)")
    eng.sql("INSERT INTO txc VALUES (1, 10), (2, 20), (3, 30)")
    eng.sql("BEGIN")
    upd = eng.sql("UPDATE txc SET v = v + 1 WHERE k <= 2")
    dele = eng.sql("DELETE FROM txc WHERE k = 3")
    ins = eng.sql("INSERT INTO txc VALUES (4, 40)")
    eng.sql("COMMIT")
    # collect AFTER commit — the old files are gone by now
    assert upd.collect()[0].updated == 2
    assert dele.collect()[0].deleted == 1
    assert ins.collect()[0].inserted == 1


def test_txn_returning_cursor_survives_commit(engine):
    """Same hazard for RETURNING: the projected rows are pinned at
    statement time (localCheckpoint) so the cursor outlives COMMIT."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS txr")
    eng.sql("CREATE TABLE txr (k bigint, v bigint)")
    eng.sql("INSERT INTO txr VALUES (1, 10), (2, 20)")
    eng.sql("BEGIN")
    ret = eng.sql("UPDATE txr SET v = v * 2 WHERE k = 1 RETURNING k, v")
    eng.sql("COMMIT")
    assert [tuple(r) for r in ret.collect()] == [(1, 20)]


def test_txn_merge_status_cursor_survives_commit(engine):
    """MERGE inside a txn had the same lazy-count hazard (catalog.py
    MERGE branch) — eager now."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS txm_t")
    eng.sql("DROP TABLE IF EXISTS txm_s")
    eng.sql("CREATE TABLE txm_t (k bigint, v bigint)")
    eng.sql("CREATE TABLE txm_s (k bigint, v bigint)")
    eng.sql("INSERT INTO txm_t VALUES (1, 10)")
    eng.sql("INSERT INTO txm_s VALUES (1, 99), (2, 20)")
    eng.sql("BEGIN")
    cur = eng.sql(
        "MERGE INTO txm_t USING txm_s ON txm_t.k = txm_s.k "
        "WHEN MATCHED THEN UPDATE SET v = txm_s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (txm_s.k, txm_s.v)"
    )
    eng.sql("COMMIT")
    assert cur.collect()[0].merged == 2
    assert dict(eng.sql("SELECT k, v FROM txm_t").collect()) == {1: 99, 2: 20}


def test_explain_refuses_spark_utility_fallthrough(engine):
    """ADVICE r8: plain EXPLAIN of a statement the catalog does NOT
    handle used to fall through to spark.sql, which EXECUTES utility
    commands eagerly (CACHE TABLE, SET k=v, ...). Now refused."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS exut")
    eng.sql("CREATE TABLE exut (k bigint)")
    with _pytest.raises(ValueError, match="utility statement"):
        eng.sql("EXPLAIN CACHE TABLE exut")
    assert not eng.spark.catalog.isCached("exut")
    with _pytest.raises(ValueError, match="utility statement"):
        eng.sql("EXPLAIN SET spark.sql.ansi.enabled=false")
    # queries still plan fine through the same branch
    assert eng.sql("EXPLAIN SELECT 1 AS one").collect()


def test_alter_column_type_using_may_yield_null(engine):
    """ADVICE r8: a USING expression that legitimately yields NULL
    (PG: USING nullif(v, 'n/a')) must not be counted as a conversion
    failure — only a non-NULL USING result whose cast is NULL refuses."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS acu")
    eng.sql("CREATE TABLE acu (k bigint, v varchar(10))")
    eng.sql("INSERT INTO acu VALUES (1, '10'), (2, 'n/a'), (3, '30')")
    eng.sql("ALTER TABLE acu ALTER COLUMN v TYPE bigint "
            "USING nullif(v, 'n/a')")
    got = {r.k: r.v for r in eng.sql("SELECT k, v FROM acu").collect()}
    assert got == {1: 10, 2: None, 3: 30}
    # but a USING result that truly cannot cast still refuses
    eng.sql("ALTER TABLE acu ALTER COLUMN v TYPE varchar(10) "
            "USING concat('x', v)")
    with _pytest.raises(ValueError, match="cannot be converted"):
        eng.sql("ALTER TABLE acu ALTER COLUMN v TYPE bigint")


def test_pg_catalog_views_track_live_state(engine):
    """pg_catalog views rebuild on demand: DDL between two introspection
    queries is visible, DROP removes the row, and pg_sequences exposes
    start/increment/last_value (VERDICT r8 #4)."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS pgl_t")
    eng.sql("DROP SEQUENCE IF EXISTS pgl_seq")
    eng.sql("CREATE TABLE pgl_t (k bigint)")
    n = eng.sql(
        "SELECT COUNT(*) AS n FROM pg_class WHERE relname = 'pgl_t'"
    ).collect()[0].n
    assert n == 1
    eng.sql("DROP TABLE pgl_t")
    n = eng.sql(
        "SELECT COUNT(*) AS n FROM pg_class WHERE relname = 'pgl_t'"
    ).collect()[0].n
    assert n == 0
    eng.sql("CREATE SEQUENCE pgl_seq START 7 INCREMENT BY 3")
    row = eng.sql(
        "SELECT start_value, increment_by, last_value FROM pg_sequences "
        "WHERE sequencename = 'pgl_seq'"
    ).collect()[0]
    assert (row.start_value, row.increment_by, row.last_value) == (7, 3, None)
    assert eng.sql("SELECT nextval('pgl_seq') AS v").collect()[0].v == 7
    row = eng.sql(
        "SELECT last_value FROM pg_sequences "
        "WHERE sequencename = 'pgl_seq'"
    ).collect()[0]
    assert row.last_value == 7


def test_pg_constraint_view(engine):
    """pg_constraint lists the engine's live constraints with PG contype
    codes ('c' check, 'f' fk, 'u' unique), joinable to pg_class."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS pgc_child")
    eng.sql("DROP TABLE IF EXISTS pgc_t")
    eng.sql("CREATE TABLE pgc_t (k bigint, v bigint, "
            "CONSTRAINT pgc_pk UNIQUE (k), "
            "CONSTRAINT pgc_pos CHECK (v > 0))")
    eng.sql("CREATE TABLE pgc_child (k bigint, "
            "CONSTRAINT pgc_fk FOREIGN KEY (k) REFERENCES pgc_t (k))")
    rows = {
        (r.conname, r.contype, r.relname)
        for r in eng.sql(
            "SELECT con.conname, con.contype, c.relname "
            "FROM pg_constraint con "
            "JOIN pg_class c ON c.oid = con.conrelid "
            "WHERE c.relname LIKE 'pgc_%'"
        ).collect()
    }
    assert ("pgc_pk", "u", "pgc_t") in rows
    assert ("pgc_pos", "c", "pgc_t") in rows
    assert ("pgc_fk", "f", "pgc_child") in rows


def test_savepoints(engine):
    """PG SAVEPOINT / ROLLBACK TO / RELEASE: partial rollback inside a
    transaction; the savepoint survives a rollback to it; RELEASE keeps
    the changes; later savepoints are discarded by ROLLBACK TO."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS svp")
    eng.sql("CREATE TABLE svp (k bigint)")
    eng.sql("INSERT INTO svp VALUES (1)")
    with _pytest.raises(ValueError, match="transaction blocks"):
        eng.sql("SAVEPOINT nope")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO svp VALUES (2)")
    eng.sql("SAVEPOINT a")
    eng.sql("INSERT INTO svp VALUES (3)")
    eng.sql("SAVEPOINT b")
    eng.sql("INSERT INTO svp VALUES (4)")
    assert {r.k for r in eng.sql("SELECT k FROM svp").collect()} == {1, 2, 3, 4}
    eng.sql("ROLLBACK TO SAVEPOINT a")  # undoes 3 and 4, discards b
    assert {r.k for r in eng.sql("SELECT k FROM svp").collect()} == {1, 2}
    with _pytest.raises(ValueError, match="does not exist"):
        eng.sql("ROLLBACK TO b")
    eng.sql("INSERT INTO svp VALUES (5)")
    eng.sql("ROLLBACK TO a")  # savepoint a itself survived
    assert {r.k for r in eng.sql("SELECT k FROM svp").collect()} == {1, 2}
    eng.sql("INSERT INTO svp VALUES (6)")
    eng.sql("RELEASE SAVEPOINT a")  # keeps 6, drops the savepoint
    with _pytest.raises(ValueError, match="does not exist"):
        eng.sql("ROLLBACK TO a")
    eng.sql("COMMIT")
    assert {r.k for r in eng.sql("SELECT k FROM svp").collect()} == {1, 2, 6}


def test_savepoint_dynamic_table(engine):
    """ROLLBACK TO undoes dynamic-table staged batches (and their schema
    extensions) back to the savepoint, keeping earlier staged batches."""
    eng = engine
    eng.sql("DROP TABLE IF EXISTS svd")
    eng.sql("CREATE TABLE svd ()")
    eng.sql("INSERT INTO svd SELECT 1 AS a")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO svd SELECT 2 AS a")
    eng.sql("SAVEPOINT s1")
    eng.sql("INSERT INTO svd SELECT 3 AS a, 'x' AS b")  # new column
    assert "b" in eng.sql("SELECT * FROM svd").columns
    eng.sql("ROLLBACK TO s1")
    assert "b" not in eng.sql("SELECT * FROM svd").columns
    assert {r.a for r in eng.sql("SELECT a FROM svd").collect()} == {1, 2}
    eng.sql("COMMIT")
    assert {r.a for r in eng.sql("SELECT a FROM svd").collect()} == {1, 2}


def test_create_table_like(engine):
    """PG CREATE TABLE (LIKE src): copies columns into an empty table;
    INCLUDING DEFAULTS / CONSTRAINTS / ALL copy those records too
    (neither is copied by default, as in PG)."""
    import pytest as _pytest

    eng = engine
    for t in ("lk_plain", "lk_all", "lk_src"):
        eng.sql(f"DROP TABLE IF EXISTS {t}")
    eng.sql("CREATE TABLE lk_src (k bigint, v bigint DEFAULT 7, "
            "CONSTRAINT lk_pos CHECK (v > 0))")
    eng.sql("CREATE TABLE lk_plain (LIKE lk_src)")
    assert eng.sql("SELECT * FROM lk_plain").columns == ["k", "v"]
    # no defaults copied: short INSERT leaves v NULL; no constraint either
    eng.sql("INSERT INTO lk_plain (k) VALUES (1)")
    assert eng.sql("SELECT v FROM lk_plain").collect()[0].v is None
    eng.sql("INSERT INTO lk_plain VALUES (2, -5)")  # no CHECK copied
    eng.sql("CREATE TABLE lk_all (LIKE lk_src INCLUDING ALL)")
    eng.sql("INSERT INTO lk_all (k) VALUES (1)")
    assert eng.sql("SELECT v FROM lk_all").collect()[0].v == 7
    with _pytest.raises(Exception):
        eng.sql("INSERT INTO lk_all VALUES (2, -5)")  # CHECK copied
    with _pytest.raises(ValueError, match="managed table"):
        eng.sql("CREATE TABLE lk_bad (LIKE no_such_table)")


def test_review_r9_fixes(engine):
    """Round-9 self-review regressions: (a) dynamic-table txn cursors
    survive ROLLBACK/COMMIT (eager status, self-pinned RETURNING);
    (b) EXPLAIN plans comment-prefixed queries; (c) pg_catalog.X
    qualified spelling works; (d) ALTER ADD PRIMARY KEY is atomic;
    (e) contype 'p' + attnotnull for primary keys, synthetic NOT NULL
    checks absent from pg_constraint."""
    import pytest as _pytest

    eng = engine
    # (a) dynamic-table cursor lifetime
    eng.sql("DROP TABLE IF EXISTS rvd")
    eng.sql("CREATE TABLE rvd ()")
    eng.sql("BEGIN")
    cur = eng.sql("INSERT INTO rvd SELECT 1 AS a")
    ret = eng.sql("INSERT INTO rvd SELECT 2 AS a RETURNING a")
    eng.sql("ROLLBACK")
    assert cur.collect()[0].inserted == 1  # post-rollback collect works
    assert ret.collect()[0].a == 2
    eng.sql("BEGIN")
    cur2 = eng.sql("INSERT INTO rvd SELECT 3 AS a")
    eng.sql("COMMIT")
    assert cur2.collect()[0].inserted == 1  # post-commit collect works
    # (b) comment-prefixed EXPLAIN
    assert eng.sql("EXPLAIN /* hint */ SELECT 1 AS one").collect()
    assert eng.sql("EXPLAIN -- note\nSELECT 1 AS one").collect()
    # (c) schema-qualified system tables
    eng.sql("DROP TABLE IF EXISTS rvq")
    eng.sql("CREATE TABLE rvq (k bigint)")
    n = eng.sql(
        "SELECT COUNT(*) AS n FROM pg_catalog.pg_class "
        "WHERE relname = 'rvq'"
    ).collect()[0].n
    assert n == 1
    # (d) atomic ALTER ADD PRIMARY KEY
    eng.sql("DROP TABLE IF EXISTS rva")
    eng.sql("CREATE TABLE rva (a bigint, b bigint)")
    eng.sql("INSERT INTO rva VALUES (1, NULL)")
    with _pytest.raises(Exception):
        eng.sql("ALTER TABLE rva ADD CONSTRAINT rva_pk PRIMARY KEY (a, b)")
    assert not eng.catalog.table_constraints.get("rva")  # no residue
    eng.sql("INSERT INTO rva VALUES (1, NULL)")  # no phantom constraints
    # (e) contype 'p' + attnotnull, synthetic checks hidden
    eng.sql("DROP TABLE IF EXISTS rvp")
    eng.sql("CREATE TABLE rvp (k bigint, CONSTRAINT rvp_pkey PRIMARY KEY (k))")
    rows = [tuple(r) for r in eng.sql(
        "SELECT conname, contype FROM pg_constraint con "
        "JOIN pg_class c ON c.oid = con.conrelid "
        "WHERE c.relname = 'rvp'"
    ).collect()]
    assert rows == [("rvp_pkey", "p")]
    att = eng.sql(
        "SELECT a.attnotnull FROM pg_attribute a "
        "JOIN pg_class c ON c.oid = a.attrelid "
        "WHERE c.relname = 'rvp' AND a.attname = 'k'"
    ).collect()[0].attnotnull
    assert att is True
    nn = eng.sql(
        "SELECT is_nullable FROM information_schema.columns "
        "WHERE table_name = 'rvp' AND column_name = 'k'"
    ).collect()[0].is_nullable
    assert nn == "NO"


def test_advice_r9_fixes(engine):
    """Round-10 ADVICE regressions: (a) plain LIKE always copies NOT NULL
    column constraints (PG TableLikeClause — not-null is part of the
    column definition, not gated behind INCLUDING CONSTRAINTS);
    (b) an unparseable LIKE clause raises instead of falling through to
    the typed-column parser; (c) pg_catalog.<non-view> raises a clear
    unsupported error rather than rewriting into an unresolved name;
    (d) pg_constraint oids survive a DROP CONSTRAINT that shifts the
    constraint list."""
    import pytest as _pytest

    eng = engine
    for t in ("adv_src", "adv_plain", "adv_oid"):
        eng.sql(f"DROP TABLE IF EXISTS {t}")
    # (a) NOT NULL copied on plain LIKE, CHECK is not
    eng.sql("CREATE TABLE adv_src (id bigint NOT NULL, "
            "v bigint CHECK (v > 0))")
    eng.sql("CREATE TABLE adv_plain (LIKE adv_src)")
    with _pytest.raises(Exception, match="not_null"):
        eng.sql("INSERT INTO adv_plain VALUES (NULL, 1)")
    eng.sql("INSERT INTO adv_plain VALUES (1, -5)")  # CHECK not copied
    # (b) unsupported LIKE spellings raise, no nonsense table appears
    with _pytest.raises(ValueError, match="LIKE"):
        eng.sql("CREATE TABLE adv_bad (LIKE adv_src EXCLUDING DEFAULTS)")
    with _pytest.raises(ValueError, match="LIKE"):
        eng.sql("CREATE TABLE adv_bad (LIKE adv_src, extra bigint)")
    assert "adv_bad" not in eng.catalog.tables
    # (c) only registered system views lose the pg_catalog qualifier
    with _pytest.raises(ValueError, match="pg_catalog.version"):
        eng.sql("SELECT pg_catalog.version()")
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM pg_catalog.pg_namespace"
    ).collect()[0].n >= 1
    # (d) stable oids: dropping the first constraint must not reassign
    # the survivor's oid to the dropped slot
    eng.sql("CREATE TABLE adv_oid (a bigint, b bigint, "
            "CHECK (a > 0), CHECK (b > 0))")
    before = {r.conname: r.oid for r in eng.sql(
        "SELECT conname, con.oid AS oid FROM pg_constraint con "
        "JOIN pg_class c ON c.oid = con.conrelid "
        "WHERE c.relname = 'adv_oid'").collect()}
    eng.sql("ALTER TABLE adv_oid DROP CONSTRAINT adv_oid_con1")
    after = {r.conname: r.oid for r in eng.sql(
        "SELECT conname, con.oid AS oid FROM pg_constraint con "
        "JOIN pg_class c ON c.oid = con.conrelid "
        "WHERE c.relname = 'adv_oid'").collect()}
    assert set(after) == set(before) - {"adv_oid_con1"}
    assert all(after[k] == before[k] for k in after)


def test_create_table_like_mixed_with_columns_raises(engine):
    """PG accepts LIKE alongside column definitions; this engine does
    not — but it must RAISE the clear unsupported error wherever the
    LIKE sits in the column list, never misparse a column named LIKE.
    A CHECK body containing the word LIKE must NOT trip the guard."""
    import pytest as _pytest

    eng = engine
    eng.sql("DROP TABLE IF EXISTS lkm_src")
    eng.sql("CREATE TABLE lkm_src (k bigint)")
    with _pytest.raises(ValueError, match="LIKE"):
        eng.sql("CREATE TABLE lkm_bad (extra bigint, LIKE lkm_src)")
    assert "lkm_bad" not in eng.catalog.tables
    # LIKE inside a constraint body is fine
    eng.sql("DROP TABLE IF EXISTS lkm_ok")
    eng.sql("CREATE TABLE lkm_ok (s string, CHECK (s LIKE 'a%'))")
    eng.sql("INSERT INTO lkm_ok VALUES ('abc')")
    with _pytest.raises(Exception):
        eng.sql("INSERT INTO lkm_ok VALUES ('zzz')")


def test_information_schema_fk_discovery(engine):
    """key_column_usage + referential_constraints reflect live
    constraint state: composite-PK ordinals, FK -> referenced unique
    constraint with delete_rule, and rows disappear with their table."""
    eng = engine
    for t in ("fkd_child", "fkd_parent"):
        eng.sql(f"DROP TABLE IF EXISTS {t}")
    eng.sql("CREATE TABLE fkd_parent (a bigint, b bigint, "
            "CONSTRAINT fkd_pk PRIMARY KEY (a, b))")
    eng.sql("CREATE TABLE fkd_child (x bigint UNIQUE, pa bigint, "
            "CONSTRAINT fkd_fk FOREIGN KEY (pa) REFERENCES fkd_parent (a))")
    kcu = [tuple(r) for r in eng.sql(
        "SELECT constraint_name, table_name, column_name, ordinal_position "
        "FROM information_schema.key_column_usage "
        "WHERE table_name LIKE 'fkd%' "
        "ORDER BY constraint_name, ordinal_position").collect()]
    assert kcu == [
        ("fkd_fk", "fkd_child", "pa", 1),
        ("fkd_pk", "fkd_parent", "a", 1),
        ("fkd_pk", "fkd_parent", "b", 2),
        ("x_key", "fkd_child", "x", 1),
    ]
    rc = [tuple(r) for r in eng.sql(
        "SELECT constraint_name, unique_constraint_name, delete_rule "
        "FROM information_schema.referential_constraints "
        "WHERE constraint_name = 'fkd_fk'").collect()]
    # fkd_fk references parent column a, whose unique constraint is the
    # COMPOSITE pk — no single-column unique matches, so the mapping is
    # NULL (PG would also have no single-column unique_constraint here)
    assert rc == [("fkd_fk", None, "RESTRICT")]
    eng.sql("DROP TABLE fkd_child")
    assert eng.sql(
        "SELECT COUNT(*) AS n FROM information_schema.key_column_usage "
        "WHERE table_name = 'fkd_child'").collect()[0].n == 0


# -- data-modifying CTEs (PG wCTE; reference txn statement surface) ----------


def test_wcte_move_rows(engine):
    """The canonical PG pattern: DELETE ... RETURNING feeding an INSERT."""
    engine.execute_sql("CREATE TABLE src AS SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')) AS t(id, v)")
    engine.execute_sql("CREATE TABLE arch AS SELECT CAST(0 AS INT) AS id, 'x' AS v WHERE 1=0")
    engine.execute_sql(
        "WITH moved AS (DELETE FROM src WHERE id > 2 RETURNING id, v) "
        "INSERT INTO arch SELECT id, v FROM moved"
    )
    assert sorted(engine.execute_sql("SELECT id FROM src").fetchall()) == [(1,), (2,)]
    assert sorted(engine.execute_sql("SELECT id, v FROM arch").fetchall()) == [(3, "c"), (4, "d")]


def test_wcte_snapshot_isolation(engine):
    """The main SELECT sees the PRE-modification state of the written table."""
    engine.execute_sql("CREATE TABLE w AS SELECT * FROM (VALUES (1, 10), (2, 20)) AS t(k, amt)")
    rows = sorted(engine.execute_sql(
        "WITH upd AS (UPDATE w SET amt = amt + 100 WHERE k = 1 RETURNING k, amt) "
        "SELECT u.k, u.amt AS new_amt, w.amt AS old_amt FROM upd u JOIN w ON w.k = u.k"
    ).fetchall())
    assert rows == [(1, 110, 10)]
    # post-statement the table shows the committed update
    assert sorted(engine.execute_sql("SELECT amt FROM w ORDER BY k").fetchall()) == [(20,), (110,)]


def test_wcte_unreferenced_still_executes(engine):
    engine.execute_sql("CREATE TABLE w2 AS SELECT * FROM (VALUES (1), (2)) AS t(k)")
    rows = engine.execute_sql(
        "WITH gone AS (DELETE FROM w2 WHERE k = 2) SELECT 42 AS answer"
    ).fetchall()
    assert rows == [(42,)]
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM w2").value("n", 0) == 1


def test_wcte_multiple_dml_plus_plain(engine):
    engine.execute_sql("CREATE TABLE a1 AS SELECT * FROM (VALUES (1, 5), (2, 6)) AS t(k, v)")
    engine.execute_sql("CREATE TABLE b1 AS SELECT * FROM (VALUES (7), (8)) AS t(v)")
    rows = sorted(engine.execute_sql(
        "WITH ins AS (INSERT INTO b1 VALUES (9) RETURNING v), "
        "     upd AS (UPDATE a1 SET v = v * 10 WHERE k = 1 RETURNING v), "
        "     plain AS (SELECT 100 AS v) "
        "SELECT v FROM ins UNION ALL SELECT v FROM upd UNION ALL SELECT v FROM plain"
    ).fetchall())
    assert rows == [(9,), (50,), (100,)]


def test_wcte_refusals(engine):
    engine.execute_sql("CREATE TABLE r1 AS SELECT 1 AS k")
    engine.execute_sql("CREATE TABLE r2 AS SELECT 1 AS k")
    with pytest.raises(ValueError, match="at most one"):
        engine.execute_sql(
            "WITH a AS (DELETE FROM r1 WHERE k=1 RETURNING k), "
            "b AS (UPDATE r1 SET k=2 RETURNING k) SELECT 1"
        )
    with pytest.raises(ValueError, match="modified by both"):
        engine.execute_sql(
            "WITH a AS (DELETE FROM r1 WHERE k=9 RETURNING k) "
            "UPDATE r1 SET k = 3"
        )
    with pytest.raises(ValueError, match="shadows"):
        engine.execute_sql(
            "WITH r2 AS (DELETE FROM r1 WHERE k=9 RETURNING k) SELECT * FROM r2"
        )


def test_wcte_explain_does_not_mutate(engine):
    engine.execute_sql("CREATE TABLE e1 AS SELECT * FROM (VALUES (1), (2)) AS t(k)")
    engine.execute_sql(
        "EXPLAIN WITH gone AS (DELETE FROM e1 WHERE k = 1 RETURNING k) "
        "SELECT COUNT(*) AS n FROM gone"
    ).fetchall()
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM e1").value("n", 0) == 2


def test_wcte_in_transaction_rollback(engine):
    engine.execute_sql("CREATE TABLE tx1 AS SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS t(k, v)")
    engine.execute_sql("BEGIN")
    rows = engine.execute_sql(
        "WITH d AS (DELETE FROM tx1 WHERE k = 2 RETURNING k, v) SELECT k FROM d"
    ).fetchall()
    assert rows == [(2,)]
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM tx1").value("n", 0) == 1
    engine.execute_sql("ROLLBACK")
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM tx1").value("n", 0) == 2


def test_wcte_plain_select_with_untouched(engine):
    """An all-SELECT WITH must stay on the spark.sql fast path."""
    rows = engine.execute_sql(
        "WITH x AS (SELECT 1 AS a), y AS (SELECT a + 1 AS b FROM x) SELECT b FROM y"
    ).fetchall()
    assert rows == [(2,)]


# -- PG server-side cursors (DECLARE / FETCH / MOVE / CLOSE) ------------------


def test_cursor_fetch_sequence(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DECLARE cur NO SCROLL CURSOR FOR "
        "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey"
    )
    assert engine.execute_sql("FETCH 3 FROM cur").fetchall() == [(0,), (1,), (2,)]
    assert engine.execute_sql("FETCH NEXT FROM cur").fetchall() == [(3,)]
    # MOVE advances without returning rows
    assert engine.execute_sql("MOVE FORWARD 2 cur").fetchall() == [(2,)]
    assert engine.execute_sql("FETCH FORWARD 2 FROM cur").fetchall() == [(6,), (7,)]
    rest = engine.execute_sql("FETCH ALL FROM cur").fetchall()
    assert rest[0] == (8,) and rest[-1] == (24,)
    # exhausted: further fetches return nothing
    assert engine.execute_sql("FETCH 5 FROM cur").fetchall() == []
    engine.execute_sql("CLOSE cur")
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute_sql("FETCH 1 FROM cur")
    engine.execute_sql("COMMIT")


def test_cursor_requires_txn_unless_hold(engine):
    with pytest.raises(ValueError, match="transaction blocks"):
        engine.execute_sql("DECLARE c1 CURSOR FOR SELECT 1 AS x")
    engine.execute_sql(
        "DECLARE c1 CURSOR WITH HOLD FOR SELECT 1 AS x"
    )
    assert engine.execute_sql("FETCH ALL FROM c1").fetchall() == [(1,)]
    engine.execute_sql("CLOSE c1")


def test_cursor_closed_at_txn_end(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql("DECLARE c2 CURSOR FOR SELECT 1 AS x")
    engine.execute_sql(
        "DECLARE c3 CURSOR WITH HOLD FOR SELECT 2 AS x"
    )
    engine.execute_sql("COMMIT")
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute_sql("FETCH 1 FROM c2")
    # WITH HOLD survives the transaction
    assert engine.execute_sql("FETCH ALL FROM c3").fetchall() == [(2,)]
    engine.execute_sql("CLOSE ALL")


def test_cursor_scroll_vs_noscroll(engine):
    """SCROLL is now supported (round 11) — a scroll cursor serves
    PRIOR while the NO SCROLL default still refuses backward fetch."""
    engine.execute_sql("BEGIN")
    engine.execute_sql("DECLARE sc SCROLL CURSOR FOR SELECT 1 AS x")
    assert engine.execute_sql("FETCH NEXT FROM sc").fetchall() == [(1,)]
    assert engine.execute_sql("FETCH PRIOR FROM sc").fetchall() == []
    engine.execute_sql("DECLARE ns CURSOR FOR SELECT 1 AS x")
    with pytest.raises(ValueError, match="forward"):
        engine.execute_sql("FETCH PRIOR FROM ns")
    engine.execute_sql("ROLLBACK")


# -- FK ON DELETE SET NULL (reference test_sql_features::fk_set_null) ---------


def test_fk_set_null(engine):
    engine.execute_sql("CREATE TABLE snp (id BIGINT, val STRING)")
    engine.execute_sql(
        "CREATE TABLE snc (id BIGINT, parent_id BIGINT, "
        "CONSTRAINT fk_setnull FOREIGN KEY (parent_id) "
        "REFERENCES snp (id) ON DELETE SET NULL)"
    )
    engine.execute_sql("INSERT INTO snp VALUES (1, 'p1'), (2, 'p2')")
    engine.execute_sql(
        "INSERT INTO snc VALUES (10, 1), (11, 1), (12, 2)"
    )
    engine.execute_sql("DELETE FROM snp WHERE id = 1")
    rows = sorted(engine.execute_sql("SELECT id, parent_id FROM snc").fetchall())
    assert rows == [(10, None), (11, None), (12, 2)]
    # the rule is visible in information_schema
    dr = engine.execute_sql(
        "SELECT delete_rule FROM information_schema.referential_constraints "
        "WHERE constraint_name = 'fk_setnull'"
    ).fetchall()
    assert dr == [("SET NULL",)]


def test_fk_set_null_rollback_restores_fk(engine):
    """Reference fk_set_null_rollback_restores_fk: the SET NULL child
    mutation participates in the parent's transaction."""
    engine.execute_sql("CREATE TABLE snp2 (id BIGINT)")
    engine.execute_sql(
        "CREATE TABLE snc2 (id BIGINT, parent_id BIGINT, "
        "CONSTRAINT fk_sn2 FOREIGN KEY (parent_id) "
        "REFERENCES snp2 (id) ON DELETE SET NULL)"
    )
    engine.execute_sql("INSERT INTO snp2 VALUES (1)")
    engine.execute_sql("INSERT INTO snc2 VALUES (10, 1)")
    engine.execute_sql("BEGIN")
    engine.execute_sql("DELETE FROM snp2 WHERE id = 1")
    assert engine.execute_sql(
        "SELECT parent_id FROM snc2"
    ).fetchall() == [(None,)]
    engine.execute_sql("ROLLBACK")
    assert engine.execute_sql(
        "SELECT parent_id FROM snc2"
    ).fetchall() == [(1,)]
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM snp2").value("n", 0) == 1


# -- transactional DDL (reference ddl_inside_explicit_txn_transactional) ------


def test_create_table_in_txn_commit(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql("CREATE TABLE txt2 (id BIGINT)")
    engine.execute_sql("INSERT INTO txt2 VALUES (1), (2), (3)")
    # self-write: the txn sees its own table and rows before COMMIT
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM txt2").value("n", 0) == 3
    engine.execute_sql("COMMIT")
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM txt2").value("n", 0) == 3


def test_create_table_in_txn_rollback_discards(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql("CREATE TABLE txt3 (id BIGINT)")
    engine.execute_sql("INSERT INTO txt3 VALUES (1)")
    engine.execute_sql("ROLLBACK")
    with pytest.raises(Exception):
        engine.execute_sql("SELECT * FROM txt3").fetchall()


def test_create_table_after_savepoint_rollback_to(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql("CREATE TABLE sp_a (id BIGINT)")
    engine.execute_sql("SAVEPOINT s1")
    engine.execute_sql("CREATE TABLE sp_b (id BIGINT)")
    engine.execute_sql("ROLLBACK TO s1")
    # sp_b (created after the savepoint) is gone; sp_a survives the txn
    with pytest.raises(Exception):
        engine.execute_sql("SELECT * FROM sp_b").fetchall()
    engine.execute_sql("INSERT INTO sp_a VALUES (7)")
    engine.execute_sql("COMMIT")
    assert engine.execute_sql("SELECT id FROM sp_a").fetchall() == [(7,)]


def test_ctas_in_txn_rollback(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "CREATE TABLE txt4 AS SELECT n_nationkey FROM nation WHERE n_nationkey < 3"
    )
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM txt4").value("n", 0) == 3
    engine.execute_sql("ROLLBACK")
    with pytest.raises(Exception):
        engine.execute_sql("SELECT * FROM txt4").fetchall()


# -- self-review r10 fixes ----------------------------------------------------


def test_wcte_plain_cte_feeds_dml(engine):
    """A DML sub-statement may reference a PRECEDING plain CTE even when
    the main statement is a SELECT (review r10 #1)."""
    engine.execute_sql("CREATE TABLE pr1 AS SELECT * FROM (VALUES (1), (2), (3)) AS t(id)")
    rows = engine.execute_sql(
        "WITH keys AS (SELECT 1 AS k), "
        "moved AS (DELETE FROM pr1 WHERE id IN (SELECT k FROM keys) "
        "RETURNING id) "
        "SELECT id FROM moved"
    ).fetchall()
    assert rows == [(1,)]
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM pr1").value("n", 0) == 2


def test_commit_after_drop_of_staged_table(engine):
    """COMMIT must not KeyError when a staged table was dropped in-txn
    (review r10 #2)."""
    engine.execute_sql("CREATE TABLE cd1 (id BIGINT)")
    engine.execute_sql("BEGIN")
    engine.execute_sql("INSERT INTO cd1 VALUES (1)")
    engine.execute_sql("DROP TABLE cd1")
    engine.execute_sql("COMMIT")  # must not raise
    with pytest.raises(Exception):
        engine.execute_sql("SELECT * FROM cd1").fetchall()


def test_holdable_cursor_dies_with_aborted_txn(engine):
    """PG removes WITH HOLD cursors when their creating txn aborts
    (review r10 #3)."""
    engine.execute_sql("CREATE TABLE hc1 AS SELECT 1 AS id")
    engine.execute_sql("BEGIN")
    engine.execute_sql("INSERT INTO hc1 VALUES (99)")
    engine.execute_sql(
        "DECLARE hc CURSOR WITH HOLD FOR SELECT id FROM hc1"
    )
    engine.execute_sql("ROLLBACK")
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute_sql("FETCH ALL FROM hc")
    # a holdable cursor created BEFORE the txn survives its rollback
    engine.execute_sql("DECLARE hc2 CURSOR WITH HOLD FOR SELECT id FROM hc1")
    engine.execute_sql("BEGIN")
    engine.execute_sql("ROLLBACK")
    assert engine.execute_sql("FETCH ALL FROM hc2").fetchall() == [(1,)]
    engine.execute_sql("CLOSE hc2")


def test_cursor_closed_by_rollback_to_savepoint(engine):
    """Cursors declared after a savepoint close on ROLLBACK TO it
    (review r10 #6)."""
    engine.execute_sql("BEGIN")
    engine.execute_sql("DECLARE c_pre CURSOR FOR SELECT 1 AS x")
    engine.execute_sql("SAVEPOINT s1")
    engine.execute_sql("DECLARE c_post CURSOR FOR SELECT 2 AS x")
    engine.execute_sql("ROLLBACK TO s1")
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute_sql("FETCH ALL FROM c_post")
    assert engine.execute_sql("FETCH ALL FROM c_pre").fetchall() == [(1,)]
    engine.execute_sql("COMMIT")


def test_cursor_direction_edge_cases(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DECLARE dc NO  SCROLL CURSOR FOR "
        "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey"
    )
    # positive RELATIVE n is forward-legal on NO SCROLL (PG)
    assert engine.execute_sql("FETCH RELATIVE 3 FROM dc").fetchall() == [(2,)]
    with pytest.raises(ValueError, match="SCROLL"):
        engine.execute_sql("FETCH FIRST FROM dc")
    # forward ABSOLUTE n (past the current position) is PG-legal on NO
    # SCROLL (ADVICE r10): position is 3, so ABSOLUTE 5 yields row 5
    assert engine.execute_sql("FETCH ABSOLUTE 5 FROM dc").fetchall() == [(4,)]
    # at-or-before the current position requires SCROLL
    with pytest.raises(ValueError, match="SCROLL"):
        engine.execute_sql("FETCH ABSOLUTE 5 FROM dc")
    with pytest.raises(ValueError, match="SCROLL"):
        engine.execute_sql("FETCH ABSOLUTE 2 FROM dc")
    with pytest.raises(ValueError, match="SCROLL"):
        engine.execute_sql("FETCH ABSOLUTE -1 FROM dc")
    # the refused ABSOLUTE did not move the cursor
    assert engine.execute_sql("FETCH NEXT FROM dc").fetchall() == [(5,)]
    engine.execute_sql("ROLLBACK")


def test_move_all_streams_and_counts(engine):
    """MOVE ALL drains with a counting loop (never a driver-side list,
    ADVICE r10) and reports the rows passed over; MOVE n then FETCH
    continues from the right position."""
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DECLARE mc CURSOR FOR "
        "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey"
    )
    assert engine.execute_sql("MOVE 3 FROM mc").fetchall() == [(3,)]
    assert engine.execute_sql("FETCH NEXT FROM mc").fetchall() == [(3,)]
    moved = engine.execute_sql("MOVE ALL FROM mc").fetchall()
    assert moved == [(21,)]  # 25 nations - 4 consumed
    assert engine.execute_sql("FETCH NEXT FROM mc").fetchall() == []
    assert engine.execute_sql("MOVE ALL FROM mc").fetchall() == [(0,)]
    engine.execute_sql("ROLLBACK")


# -- engine reopen persistence (reference test_persistence.cpp) ----------------


def test_reopen_rediscovers_catalog(spark, tmp_path, sf_dir):
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.register_corpus(sf_dir)
    e1.execute_sql("CREATE SEQUENCE rs START 100")
    e1.execute_sql(
        "CREATE TABLE rp (id BIGINT DEFAULT nextval('rs'), v BIGINT, "
        "CONSTRAINT rp_pos CHECK (v > 0))"
    )
    e1.execute_sql("INSERT INTO rp (v) VALUES (1), (2)")
    e1.execute_sql("CREATE VIEW rv AS SELECT v * 10 AS v10 FROM rp")
    e1.execute_sql(
        "CREATE MATERIALIZED VIEW rmv AS SELECT COUNT(*) AS n FROM rp"
    )
    e1.execute_sql("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    # simulate a fresh session's view state
    for v in ("rp", "rv", "rmv"):
        spark.catalog.dropTempView(v)

    e2 = Engine(spark, table_dir=str(tmp_path))
    # table + rows
    assert sorted(e2.execute_sql("SELECT v FROM rp").fetchall()) == [(1,), (2,)]
    # constraint survives
    import pytest as _pt
    with _pt.raises(Exception, match="rp_pos"):
        e2.execute_sql("INSERT INTO rp (v) VALUES (-1)")
    # sequence continues after reopen with NO id reuse; the failed
    # INSERT above burned one value (PG sequences are non-transactional
    # — a rolled-back insert leaves a gap)
    e2.execute_sql("INSERT INTO rp (v) VALUES (3)")
    ids = sorted(r[0] for r in e2.execute_sql("SELECT id FROM rp").fetchall())
    assert ids == [100, 101, 103]
    # plain view + matview visible
    assert sorted(e2.execute_sql("SELECT v10 FROM rv").fetchall()) == [
        (10,), (20,), (30,)]
    assert e2.execute_sql("SELECT n FROM rmv").fetchall() == [(2,)]
    e2.execute_sql("REFRESH MATERIALIZED VIEW rmv")
    assert e2.execute_sql("SELECT n FROM rmv").fetchall() == [(3,)]
    # enum type usable in new DDL
    e2.execute_sql("CREATE TABLE rm (m mood)")
    e2.execute_sql("INSERT INTO rm VALUES ('ok')")
    with _pt.raises(Exception):
        e2.execute_sql("INSERT INTO rm VALUES ('angry')")


def test_reopen_dynamic_table(spark, tmp_path):
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql("CREATE TABLE dt ()")
    e1.execute_sql("INSERT INTO dt SELECT 1 AS a, 'x' AS b")
    spark.catalog.dropTempView("dt")
    e2 = Engine(spark, table_dir=str(tmp_path))
    assert e2.execute_sql("SELECT a, b FROM dt").fetchall() == [(1, "x")]


def test_views_are_late_binding(engine):
    """PG views see the tables' CURRENT state (review r10 follow-up:
    Spark temp views freeze the file listing at analysis; the engine
    re-registers stored view SQL at each statement boundary)."""
    engine.execute_sql("CREATE TABLE lb (v BIGINT)")
    engine.execute_sql("INSERT INTO lb VALUES (1)")
    engine.execute_sql("CREATE VIEW lbv AS SELECT SUM(v) AS s FROM lb")
    assert engine.execute_sql("SELECT s FROM lbv").fetchall() == [(1,)]
    engine.execute_sql("INSERT INTO lb VALUES (10)")
    assert engine.execute_sql("SELECT s FROM lbv").fetchall() == [(11,)]
    engine.execute_sql("UPDATE lb SET v = v * 2 WHERE v = 10")
    assert engine.execute_sql("SELECT s FROM lbv").fetchall() == [(21,)]


# -- positioned DML: WHERE CURRENT OF ------------------------------------------


def test_where_current_of_update_delete(engine):
    engine.execute_sql(
        "CREATE TABLE pc AS SELECT * FROM "
        "(VALUES (1, 10), (2, 20), (3, 30), (4, 40)) AS t(k, v)"
    )
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DECLARE pcur CURSOR FOR SELECT k, v FROM pc ORDER BY k"
    )
    engine.execute_sql("FETCH 2 FROM pcur")  # positioned on k=2
    engine.execute_sql("UPDATE pc SET v = v + 100 WHERE CURRENT OF pcur")
    # PG follows the update chain: a second positioned UPDATE re-updates
    engine.execute_sql("UPDATE pc SET v = v + 1000 WHERE CURRENT OF pcur")
    engine.execute_sql("FETCH NEXT FROM pcur")  # k=3
    ret = engine.execute_sql(
        "DELETE FROM pc WHERE CURRENT OF pcur RETURNING k, v"
    ).fetchall()
    assert ret == [(3, 30)]
    # deleted under the cursor: further positioned DML errors
    with pytest.raises(ValueError, match="not positioned"):
        engine.execute_sql("DELETE FROM pc WHERE CURRENT OF pcur")
    engine.execute_sql("COMMIT")
    rows = sorted(engine.execute_sql("SELECT k, v FROM pc").fetchall())
    assert rows == [(1, 10), (2, 1120), (4, 40)]


def test_where_current_of_duplicates_one_instance(engine):
    """Among exact duplicate rows, positioned DELETE removes exactly ONE
    instance (PG deletes one physical tuple)."""
    engine.execute_sql(
        "CREATE TABLE pdup AS SELECT * FROM "
        "(VALUES (1, 'x'), (1, 'x'), (1, 'x')) AS t(k, v)"
    )
    engine.execute_sql(
        "DECLARE dcur CURSOR WITH HOLD FOR SELECT k, v FROM pdup"
    )
    engine.execute_sql("FETCH 1 FROM dcur")
    engine.execute_sql("DELETE FROM pdup WHERE CURRENT OF dcur")
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM pdup").value("n", 0) == 2
    engine.execute_sql("CLOSE dcur")


def test_where_current_of_refusals(engine):
    engine.execute_sql("CREATE TABLE pr2 AS SELECT 1 AS k")
    engine.execute_sql("BEGIN")
    # not a simply-updatable scan (expression select list)
    engine.execute_sql(
        "DECLARE ncur CURSOR FOR SELECT k + 1 AS k2 FROM pr2"
    )
    with pytest.raises(ValueError, match="simply updatable"):
        engine.execute_sql("DELETE FROM pr2 WHERE CURRENT OF ncur")
    # updatable cursor but not yet positioned
    engine.execute_sql("DECLARE ucur CURSOR FOR SELECT k FROM pr2")
    with pytest.raises(ValueError, match="not positioned"):
        engine.execute_sql("DELETE FROM pr2 WHERE CURRENT OF ucur")
    engine.execute_sql("ROLLBACK")


def test_where_current_of_txn_rollback(engine):
    engine.execute_sql("CREATE TABLE ptx AS SELECT * FROM (VALUES (1), (2)) AS t(k)")
    engine.execute_sql("BEGIN")
    engine.execute_sql("DECLARE tcur CURSOR FOR SELECT k FROM ptx ORDER BY k")
    engine.execute_sql("FETCH 1 FROM tcur")
    engine.execute_sql("DELETE FROM ptx WHERE CURRENT OF tcur")
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM ptx").value("n", 0) == 1
    engine.execute_sql("ROLLBACK")
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM ptx").value("n", 0) == 2


# -- self-review r10 batch-2 fixes ---------------------------------------------


def test_positioned_delete_respects_fk(engine):
    engine.execute_sql("CREATE TABLE fkp (k BIGINT)")
    engine.execute_sql(
        "CREATE TABLE fkc (id BIGINT, pk BIGINT, CONSTRAINT fkc_fk "
        "FOREIGN KEY (pk) REFERENCES fkp (k))"
    )
    engine.execute_sql("INSERT INTO fkp VALUES (1), (2)")
    engine.execute_sql("INSERT INTO fkc VALUES (10, 1)")
    engine.execute_sql(
        "DECLARE fcur CURSOR WITH HOLD FOR SELECT k FROM fkp ORDER BY k"
    )
    engine.execute_sql("FETCH 1 FROM fcur")  # positioned on k=1 (referenced)
    from otterbrix_spark.operators.dml import ConstraintViolation
    with pytest.raises(ConstraintViolation):
        engine.execute_sql("DELETE FROM fkp WHERE CURRENT OF fcur")
    # the failed delete keeps the position (review fix: no premature clear)
    engine.execute_sql("FETCH 1 FROM fcur")  # k=2, unreferenced
    engine.execute_sql("DELETE FROM fkp WHERE CURRENT OF fcur")
    assert sorted(engine.execute_sql("SELECT k FROM fkp").fetchall()) == [(1,)]
    engine.execute_sql("CLOSE fcur")


def test_positioned_update_set_default(engine):
    engine.execute_sql("CREATE TABLE pdflt (k BIGINT, v BIGINT DEFAULT 77)")
    engine.execute_sql("INSERT INTO pdflt VALUES (1, 5)")
    engine.execute_sql(
        "DECLARE dcur2 CURSOR WITH HOLD FOR SELECT k, v FROM pdflt"
    )
    engine.execute_sql("FETCH 1 FROM dcur2")
    engine.execute_sql("UPDATE pdflt SET v = DEFAULT WHERE CURRENT OF dcur2")
    assert engine.execute_sql("SELECT v FROM pdflt").fetchall() == [(77,)]
    engine.execute_sql("CLOSE dcur2")


def test_fetch_zero_keeps_position(engine):
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DECLARE zc CURSOR FOR SELECT n_nationkey AS k FROM nation "
        "ORDER BY n_nationkey"
    )
    engine.execute_sql("FETCH 2 FROM zc")  # positioned on k=1
    # PG: FETCH 0 re-fetches the current row without moving
    assert engine.execute_sql("FETCH 0 FROM zc").fetchall() == [(1,)]
    assert engine.execute_sql("FETCH 1 FROM zc").fetchall() == [(2,)]
    engine.execute_sql("ROLLBACK")


def test_explain_positioned_dml_no_mutation(engine):
    engine.execute_sql("CREATE TABLE epd AS SELECT * FROM (VALUES (1), (2)) AS t(k)")
    engine.execute_sql(
        "DECLARE ecur CURSOR WITH HOLD FOR SELECT k FROM epd ORDER BY k"
    )
    engine.execute_sql("FETCH 1 FROM ecur")
    engine.execute_sql("EXPLAIN DELETE FROM epd WHERE CURRENT OF ecur").fetchall()
    # neither the table nor the cursor position changed
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM epd").value("n", 0) == 2
    engine.execute_sql("DELETE FROM epd WHERE CURRENT OF ecur")
    assert sorted(engine.execute_sql("SELECT k FROM epd").fetchall()) == [(2,)]
    engine.execute_sql("CLOSE ecur")


def test_reopen_with_view_over_dropped_table(spark, tmp_path):
    """A persisted view whose dependency vanished must not make the
    engine unconstructible (review r10 batch 2 #1)."""
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql("CREATE TABLE vt (v BIGINT)")
    e1.execute_sql("CREATE VIEW vv AS SELECT v FROM vt")
    e1.execute_sql("DROP TABLE vt")
    spark.catalog.dropTempView("vv")
    e2 = Engine(spark, table_dir=str(tmp_path))  # must not raise
    # recreating the dependency heals the view at the next boundary
    e2.execute_sql("CREATE TABLE vt (v BIGINT)")
    e2.execute_sql("INSERT INTO vt VALUES (9)")
    assert e2.execute_sql("SELECT v FROM vv").fetchall() == [(9,)]


def test_upsert_do_update_where(engine):
    """PG conditional upsert: conflicting rows failing the DO UPDATE
    WHERE are neither updated nor inserted (old row stays)."""
    engine.execute_sql("CREATE TABLE cu (k BIGINT UNIQUE, v BIGINT)")
    engine.execute_sql("INSERT INTO cu VALUES (1, 10), (2, 20)")
    ret = engine.execute_sql(
        "INSERT INTO cu VALUES (1, 99), (2, 5), (3, 30) "
        "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v "
        "WHERE cu.v < 15 RETURNING k, v"
    ).fetchall()
    # k=1 (v=10 < 15): updated to 99; k=2 (v=20): kept; k=3: inserted
    assert sorted(ret) == [(1, 99), (3, 30)]
    assert sorted(engine.execute_sql("SELECT k, v FROM cu").fetchall()) == [
        (1, 99), (2, 20), (3, 30)]
    # EXCLUDED references in the WHERE work too
    engine.execute_sql(
        "INSERT INTO cu VALUES (2, 999) ON CONFLICT (k) "
        "DO UPDATE SET v = EXCLUDED.v WHERE EXCLUDED.v > cu.v"
    )
    assert sorted(engine.execute_sql("SELECT k, v FROM cu").fetchall()) == [
        (1, 99), (2, 999), (3, 30)]
    # a subquery WHERE inside a SET expression must not be split
    engine.execute_sql(
        "INSERT INTO cu VALUES (3, 1) ON CONFLICT (k) DO UPDATE SET "
        "v = (SELECT MAX(v) FROM (VALUES (7), (8)) AS t(v) WHERE v > 0)"
    )
    assert (3, 8) in engine.execute_sql("SELECT k, v FROM cu").fetchall()
    with pytest.raises(ValueError, match="no WHERE"):
        engine.execute_sql(
            "INSERT INTO cu VALUES (9, 9) ON CONFLICT (k) "
            "DO NOTHING WHERE cu.v > 0"
        )


def test_upsert_on_constraint_and_bare(engine):
    engine.execute_sql(
        "CREATE TABLE oc (a BIGINT, b BIGINT, v BIGINT, "
        "CONSTRAINT oc_a UNIQUE (a), CONSTRAINT oc_b UNIQUE (b))"
    )
    engine.execute_sql("INSERT INTO oc VALUES (1, 10, 100), (2, 20, 200)")
    # named-arbiter form
    engine.execute_sql(
        "INSERT INTO oc VALUES (1, 99, 111) ON CONFLICT ON CONSTRAINT "
        "oc_a DO UPDATE SET v = EXCLUDED.v"
    )
    assert (1, 10, 111) in engine.execute_sql("SELECT * FROM oc").fetchall()
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute_sql(
            "INSERT INTO oc VALUES (5, 5, 5) ON CONFLICT ON CONSTRAINT "
            "nope DO NOTHING"
        )
    # bare form: a row conflicting on ANY unique constraint is skipped
    engine.execute_sql(
        "INSERT INTO oc VALUES (3, 10, 300), (4, 40, 400) "
        "ON CONFLICT DO NOTHING"
    )  # (3, 10, ...) conflicts on b=10 -> skipped; (4, 40) inserts
    rows = sorted(engine.execute_sql("SELECT a, b FROM oc").fetchall())
    assert rows == [(1, 10), (2, 20), (4, 40)]
    # bare ON CONFLICT with DO UPDATE is an error (PG requires a target)
    with pytest.raises(ValueError, match="inference"):
        engine.execute_sql(
            "INSERT INTO oc VALUES (9, 9, 9) ON CONFLICT "
            "DO UPDATE SET v = 1"
        )


def test_delete_using(engine):
    """PG join-delete: DELETE FROM t USING src WHERE <join cond>."""
    engine.execute_sql("CREATE TABLE du_t AS SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(k, v)")
    engine.execute_sql("CREATE TABLE du_s AS SELECT * FROM (VALUES (2), (3), (3)) AS t(k)")
    ret = engine.execute_sql(
        "DELETE FROM du_t USING du_s WHERE du_t.k = du_s.k RETURNING k, v"
    ).fetchall()
    # multiple source matches (k=3 twice) delete the row ONCE
    assert sorted(ret) == [(2, "b"), (3, "c")]
    assert engine.execute_sql("SELECT k FROM du_t").fetchall() == [(1,)]


def test_delete_using_aliases_and_txn(engine):
    engine.execute_sql("CREATE TABLE du2 AS SELECT * FROM (VALUES (1), (2)) AS t(k)")
    engine.execute_sql("CREATE TABLE du2s AS SELECT * FROM (VALUES (2)) AS t(m)")
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DELETE FROM du2 AS a USING du2s AS b WHERE a.k = b.m"
    )
    assert engine.execute_sql("SELECT k FROM du2").fetchall() == [(1,)]
    engine.execute_sql("ROLLBACK")
    assert sorted(engine.execute_sql("SELECT k FROM du2").fetchall()) == [(1,), (2,)]


def test_update_from_subquery_source(engine):
    engine.execute_sql("CREATE TABLE sq_t AS SELECT * FROM (VALUES (1, 0), (2, 0), (3, 0)) AS t(k, v)")
    engine.execute_sql(
        "UPDATE sq_t SET v = s.nv FROM (SELECT 1 AS sk, 10 AS nv "
        "UNION ALL SELECT 3, 30) AS s WHERE sq_t.k = s.sk"
    )
    assert sorted(engine.execute_sql("SELECT k, v FROM sq_t").fetchall()) == [
        (1, 10), (2, 0), (3, 30)]


def test_delete_using_subquery_source(engine):
    engine.execute_sql("CREATE TABLE sq_d AS SELECT * FROM (VALUES (1), (2), (3), (4)) AS t(k)")
    ret = engine.execute_sql(
        "DELETE FROM sq_d USING (SELECT k AS dk FROM sq_d WHERE k > 2) "
        "AS s WHERE sq_d.k = s.dk RETURNING k"
    ).fetchall()
    assert sorted(ret) == [(3,), (4,)]
    assert sorted(engine.execute_sql("SELECT k FROM sq_d").fetchall()) == [(1,), (2,)]


# -- declarative partitioning (PARTITION BY -> hive directory layout) ---------


def test_partitioned_table_roundtrip(spark, tmp_path, sf_dir):
    import glob
    e = Engine(spark, table_dir=str(tmp_path))
    e.register_corpus(sf_dir)
    e.execute_sql(
        "CREATE TABLE pt_part (k BIGINT, seg STRING, v BIGINT) "
        "PARTITION BY LIST (seg)"
    )
    e.execute_sql(
        "INSERT INTO pt_part SELECT c_custkey, c_mktsegment, "
        "CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) FROM customer"
    )
    # hive layout on disk
    dirs = glob.glob(str(tmp_path / "pt_part" / "seg=*"))
    assert len(dirs) >= 3, dirs
    # declared column ORDER survives the partitioned read
    assert [f[0] for f in e.sql("SELECT * FROM pt_part LIMIT 1").dtypes] == [
        "k", "seg", "v"]
    n = e.execute_sql("SELECT COUNT(*) AS n FROM pt_part").value("n", 0)
    assert n > 0
    # partition pruning: the filter appears as a PartitionFilter
    plan = e.sql(
        "SELECT COUNT(*) AS n FROM pt_part WHERE seg = 'BUILDING'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "seg" in plan.split(
        "PartitionFilters:")[1].split("]")[0]
    # UPDATE keeps the layout (swap rewrites with partitionBy)
    e.execute_sql("UPDATE pt_part SET v = v + 1 WHERE seg = 'BUILDING'")
    assert glob.glob(str(tmp_path / "pt_part" / "seg=*"))
    assert e.execute_sql("SELECT COUNT(*) AS n FROM pt_part").value("n", 0) == n


def test_partitioned_table_reopen_and_empty(spark, tmp_path):
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql(
        "CREATE TABLE pe (a BIGINT, b STRING) PARTITION BY (b)"
    )
    # empty partitioned table still reads with the full declared schema
    assert e1.execute_sql("SELECT a, b FROM pe").fetchall() == []
    e1.execute_sql("INSERT INTO pe VALUES (1, 'x'), (2, 'y')")
    spark.catalog.dropTempView("pe")
    e2 = Engine(spark, table_dir=str(tmp_path))
    assert sorted(e2.execute_sql("SELECT a, b FROM pe").fetchall()) == [
        (1, "x"), (2, "y")]
    # partitioning metadata survived the reopen
    assert e2.catalog.tables["pe"].partition_cols == ["b"]
    with pytest.raises(ValueError, match="not in the"):
        e2.execute_sql(
            "CREATE TABLE bad (a BIGINT) PARTITION BY (zz)"
        )


def test_set_variable_refused(engine):
    """Reference transformer refuses SET <var> for anything but
    timezone — falling through would mutate Spark session conf."""
    with pytest.raises(ValueError, match="not supported"):
        engine.execute_sql("SET foo = 'bar'")
    # both PG timezone spellings work
    engine.execute_sql("SET TIME ZONE 'UTC'")
    engine.execute_sql("SET timezone = 'UTC'")


def test_alter_table_rename_to(engine):
    engine.execute_sql(
        "CREATE TABLE rn_a (k BIGINT, CONSTRAINT rn_pos CHECK (k > 0))"
    )
    engine.execute_sql(
        "CREATE TABLE rn_child (id BIGINT, pk BIGINT, CONSTRAINT rn_fk "
        "FOREIGN KEY (pk) REFERENCES rn_a (k))"
    )
    engine.execute_sql("INSERT INTO rn_a VALUES (1), (2)")
    engine.execute_sql("ALTER TABLE rn_a RENAME TO rn_b")
    assert sorted(engine.execute_sql("SELECT k FROM rn_b").fetchall()) == [(1,), (2,)]
    with pytest.raises(Exception):
        engine.execute_sql("SELECT * FROM rn_a").fetchall()
    # constraints moved with the table
    with pytest.raises(Exception, match="rn_pos"):
        engine.execute_sql("INSERT INTO rn_b VALUES (-1)")
    # the FK in the child now points at the new name
    engine.execute_sql("INSERT INTO rn_child VALUES (10, 1)")
    with pytest.raises(Exception):
        engine.execute_sql("INSERT INTO rn_child VALUES (11, 99)")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute_sql("ALTER TABLE rn_child RENAME TO rn_b")


# -- self-review r10 batch-3 fixes ---------------------------------------------


def test_bare_conflict_base_filter_first(engine):
    """A row skipped on a BASE conflict must not block a later batch row
    (review r10 batch 3): base holds (5, 2); (1, 2) dies on b-conflict,
    so (1, 9) must insert."""
    engine.execute_sql(
        "CREATE TABLE bcf (a BIGINT, b BIGINT, "
        "CONSTRAINT bcf_a UNIQUE (a), CONSTRAINT bcf_b UNIQUE (b))"
    )
    engine.execute_sql("INSERT INTO bcf VALUES (5, 2)")
    engine.execute_sql(
        "INSERT INTO bcf VALUES (1, 2), (1, 9) ON CONFLICT DO NOTHING"
    )
    assert sorted(engine.execute_sql("SELECT a, b FROM bcf").fetchall()) == [
        (1, 9), (5, 2)]


def test_rename_refusals(engine):
    engine.execute_sql("CREATE TABLE rr (k BIGINT)")
    engine.execute_sql("BEGIN")
    with pytest.raises(ValueError, match="not.*transactional|not\\s+supported"):
        engine.execute_sql("ALTER TABLE rr RENAME TO rr2")
    engine.execute_sql("ROLLBACK")
    engine.execute_sql("CREATE VIEW rrv AS SELECT k FROM rr")
    with pytest.raises(ValueError, match="depend"):
        engine.execute_sql("ALTER TABLE rr RENAME TO rr2")
    engine.execute_sql("DROP VIEW rrv")
    engine.execute_sql("ALTER TABLE rr RENAME TO rr2")
    assert engine.execute_sql("SELECT COUNT(*) AS n FROM rr2").value("n", 0) == 0


def test_rename_refused_with_matview_dependency(engine):
    """A matview's stored SQL drives REFRESH — rename of its base table
    is RESTRICTed like the plain-view case (ADVICE r10)."""
    engine.execute_sql("CREATE TABLE rmv_t AS SELECT 1 AS k")
    engine.execute_sql(
        "CREATE MATERIALIZED VIEW rmv_m AS SELECT COUNT(*) AS n FROM rmv_t"
    )
    with pytest.raises(ValueError, match="depend"):
        engine.execute_sql("ALTER TABLE rmv_t RENAME TO rmv_t2")
    engine.execute_sql("DROP MATERIALIZED VIEW rmv_m")
    engine.execute_sql("ALTER TABLE rmv_t RENAME TO rmv_t2")
    assert engine.execute_sql("SELECT k FROM rmv_t2").fetchall() == [(1,)]


def test_select_nextval_persists_across_reopen(spark, tmp_path):
    """A routed SELECT nextval('s') mutates sequence state despite its
    SELECT head — the engine must persist it, or a reopened engine
    replays stale state and hands out duplicates (ADVICE r10 medium)."""
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql("CREATE SEQUENCE snp START 10")
    assert e1.execute_sql("SELECT nextval('snp') AS v").fetchall() == [(10,)]
    assert e1.execute_sql("SELECT nextval('snp') AS v").fetchall() == [(11,)]
    e2 = Engine(spark, table_dir=str(tmp_path))
    assert e2.execute_sql("SELECT nextval('snp') AS v").fetchall() == [(12,)]


def test_in_txn_ddl_not_persisted_before_commit(spark, tmp_path):
    """Catalog persistence is deferred while a transaction is open
    (ADVICE r10): a crash before COMMIT must not leave in-txn DDL
    metadata visible to a reopened engine."""
    import json
    import os

    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql("CREATE TABLE pre_txn (k BIGINT)")  # persists now
    e1.execute_sql("BEGIN")
    e1.execute_sql(
        "CREATE TABLE in_txn (v BIGINT, CONSTRAINT itx CHECK (v > 0))"
    )
    cat = os.path.join(str(tmp_path), "_catalog.json")
    with open(cat) as fh:
        mid = json.load(fh)
    assert "in_txn" not in mid.get("constraints", {})
    e1.execute_sql("COMMIT")
    with open(cat) as fh:
        post = json.load(fh)
    assert "in_txn" in post.get("constraints", {})


def test_stale_view_refresh_tracked(engine):
    """A view whose re-bind fails keeps its last good binding and is
    recorded in catalog.stale_views instead of failing silently; a later
    successful refresh clears the entry (ADVICE r10)."""
    engine.execute_sql("CREATE TABLE svt (k BIGINT)")
    engine.execute_sql("INSERT INTO svt VALUES (1)")
    engine.execute_sql("CREATE VIEW svv AS SELECT k * 2 AS k2 FROM svt")
    assert engine.execute_sql("SELECT k2 FROM svv").fetchall() == [(2,)]
    assert "svv" not in engine.catalog.stale_views
    engine.execute_sql("DROP TABLE svt")
    # the DROP touched svt -> svv re-bind attempted and failed: tracked
    assert "svv" in engine.catalog.stale_views
    engine.execute_sql("CREATE TABLE svt (k BIGINT)")
    engine.execute_sql("INSERT INTO svt VALUES (5)")
    assert engine.execute_sql("SELECT k2 FROM svv").fetchall() == [(10,)]
    assert "svv" not in engine.catalog.stale_views


def test_refresh_views_scoped_to_touched_relations(engine):
    """Only views whose dependency closure intersects the statement's
    relations re-bind (ADVICE r10) — and a view OVER a refreshed view
    propagates through the closure."""
    engine.execute_sql("CREATE TABLE rva (k BIGINT)")
    engine.execute_sql("CREATE TABLE rvb (k BIGINT)")
    engine.execute_sql("CREATE VIEW rv_a AS SELECT SUM(k) AS s FROM rva")
    engine.execute_sql(
        "CREATE VIEW rv_a2 AS SELECT s * 10 AS s10 FROM rv_a"
    )
    calls: list[str] = []
    orig = engine.catalog.spark.sql

    def spy(q, *a, **kw):
        calls.append(q)
        return orig(q, *a, **kw)

    engine.catalog.spark = type(
        "S", (), {"__getattr__": lambda _s, n: getattr(engine.spark, n),
                  "sql": staticmethod(spy)},
    )()
    try:
        engine.execute_sql("INSERT INTO rvb VALUES (1)")
        rebound_b = [q for q in calls if "FROM rva" in q or "FROM rv_a" in q]
        assert rebound_b == []  # rva-family views untouched by rvb DML
        calls.clear()
        engine.execute_sql("INSERT INTO rva VALUES (2)")
        assert any("FROM rva" in q for q in calls)  # rv_a re-bound
        assert any("FROM rv_a" in q for q in calls)  # closure: rv_a2 too
    finally:
        engine.catalog.spark = engine.spark
    assert engine.execute_sql("SELECT s10 FROM rv_a2").fetchall() == [(20,)]


def test_set_refusal_covers_all_forms(engine):
    for bad in ("SET my.var = '1'", "SET LOCAL statement_timeout = '5s'",
                "SET SESSION work_mem TO '64MB'"):
        with pytest.raises(ValueError, match="not supported"):
            engine.execute_sql(bad)


def test_upsert_where_with_paren_in_string(engine):
    engine.execute_sql("CREATE TABLE pws (k BIGINT UNIQUE, v STRING)")
    engine.execute_sql("INSERT INTO pws VALUES (1, 'old')")
    engine.execute_sql(
        "INSERT INTO pws VALUES (1, 'new') ON CONFLICT (k) "
        "DO UPDATE SET v = 'a(b' WHERE pws.k > 0"
    )
    assert engine.execute_sql("SELECT v FROM pws").fetchall() == [("a(b",)]


def test_scroll_cursor_full_direction_set(engine):
    """SCROLL cursors (round 11): the pinned, densely-numbered result
    serves every PG direction — FIRST/LAST/PRIOR/ABSOLUTE(+/-)/
    RELATIVE(+/-/0)/BACKWARD n/ALL — with PG's position semantics and
    reverse-order BACKWARD output."""
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DECLARE sc SCROLL CURSOR FOR "
        "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey"
    )
    fetch = lambda d: [r[0] for r in  # noqa: E731
                       engine.execute_sql(f"FETCH {d} FROM sc").fetchall()]
    assert fetch("NEXT") == [0]
    assert fetch("FORWARD 3") == [1, 2, 3]
    assert fetch("PRIOR") == [2]
    assert fetch("FIRST") == [0]
    assert fetch("LAST") == [24]
    assert fetch("ABSOLUTE 5") == [4]
    assert fetch("ABSOLUTE -2") == [23]      # n + k + 1 = 24th row
    assert fetch("RELATIVE -3") == [20]
    assert fetch("RELATIVE 0") == [20]       # re-fetch current
    assert fetch("BACKWARD 3") == [19, 18, 17]  # reverse order (PG)
    assert fetch("-2") == [16, 15]           # bare negative = BACKWARD 2
    assert fetch("ABSOLUTE 0") == []         # before first row
    assert fetch("PRIOR") == []              # still before first
    assert fetch("NEXT") == [0]
    # MOVE with scroll directions; MOVE ALL positions after last
    assert engine.execute_sql("MOVE LAST FROM sc").fetchall() == [(1,)]
    assert engine.execute_sql("MOVE ALL FROM sc").fetchall() == [(0,)]
    assert fetch("NEXT") == []
    assert fetch("BACKWARD ALL") == list(range(24, -1, -1))
    assert fetch("PRIOR") == []
    engine.execute_sql("CLOSE sc")
    engine.execute_sql("ROLLBACK")


def test_scroll_cursor_not_updatable(engine):
    """Scroll cursors are read-only (documented): WHERE CURRENT OF
    refuses — positioned DML needs the streaming NO SCROLL path."""
    engine.execute_sql("CREATE TABLE scu (k BIGINT)")
    engine.execute_sql("INSERT INTO scu VALUES (1), (2)")
    engine.execute_sql("BEGIN")
    engine.execute_sql("DECLARE su SCROLL CURSOR FOR SELECT k FROM scu")
    engine.execute_sql("FETCH NEXT FROM su")
    with pytest.raises(Exception, match="not.*updatable|updatable|simply"):
        engine.execute_sql("UPDATE scu SET k = 9 WHERE CURRENT OF su")
    engine.execute_sql("ROLLBACK")


# -- self-review r11 fixes ------------------------------------------------------


def test_scroll_fetch_all_positions_after_last(engine):
    """FETCH/MOVE FORWARD ALL must end AFTER the last row (pos = n+1),
    so a following PRIOR returns row n and BACKWARD ALL returns ALL
    rows (self-review r11: the span-from-pos form lost the last row and
    could move the cursor backward from n+1)."""
    engine.execute_sql("BEGIN")
    engine.execute_sql(
        "DECLARE sfa SCROLL CURSOR FOR "
        "SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey"
    )
    fetch = lambda d: [r[0] for r in  # noqa: E731
                       engine.execute_sql(f"FETCH {d} FROM sfa").fetchall()]
    assert fetch("ABSOLUTE 3") == [2]
    assert fetch("ALL") == list(range(3, 25))
    assert fetch("PRIOR") == [24]          # pos was n+1, PRIOR = row n
    assert fetch("ALL") == []              # empty tail; parks at n+1 again
    assert fetch("PRIOR") == [24]          # (PG: ALL always ends after last)
    # MOVE ALL from the last row passes over nothing but still parks
    # after the last row — the following PRIOR proves pos = n+1
    assert engine.execute_sql("MOVE ALL FROM sfa").fetchall() == [(0,)]
    assert fetch("PRIOR") == [24]
    engine.execute_sql("ROLLBACK")


def test_reopen_drop_first_statement_tracks_stale_view(spark, tmp_path):
    """A DROP issued as the FIRST statement of a reopened engine must
    still re-bind/track dependent views (self-review r11: _ever_rels
    now seeds from the restored catalog)."""
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql("CREATE TABLE sdt (k BIGINT)")
    e1.execute_sql("CREATE VIEW sdv AS SELECT k * 2 AS k2 FROM sdt")
    e2 = Engine(spark, table_dir=str(tmp_path))
    e2.execute_sql("DROP TABLE sdt")
    assert "sdv" in e2.catalog.stale_views


def test_replaced_view_closure_and_order(engine):
    """CREATE OR REPLACE keeps dict position: a view replaced to depend
    on a LATER view must still re-bind (fixpoint closure) and must
    refresh AFTER its dependency (self-review r11)."""
    engine.execute_sql("CREATE TABLE cvt1 (k BIGINT)")
    engine.execute_sql("CREATE TABLE cvt2 (k BIGINT)")
    engine.execute_sql("INSERT INTO cvt2 VALUES (1)")
    engine.execute_sql("CREATE VIEW cv1 AS SELECT k FROM cvt1")
    engine.execute_sql(
        "CREATE VIEW cv2 AS SELECT SUM(k) AS s FROM cvt2"
    )
    engine.execute_sql(
        "CREATE OR REPLACE VIEW cv1 AS SELECT s * 10 AS s10 FROM cv2"
    )
    engine.execute_sql("INSERT INTO cvt2 VALUES (4)")  # touches cvt2 only
    assert engine.execute_sql("SELECT s10 FROM cv1").fetchall() == [(50,)]


def test_drop_view_clears_stale_entry(engine):
    engine.execute_sql("CREATE TABLE dvt (k BIGINT)")
    engine.execute_sql("CREATE VIEW dvv AS SELECT k FROM dvt")
    engine.execute_sql("DROP TABLE dvt")
    assert "dvv" in engine.catalog.stale_views
    engine.execute_sql("DROP VIEW dvv")
    assert "dvv" not in engine.catalog.stale_views


def test_crashed_txn_ddl_rolled_back_on_reopen(spark, tmp_path):
    """A crash with an open txn that CREATEd a table must not leave the
    table rediscoverable WITHOUT its constraints (self-review r11): the
    pending-DDL marker makes the reopened engine roll the DDL back."""
    import os

    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql("CREATE TABLE keepme (k BIGINT)")
    e1.execute_sql("BEGIN")
    e1.execute_sql(
        "CREATE TABLE crashed (v BIGINT, CONSTRAINT cpos CHECK (v > 0))"
    )
    # simulate a crash: no COMMIT/ROLLBACK, just reopen over the dir
    e2 = Engine(spark, table_dir=str(tmp_path))
    assert "crashed" not in e2.catalog.tables
    assert "keepme" in e2.catalog.tables
    assert not os.path.isdir(os.path.join(str(tmp_path), "crashed"))
    # the marker was consumed; a THIRD engine sees the same clean state
    assert not os.path.exists(
        os.path.join(str(tmp_path), "_txn_pending.json")
    )
    # and the normal commit path clears the marker too
    e2.execute_sql("BEGIN")
    e2.execute_sql("CREATE TABLE fine (v BIGINT)")
    e2.execute_sql("COMMIT")
    assert not os.path.exists(
        os.path.join(str(tmp_path), "_txn_pending.json")
    )
    assert "fine" in e2.catalog.tables


def test_identity_columns(engine):
    """GENERATED {ALWAYS|BY DEFAULT} AS IDENTITY (round 11): implicit
    backing sequence, ALWAYS refuses explicit values without OVERRIDING
    SYSTEM VALUE, OVERRIDING USER VALUE discards supplied values, and
    the DEFAULT keyword stays PG-legal."""
    engine.execute_sql(
        "CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "v STRING)"
    )
    engine.execute_sql("INSERT INTO idt (v) VALUES ('a'), ('b')")
    assert sorted(engine.execute_sql("SELECT id, v FROM idt").fetchall()) == [
        (1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="OVERRIDING SYSTEM VALUE"):
        engine.execute_sql("INSERT INTO idt (id, v) VALUES (99, 'c')")
    with pytest.raises(ValueError, match="OVERRIDING SYSTEM VALUE"):
        engine.execute_sql("INSERT INTO idt VALUES (99, 'c')")
    # DEFAULT keyword is legal for an ALWAYS identity
    engine.execute_sql("INSERT INTO idt (id, v) VALUES (DEFAULT, 'c')")
    # OVERRIDING SYSTEM VALUE admits the explicit value
    engine.execute_sql(
        "INSERT INTO idt (id, v) OVERRIDING SYSTEM VALUE VALUES (99, 'd')"
    )
    rows = dict(engine.execute_sql("SELECT v, id FROM idt").fetchall())
    assert rows["c"] == 3 and rows["d"] == 99
    # BY DEFAULT identity accepts explicit values without OVERRIDING
    engine.execute_sql(
        "CREATE TABLE idt2 (id BIGINT GENERATED BY DEFAULT AS IDENTITY "
        "(START 10), v STRING)"
    )
    engine.execute_sql("INSERT INTO idt2 (v) VALUES ('x')")
    engine.execute_sql("INSERT INTO idt2 (id, v) VALUES (77, 'y')")
    # OVERRIDING USER VALUE discards the supplied id, uses the sequence
    engine.execute_sql(
        "INSERT INTO idt2 (id, v) OVERRIDING USER VALUE VALUES (500, 'z')"
    )
    rows = dict(engine.execute_sql("SELECT v, id FROM idt2").fetchall())
    assert rows == {"x": 10, "y": 77, "z": 11}


def test_identity_survives_reopen(spark, tmp_path):
    """Identity metadata (implicit sequence + ALWAYS refusal) persists
    across engine reopen."""
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql(
        "CREATE TABLE rid (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "v BIGINT)"
    )
    e1.execute_sql("INSERT INTO rid (v) VALUES (1)")
    e2 = Engine(spark, table_dir=str(tmp_path))
    e2.execute_sql("INSERT INTO rid (v) VALUES (2)")
    assert sorted(e2.execute_sql("SELECT id, v FROM rid").fetchall()) == [
        (1, 1), (2, 2)]
    with pytest.raises(ValueError, match="OVERRIDING"):
        e2.execute_sql("INSERT INTO rid (id, v) VALUES (9, 9)")


def test_comment_on_lifecycle(spark, tmp_path):
    """COMMENT ON persists across reopen, relocates on RENAME, and dies
    with its object on DROP (no oid-resurrection for a re-created
    same-name table)."""
    e1 = Engine(spark, table_dir=str(tmp_path))
    e1.execute_sql("CREATE TABLE ct (k BIGINT)")
    e1.execute_sql("COMMENT ON TABLE ct IS 'original'")
    with pytest.raises(ValueError, match="does not exist"):
        e1.execute_sql("COMMENT ON COLUMN ct.nope IS 'x'")
    e2 = Engine(spark, table_dir=str(tmp_path))
    rows = e2.execute_sql(
        "SELECT description FROM pg_description d "
        "JOIN pg_class c ON c.oid = d.objoid WHERE c.relname = 'ct'"
    ).fetchall()
    assert rows == [("original",)]
    e2.execute_sql("ALTER TABLE ct RENAME TO ct2")
    assert ("r", "ct2", 0) in e2.catalog.comments
    e2.execute_sql("DROP TABLE ct2")
    e2.execute_sql("CREATE TABLE ct2 (k BIGINT)")
    assert ("r", "ct2", 0) not in e2.catalog.comments


# -- self-review r11 loop 2 fixes ------------------------------------------------


def test_failed_create_does_not_leak_identity(engine):
    """A CREATE that fails validation after parsing an identity column
    must not leak its sequence or the ALWAYS refusal onto a later
    same-name table."""
    with pytest.raises(ValueError, match="unknown parent"):
        engine.execute_sql(
            "CREATE TABLE leakt (id BIGINT GENERATED ALWAYS AS IDENTITY, "
            "v BIGINT, FOREIGN KEY (v) REFERENCES missing_tbl (k))"
        )
    assert "leakt_id_seq" not in engine.catalog.sequences
    engine.execute_sql("CREATE TABLE leakt (id BIGINT, v BIGINT)")
    engine.execute_sql("INSERT INTO leakt (id, v) VALUES (1, 2)")  # no refusal
    assert engine.execute_sql("SELECT id, v FROM leakt").fetchall() == [(1, 2)]


def test_identity_guard_string_and_paren_safe(engine):
    """The ALWAYS refusal is item-exact: a string literal containing
    'DEFAULT' does not disable it, a ')' inside an expression does not
    truncate the arity scan, and per-tuple DEFAULT stays legal."""
    engine.execute_sql(
        "CREATE TABLE gsp (a BIGINT, id BIGINT GENERATED ALWAYS AS "
        "IDENTITY, v STRING)"
    )
    with pytest.raises(ValueError, match="OVERRIDING"):
        engine.execute_sql(
            "INSERT INTO gsp (a, id, v) VALUES (1, 99, 'the DEFAULT mode')"
        )
    with pytest.raises(ValueError, match="OVERRIDING"):
        engine.execute_sql("INSERT INTO gsp VALUES (abs(1), 7, 'x')")
    # a mixed batch where every identity position is DEFAULT is legal
    engine.execute_sql(
        "INSERT INTO gsp (a, id, v) VALUES (abs(1), DEFAULT, 'x'), "
        "(2, DEFAULT, 'y')"
    )
    assert sorted(engine.execute_sql("SELECT a, id FROM gsp").fetchall()) == [
        (1, 1), (2, 2)]
    # ... but one explicit value among DEFAULTs is still refused
    with pytest.raises(ValueError, match="OVERRIDING"):
        engine.execute_sql(
            "INSERT INTO gsp (a, id, v) VALUES (3, DEFAULT, 'z'), "
            "(4, 99, 'w')"
        )


def test_overriding_user_value_on_always(engine):
    """PG accepts OVERRIDING USER VALUE on GENERATED ALWAYS — the
    supplied value is replaced by the sequence (the copy-rows idiom);
    and USER + DEFAULT consumes the sequence exactly once per row."""
    engine.execute_sql(
        "CREATE TABLE ouv (id BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START 10), v STRING)"
    )
    engine.execute_sql(
        "INSERT INTO ouv (id, v) OVERRIDING USER VALUE VALUES (500, 'a')"
    )
    engine.execute_sql(
        "INSERT INTO ouv (id, v) OVERRIDING USER VALUE VALUES "
        "(DEFAULT, 'b')"
    )
    engine.execute_sql("INSERT INTO ouv (v) VALUES ('c')")
    assert sorted(engine.execute_sql("SELECT v, id FROM ouv").fetchall()) == [
        ("a", 10), ("b", 11), ("c", 12)]  # no gaps: one value per row
    # all-identity column list under USER works (sequence fills)
    engine.execute_sql(
        "INSERT INTO ouv (id) OVERRIDING USER VALUE VALUES (999)"
    )
    assert (13,) in engine.execute_sql(
        "SELECT id FROM ouv WHERE v IS NULL").fetchall()


def test_comment_kind_isolation(engine):
    """A table and a sequence sharing a name keep separate comments
    through DROP and RENAME (kind-matched cleanup)."""
    engine.execute_sql("CREATE TABLE shn (k BIGINT)")
    engine.execute_sql("CREATE SEQUENCE shn")
    engine.execute_sql("COMMENT ON TABLE shn IS 'the table'")
    engine.execute_sql("COMMENT ON SEQUENCE shn IS 'the counter'")
    engine.execute_sql("ALTER TABLE shn RENAME TO shn2")
    assert engine.catalog.comments[("S", "shn", 0)] == "the counter"
    assert engine.catalog.comments[("r", "shn2", 0)] == "the table"
    engine.execute_sql("DROP TABLE shn2")
    assert ("S", "shn", 0) in engine.catalog.comments
    assert ("r", "shn2", 0) not in engine.catalog.comments
    engine.execute_sql("DROP SEQUENCE shn")
    assert ("S", "shn", 0) not in engine.catalog.comments


def test_drop_table_drops_identity_sequence(engine):
    engine.execute_sql(
        "CREATE TABLE dts (id BIGINT GENERATED ALWAYS AS IDENTITY)"
    )
    assert "dts_id_seq" in engine.catalog.sequences
    engine.execute_sql("DROP TABLE dts")
    assert "dts_id_seq" not in engine.catalog.sequences


# -- self-review r11 loop 3 fixes ------------------------------------------------


def test_identity_sequence_ownership(engine):
    """Loop-3 ownership model: DROP SEQUENCE refuses an identity-owned
    sequence; DROP TABLE keeps a backing sequence another table still
    references; identity name collision with a live sequence refuses
    the CREATE instead of resetting it."""
    engine.execute_sql(
        "CREATE TABLE own1 (id BIGINT GENERATED ALWAYS AS IDENTITY)"
    )
    with pytest.raises(ValueError, match="requires it"):
        engine.execute_sql("DROP SEQUENCE own1_id_seq")
    # a rename keeps identity pointing at the ORIGINAL sequence name;
    # a new same-name table must not steal/reset it
    engine.execute_sql("ALTER TABLE own1 RENAME TO own2")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute_sql(
            "CREATE TABLE own1 (id BIGINT GENERATED ALWAYS AS IDENTITY)"
        )
    # failed create left nothing behind; own2 keeps inserting fine
    engine.execute_sql("INSERT INTO own2 (id) VALUES (DEFAULT)")
    assert engine.execute_sql(
        "SELECT COUNT(*) AS n FROM own2").value("n", 0) == 1
    engine.execute_sql("DROP TABLE own2")
    assert "own1_id_seq" not in engine.catalog.sequences


def test_failed_defaults_validation_leaks_nothing(engine):
    """A CREATE whose (non-identity) DEFAULT fails validation must not
    leave the identity sequence or ALWAYS refusal behind."""
    with pytest.raises(Exception):
        engine.execute_sql(
            "CREATE TABLE dfl (id BIGINT GENERATED ALWAYS AS IDENTITY, "
            "v BIGINT DEFAULT no_such_fn())"
        )
    assert "dfl_id_seq" not in engine.catalog.sequences
    assert "dfl" not in engine.catalog.identity_always


def test_recreated_sequence_fresh_start(engine):
    """DROP SEQUENCE clears _seq_start/_seq_step so a re-created
    sequence reports its OWN start (pg_sequences + RESTART IDENTITY)."""
    engine.execute_sql("CREATE SEQUENCE rs2 START 5")
    engine.execute_sql("DROP SEQUENCE rs2")
    engine.execute_sql("CREATE SEQUENCE rs2 START 100")
    rows = engine.execute_sql(
        "SELECT start_value FROM pg_sequences WHERE sequencename = 'rs2'"
    ).fetchall()
    assert rows == [(100,)]


def test_dynamic_table_comment_dies_with_drop(engine):
    engine.execute_sql("CREATE TABLE dynm ()")
    engine.execute_sql("COMMENT ON TABLE dynm IS 'dyn comment'")
    assert ("g", "dynm", 0) in engine.catalog.comments
    engine.execute_sql("DROP TABLE dynm")
    assert ("g", "dynm", 0) not in engine.catalog.comments


def test_identity_seq_comment_dies_with_table(engine):
    engine.execute_sql(
        "CREATE TABLE sqc (id BIGINT GENERATED ALWAYS AS IDENTITY)"
    )
    engine.execute_sql("COMMENT ON SEQUENCE sqc_id_seq IS 'owned'")
    engine.execute_sql("DROP TABLE sqc")
    assert ("S", "sqc_id_seq", 0) not in engine.catalog.comments


# -- ADVICE r12 fixes -------------------------------------------------------


def test_identity_collision_leaves_no_orphan_dir(engine):
    """The implicit-sequence collision check runs BEFORE the table
    directory is written: a refused CREATE must not leave an orphan
    parquet dir that a reopened catalog rediscovers as a ghost table."""
    import os

    engine.execute_sql(
        "CREATE TABLE ghost1 (id BIGINT GENERATED ALWAYS AS IDENTITY)"
    )
    engine.execute_sql("ALTER TABLE ghost1 RENAME TO ghost2")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute_sql(
            "CREATE TABLE ghost1 (id BIGINT GENERATED ALWAYS AS IDENTITY)"
        )
    assert "ghost1" not in engine.catalog.tables
    assert not os.path.isdir(
        os.path.join(engine.catalog.base_dir, "ghost1")
    )
    # a reopened engine over the same directory sees only ghost2
    reopened = Engine(engine.spark, table_dir=engine.catalog.base_dir)
    assert "ghost1" not in reopened.catalog.tables
    assert "ghost2" in reopened.catalog.tables


def test_failed_defaults_create_is_atomic(engine):
    """A CREATE whose DEFAULT expression fails validation unregisters
    the half-created table AND removes its directory — nothing visible
    in-session, nothing rediscoverable on reopen."""
    import os

    with pytest.raises(Exception):
        engine.execute_sql(
            "CREATE TABLE halfmade (a BIGINT, v BIGINT DEFAULT no_such_fn())"
        )
    assert "halfmade" not in engine.catalog.tables
    assert "halfmade" not in engine.catalog.table_constraints
    assert not os.path.isdir(
        os.path.join(engine.catalog.base_dir, "halfmade")
    )
    reopened = Engine(engine.spark, table_dir=engine.catalog.base_dir)
    assert "halfmade" not in reopened.catalog.tables


def test_on_conflict_identity_always_guard(engine):
    """The GENERATED ALWAYS refusal + OVERRIDING clause apply on the
    INSERT ... ON CONFLICT path exactly as on plain INSERT (PG raises
    the same error for upserts)."""
    engine.execute_sql(
        "CREATE TABLE ocid (id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "k BIGINT UNIQUE, v VARCHAR)"
    )
    engine.execute_sql("INSERT INTO ocid (k, v) VALUES (1, 'a')")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        engine.execute_sql(
            "INSERT INTO ocid (id, k, v) VALUES (99, 2, 'b') "
            "ON CONFLICT (k) DO NOTHING"
        )
    # OVERRIDING SYSTEM VALUE lets the explicit id through
    engine.execute_sql(
        "INSERT INTO ocid (id, k, v) OVERRIDING SYSTEM VALUE "
        "VALUES (99, 2, 'b') ON CONFLICT (k) DO NOTHING"
    )
    assert engine.execute_sql(
        "SELECT id FROM ocid WHERE k = 2"
    ).fetchall() == [(99,)]
    # OVERRIDING USER VALUE discards the supplied id for the sequence
    engine.execute_sql(
        "INSERT INTO ocid (id, k, v) OVERRIDING USER VALUE "
        "VALUES (1234, 3, 'c') ON CONFLICT (k) DO NOTHING"
    )
    got = engine.execute_sql("SELECT id FROM ocid WHERE k = 3").fetchall()
    assert got and got[0][0] != 1234
    # the conflict arm still updates (guard must not break normal upserts)
    engine.execute_sql(
        "INSERT INTO ocid (k, v) VALUES (1, 'z') "
        "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v"
    )
    assert engine.execute_sql(
        "SELECT v FROM ocid WHERE k = 1"
    ).fetchall() == [("z",)]
