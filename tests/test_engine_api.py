"""Engine facade (entry point A) + Relation API (entry point B) + dialect
rewrite tests — the reference's client-contract shapes
(`integration/cpp/test/test_sql_features.cpp`, python relation tests)."""

from __future__ import annotations

import pandas as pd
import pytest

from otterbrix_spark.dialect import rewrite
from otterbrix_spark.engine import connect


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = connect(spark)
    eng.register_corpus(sf_dir)
    return eng


# --- entry point A: execute_sql -> Cursor -----------------------------------


def test_execute_sql_cursor_contract(engine):
    cur = engine.execute_sql(
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment"
    )
    assert cur.column_count() == 2
    assert cur.size() == 5
    assert {r[0] for r in cur.fetchall()} == {
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
    }
    assert cur.value("n", 0) > 0


def test_parameterised_query(engine):
    cur = engine.execute_sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_acctbal > $1 AND c_mktsegment = $2",
        5000,
        "BUILDING",
    )
    assert cur.size() == 1
    assert cur.value("n", 0) > 0


def test_select_no_table(engine):
    cur = engine.execute_sql("SELECT 2 + 3 AS v")
    assert cur.fetchall() == [(5,)]


# --- dialect rewriting ------------------------------------------------------


def test_rewrite_regex_op():
    assert rewrite("SELECT * FROM t WHERE name ~ '^ab'") == (
        "SELECT * FROM t WHERE name RLIKE '^ab'"
    )


def test_rewrite_jsonb_arrow():
    out = rewrite("SELECT props ->> 'k' FROM events")
    assert out == "SELECT get_json_object(props, '$.k') FROM events"


def test_rewrite_jsonb_path():
    out = rewrite("SELECT payload #>> '{commit,record,text}' FROM ev")
    assert out == "SELECT get_json_object(payload, '$.commit.record.text') FROM ev"


def test_rewrite_chained_arrows():
    out = rewrite("SELECT props -> 'a' -> 'b' FROM t")
    assert "get_json_object(get_json_object(props, '$.a'), '$.b')" in out


def test_rewrite_variant_select():
    out = rewrite("SELECT v ::? bigint FROM t")
    assert out == "SELECT try_cast(v AS bigint) FROM t"


def test_rewrite_preserves_strings():
    sql = "SELECT 'a ~ b' AS s, name ~ 'x' FROM t"
    out = rewrite(sql)
    assert "'a ~ b'" in out and "name RLIKE 'x'" in out


def test_dialect_sql_end_to_end(engine):
    cur = engine.execute_sql(
        "SELECT event_type, COUNT(props ->> 'k') AS n FROM events "
        "WHERE event_type ~ '^(click|view)$' GROUP BY event_type"
    )
    assert cur.size() == 2


# --- entry point B: relation API --------------------------------------------


def test_from_df_roundtrip(engine):
    pdf = pd.DataFrame({"name": ["a", "b", "c"], "value": [1, 2, None]})
    rel = engine.from_df(pdf, name="t_basic")
    assert rel.df.count() == 3
    got = engine.execute_sql("SELECT COUNT(value) AS n FROM t_basic").value("n", 0)
    assert got == 2


def test_relation_verbs(engine, spark, sf_dir):
    from pyspark.sql import functions as F

    from otterbrix_spark.relation import from_df
    from otterbrix_spark.sources.registry import load_table

    cust = from_df(load_table(spark, sf_dir, "customer"), spark=spark)
    out = (
        cust.filter(F.col("c_acctbal") > 0)
        .group("c_nationkey", {"n": ("count", "c_custkey"), "best": ("max", "c_acctbal")})
        .order(F.col("n").desc())
        .limit(5)
        .fetchall()
    )
    assert len(out) == 5
    assert all(len(r) == 3 for r in out)


def test_relation_join_and_cross(engine, spark, sf_dir):
    from otterbrix_spark.relation import from_df
    from otterbrix_spark.sources.registry import load_table

    nation = from_df(load_table(spark, sf_dir, "nation"), spark=spark)
    region = from_df(load_table(spark, sf_dir, "region"), spark=spark)
    joined = nation.join(
        region, nation.df.n_regionkey == region.df.r_regionkey, "inner"
    )
    assert joined.df.count() == 25
    assert nation.cross(region).df.count() == 125


def test_cursor_chunked_iteration(engine):
    cur = engine.execute_sql("SELECT n_nationkey, n_name FROM nation")
    seen = [row["n_nationkey"] for row in cur]  # toLocalIterator path
    assert sorted(seen) == list(range(25))
    assert len(cur) == 25


def test_from_df_arrow_table(engine, spark):
    import pyarrow as pa

    table = pa.table({"k": [1, 2, 3], "v": ["x", "y", "z"]})
    rel = engine.from_df(table, name="t_arrow")
    assert rel.df.count() == 3
    got = engine.execute_sql("SELECT v FROM t_arrow WHERE k = 2").fetchall()
    assert got == [("y",)]


def test_from_df_polars_ducktype(engine, spark):
    # polars is absent in this container; a to_arrow()-bearing frame takes
    # the Arrow path (reference test_polars_ingest.py parity)
    import pyarrow as pa

    class FakePolars:
        def to_arrow(self):
            return pa.table({"a": [1, 2], "b": ["x", "y"]})

    rel = engine.from_df(FakePolars())
    assert sorted(rel.fetchall()) == [(1, "x"), (2, "y")]


# --- prepared statements (PREPARE / EXECUTE / DEALLOCATE) --------------------


def test_prepare_execute_select(engine):
    engine.execute_sql("PREPARE q AS SELECT $1 + $2 AS s")
    assert engine.execute_sql("EXECUTE q(2, 3)").fetchall() == [(5,)]
    # re-execute with different arguments reuses the stored text
    assert engine.execute_sql("EXECUTE q(10, -4)").fetchall() == [(6,)]
    engine.execute_sql("DEALLOCATE q")


def test_prepare_execute_dml_and_string_args(engine):
    engine.execute_sql("CREATE TABLE prep_t (k BIGINT, v STRING)")
    engine.execute_sql("PREPARE ins (BIGINT, STRING) AS "
                       "INSERT INTO prep_t VALUES ($1, $2)")
    engine.execute_sql("EXECUTE ins(1, 'a')")
    engine.execute_sql("EXECUTE ins(2, 'has, comma')")
    rows = sorted(engine.execute_sql("SELECT * FROM prep_t").fetchall())
    assert rows == [(1, "a"), (2, "has, comma")]


def test_prepare_duplicate_name_raises(engine):
    engine.execute_sql("PREPARE dup AS SELECT 1")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute_sql("PREPARE dup AS SELECT 2")
    engine.execute_sql("DEALLOCATE PREPARE dup")


def test_execute_unknown_and_deallocate_all(engine):
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute_sql("EXECUTE nope(1)")
    engine.execute_sql("PREPARE p1 AS SELECT 1")
    engine.execute_sql("PREPARE p2 AS SELECT 2")
    engine.execute_sql("DEALLOCATE ALL")
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute_sql("EXECUTE p1")


def test_prepared_statement_with_pg_dialect_body(engine):
    # the stored text goes through the normal dialect path at EXECUTE time
    engine.execute_sql(
        "PREPARE rx AS SELECT 'abc' ~ $1 AS m"
    )
    assert engine.execute_sql("EXECUTE rx('^a')").fetchall() == [(True,)]


def test_explain_statement(spark, sf_dir):
    from otterbrix_spark.engine import Engine

    eng = Engine(spark)
    eng.register_corpus(sf_dir)
    rows = eng.sql(
        "EXPLAIN SELECT o_orderpriority, COUNT(*) FROM orders "
        "WHERE o_totalprice > 1000 GROUP BY o_orderpriority"
    ).collect()
    text = "\n".join(r.plan for r in rows)
    assert "HashAggregate" in text
    # the pushdown story is visible to an EXPLAIN user
    assert "PushedFilters" in text
    rows = eng.sql("EXPLAIN ANALYZE SELECT COUNT(*) FROM orders").collect()
    assert any("Statistics" in r.plan for r in rows)


def test_explain_runs_through_dialect(spark, sf_dir):
    from otterbrix_spark.engine import Engine

    eng = Engine(spark)
    eng.register_corpus(sf_dir)
    rows = eng.sql(
        "EXPLAIN SELECT c_name FROM customer WHERE c_name ~ 'Customer#0+1' "
        "ORDER BY c_name FETCH FIRST 5 ROWS ONLY"
    ).collect()
    text = "\n".join(r.plan for r in rows)
    assert "RLIKE" in text or "rlike" in text.lower()


# --- parser extensions (reference components/sql/parser/extension.hpp) -------


def _demo_claim(spark):
    """The reference's demo extension: `DEMO <arith>` evaluates the
    expression (test_parser_extension.cpp checks 1+20=21 and that
    2+3*4=14 keeps real precedence)."""
    import re

    def claim(sql):
        m = re.match(r"^\s*DEMO\s+(.+?)\s*;?\s*$", sql, re.DOTALL)
        if m is None:
            return None
        return spark.sql(f"SELECT ({m.group(1)}) AS result")

    return claim


def test_parser_extension_claim_and_pass(spark, sf_dir):
    from otterbrix_spark.engine import Engine

    eng = Engine(spark)
    # without the extension, DEMO is rejected (nobody claims)
    with pytest.raises(Exception):
        eng.sql("DEMO 1 + 20").collect()
    eng.register_extension("demo", _demo_claim(spark))
    assert eng.sql("DEMO 1 + 20").collect()[0].result == 21
    # precedence is the claimer's own (here: real SQL precedence)
    assert eng.sql("DEMO 2 + 3 * 4").collect()[0].result == 14
    # non-matching statements PASS through to the built-in parser
    assert eng.sql("SELECT 40 + 2 AS v").collect()[0].v == 42
    # unregister restores the original rejection
    eng.unregister_extension("demo")
    with pytest.raises(Exception):
        eng.sql("DEMO 1 + 20").collect()
    with pytest.raises(KeyError):
        eng.unregister_extension("demo")


def test_parser_extension_is_per_instance(spark):
    from otterbrix_spark.engine import Engine

    eng_a, eng_b = Engine(spark), Engine(spark)
    eng_a.register_extension("demo", _demo_claim(spark))
    assert eng_a.sql("DEMO 1 + 20").collect()[0].result == 21
    with pytest.raises(Exception):
        eng_b.sql("DEMO 1 + 20").collect()


def test_parser_extension_ordering_first_claim_wins(spark):
    from otterbrix_spark.engine import Engine

    eng = Engine(spark)
    eng.register_extension(
        "first", lambda s: spark.sql("SELECT 'first' AS who")
        if s.startswith("WHO") else None)
    eng.register_extension(
        "second", lambda s: spark.sql("SELECT 'second' AS who")
        if s.startswith("WHO") else None)
    assert eng.sql("WHO AM I").collect()[0].who == "first"
    eng.unregister_extension("first")
    assert eng.sql("WHO AM I").collect()[0].who == "second"


def test_parser_extension_claim_error_surfaces(spark):
    """A claim that RECOGNIZES the statement but fails mid-transform
    surfaces its error (the reference's transform-phase failure) — it
    must not be silently passed to the built-in parser."""
    from otterbrix_spark.engine import Engine

    eng = Engine(spark)

    def bad_claim(sql):
        if sql.startswith("BOOM"):
            raise ValueError("extension transform failed")
        return None

    eng.register_extension("boom", bad_claim)
    with pytest.raises(ValueError, match="transform failed"):
        eng.sql("BOOM now")


def test_parser_extension_sees_raw_semicolon_statement(spark):
    """Extensions receive the statement BEFORE the semicolon splitter —
    a custom grammar containing ';' sees the full text (reference:
    extensions run before the built-in parser on the raw query)."""
    from otterbrix_spark.engine import Engine

    eng = Engine(spark)
    seen = []

    def claim(sql):
        seen.append(sql)
        if sql.startswith("DEFINE"):
            return spark.sql("SELECT 'claimed' AS v")
        return None

    eng.register_extension("multi", claim)
    assert eng.sql("DEFINE a; b END").collect()[0].v == "claimed"
    assert seen[0] == "DEFINE a; b END"


def test_parser_extension_may_unregister_itself(spark):
    """A claim fn that mutates the extension registry mid-claim must not
    crash the dispatch loop (snapshot iteration)."""
    from otterbrix_spark.engine import Engine

    eng = Engine(spark)

    def one_shot(sql):
        if sql.startswith("ONCE"):
            eng.unregister_extension("one_shot")
            return spark.sql("SELECT 1 AS fired")
        return None

    eng.register_extension("one_shot", one_shot)
    assert eng.sql("ONCE").collect()[0].fired == 1
    with pytest.raises(Exception):
        eng.sql("ONCE").collect()  # gone now
