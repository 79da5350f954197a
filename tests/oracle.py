"""Local mirror of the driver's DuckDB-oracle comparison: row count, column
names, and order-insensitive value equality between a Spark DataFrame and a
DuckDB SQL result over the same parquet tables."""

from __future__ import annotations

import math
from functools import lru_cache

import duckdb

from otterbrix_spark.sources.registry import TABLES


@lru_cache(maxsize=4)
def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _duck_result(sf_dir: str, oracle_sql: str):
    rel = duck_con(sf_dir).sql(oracle_sql)
    return rel.columns, rel.fetchall()


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    sp_cols = spark_df.columns
    # Run the DuckDB oracle CONCURRENTLY with the Spark collect: DuckDB
    # releases the GIL and the collect blocks on the py4j socket, so the
    # two engines' work overlaps instead of adding up — the oracle
    # battery is ~570 such pairs per suite run. Harness-only: identical
    # SQL, identical comparison. The cached connection is touched by one
    # thread at a time (tests are serial; the worker owns it until
    # .result()).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(_duck_result, sf_dir, oracle_sql)
        sp_rows = [tuple(r) for r in spark_df.collect()]
        du_cols, du_rows = fut.result()

    assert sorted(sp_cols) == sorted(du_cols), (
        f"{name}: column mismatch spark={sp_cols} duck={du_cols}"
    )
    assert len(sp_rows) == len(du_rows), (
        f"{name}: row count spark={len(sp_rows)} duck={len(du_rows)}"
    )
    sc, dc = _canon(sp_rows, sp_cols), _canon(du_rows, du_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
