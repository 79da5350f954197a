#!/usr/bin/env python3
"""Same-session DuckDB pairing for bench.py: times the 12 headline
oracles at $SPARK_GRAFT_SF_DIR (default sf0.1), warm best-of-3 per
query, and prints one JSON line {total, queries}. Run back-to-back with
bench.py — host state moves both numbers 2x across days, so only
same-session pairings are comparable (SCALE.md round-9 policy)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import duckdb

    from otterbrix_spark.sources.registry import TABLES
    from otterbrix_spark.workload import load_all

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    headline = {
        n: s for n, s in load_all().items() if s.bench and s.oracle
    }
    # warm pass (page cache + duckdb object cache)
    for spec in headline.values():
        con.sql(spec.oracle).fetchall()
    timings: dict[str, float] = {}
    for name in sorted(headline):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(headline[name].oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
