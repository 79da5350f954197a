#!/usr/bin/env python3
"""Capture .explain("formatted") for headline queries into plans/<round>/
(round from OTX_PLAN_ROUND, default r14).

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: e.g. "before" / "after" -> plans/<round>/<name>_<suffix>.txt
  query:  optional subset of registry names (default: the bench headline set).

Replicates bench.py's session shape (shuffle width, clustered cache) so the
captured plans are the plans the bench actually runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from otterbrix_spark.session import get_spark
    from otterbrix_spark.workload import load_all
    from otterbrix_spark.sources.registry import persist_clustered

    def _auto_shuffle() -> int:
        total = sum(
            f.stat().st_size
            for f in Path(sf_dir).rglob("*.parquet")
            if f.is_file()
        )
        return max(8, min(int(cpus), total // (64 << 20)))

    shuffle = int(os.environ.get("OTX_BENCH_SHUFFLE", 0)) or _auto_shuffle()
    spark = get_spark(
        app_name="otterbrix-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    if not names:
        names = sorted(n for n, s in registry.items() if s.bench)

    persist_clustered(spark, sf_dir)

    out_dir = REPO / "plans" / os.environ.get("OTX_PLAN_ROUND", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry[name].spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
