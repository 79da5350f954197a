#!/usr/bin/env python3
"""Oracle-verify named gates at one or more scale factors.

Usage: python scripts/verify_gates.py [--sfs 0.001,0.01,0.1] <gate> [gate ...]

Runs each gate's Spark DataFrame and compares against its DuckDB oracle
with the driver's comparison (row count, columns, order-insensitive
values) via tests.oracle.compare. Exits non-zero on the first mismatch.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    sfs = ["0.001", "0.01", "0.1"]
    if "--sfs" in args:
        i = args.index("--sfs")
        sfs = args[i + 1].split(",")
        del args[i : i + 2]
    names = args
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from otterbrix_spark.session import get_spark
    from otterbrix_spark.workload import load_all
    from tests.oracle import compare

    spark = get_spark(
        app_name="otterbrix-verify",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in names:
            spec = registry[name]
            if spec.oracle is None:
                print(f"  {name} @ sf{sf}: NO ORACLE (skipped)")
                continue
            compare(spec.spark_fn(spark, sf_dir), spec.oracle, sf_dir, name)
            print(f"  {name} @ sf{sf}: OK", flush=True)
    print("ALL GREEN")


main()
