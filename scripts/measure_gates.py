#!/usr/bin/env python3
"""Quiet warm best-of-N noop-sink timing for named gates (guide §1.4).

Usage: python scripts/measure_gates.py [-n N] <gate> [gate ...]

Each run re-constructs the gate's DataFrame (so per-invocation work like
lazy-checkpoint materialization is charged, exactly as the driver pays it)
and times the noop-sink write. Prints per-gate runs + best, then one JSON
line for the whole set.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from otterbrix_spark.session import get_spark
    from otterbrix_spark.workload import load_all

    spark = get_spark(
        app_name="otterbrix-measure",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    out = {}
    for name in names:
        spec = registry[name]
        times = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"measure:{name}:{i}")
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            print(f"  {name} run{i}: {times[-1]}s", flush=True)
        out[name] = {"runs": times, "best": min(times)}
    print(json.dumps(out))


main()
