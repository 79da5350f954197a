#!/usr/bin/env python3
"""Round-13 optimization sweep: capture the physical plan of EVERY registry
gate, flag anti-patterns, and (optionally) time each gate.

Usage: python scripts/plan_sweep.py [--time] [--sf DIR] [--out FILE]

Flags per gate:
  - python_eval: BatchEvalPython / ArrowEvalPython / MapInPandas /
    MapInArrow nodes (the deliberate §2.9 UDF seam is expected to be the
    only source)
  - cartesian: CartesianProduct (non-broadcast nested loop)
  - exchanges: count of Exchange nodes outside cached subtrees
  - smj / shj / bhj / bnlj: join strategy counts
Timings (--time) use the noop sink so the computation is measured, not
result serialisation (guide §1.4); construction time (Python fn + analysis
+ physical planning) is recorded separately from execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    do_time = "--time" in sys.argv
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    out_path = "/tmp/plan_sweep.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from otterbrix_spark.session import get_spark
    from otterbrix_spark.workload import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="otterbrix-plan-sweep",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    results = {}
    for i, (name, spec) in enumerate(sorted(registry.items())):
        row: dict = {}
        try:
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            df._jdf.queryExecution().executedPlan()
            row["construct_s"] = round(time.perf_counter() - t0, 4)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
            row["python_eval"] = len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
                    r"FlatMapGroupsInPandas|AggregateInPandas",
                    plan,
                )
            )
            row["cartesian"] = plan.count("CartesianProduct")
            row["exchanges"] = plan.count("Exchange ")
            row["broadcast_ex"] = plan.count("BroadcastExchange")
            row["smj"] = plan.count("SortMergeJoin")
            row["shj"] = plan.count("ShuffledHashJoin")
            row["bnlj"] = plan.count("BroadcastNestedLoopJoin")
            row["sort_global"] = len(re.findall(r"Sort \[.*\], true", plan))
            if do_time:
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                row["exec_s"] = round(time.perf_counter() - t0, 4)
                spark.sparkContext.setJobDescription(None)
        except Exception as e:  # noqa: BLE001
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = row
        if (i + 1) % 50 == 0:
            print(f"...{i + 1}/{len(registry)}", file=sys.stderr)

    Path(out_path).write_text(json.dumps(results, indent=1))
    # summary to stdout
    errs = {n: r["error"] for n, r in results.items() if "error" in r}
    print(f"gates: {len(results)}, errors: {len(errs)}")
    for n, e in list(errs.items())[:10]:
        print(f"  ERR {n}: {e}")
    flagged = {
        n: r
        for n, r in results.items()
        if r.get("cartesian", 0) > 0
    }
    print(f"cartesian-product gates: {sorted(flagged)}")
    py = {n: r["python_eval"] for n, r in results.items() if r.get("python_eval")}
    print(f"python-eval gates ({len(py)}): {sorted(py)[:40]}")
    if do_time:
        slow = sorted(
            ((r.get("exec_s", 0), n) for n, r in results.items()),
            reverse=True,
        )[:25]
        print("slowest exec (noop sink):")
        for s, n in slow:
            print(f"  {s:8.3f}s  {n}  (construct {results[n].get('construct_s')}s)")
        slowc = sorted(
            ((r.get("construct_s", 0), n) for n, r in results.items()),
            reverse=True,
        )[:15]
        print("slowest construction+planning:")
        for s, n in slowc:
            print(f"  {s:8.3f}s  {n}")
    spark.stop()


if __name__ == "__main__":
    main()
