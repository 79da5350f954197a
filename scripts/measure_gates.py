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
        extra_conf={
            "spark.driver.memory": "24g",
            # local UI on: its REST API is the per-stage metrics source
            # (task counts, shuffle bytes) for the stage-level evidence
            # below (VERDICT r13 #10) — declared plans cannot show work
            # that happens inside a localCheckpoint'd subtree
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _group_stage_metrics(group: str) -> dict | None:
        """Tasks + shuffle read/write bytes summed over every stage of the
        job group — measured execution metrics, not plan estimates."""
        import urllib.request

        try:
            base = spark.sparkContext.uiWebUrl
            app_id = spark.sparkContext.applicationId
            tracker = spark.sparkContext.statusTracker()
            tasks, sh_read, sh_write, n_stages = 0, 0, 0, 0
            seen: set[int] = set()
            for jid in tracker.getJobIdsForGroup(group):
                info = tracker.getJobInfo(jid)
                if info is None:
                    return None
                for sid in info.stageIds:
                    if sid in seen:
                        continue
                    seen.add(sid)
                    url = f"{base}/api/v1/applications/{app_id}/stages/{sid}"
                    with urllib.request.urlopen(url, timeout=5) as resp:
                        attempts = json.load(resp)
                    a = attempts[-1]  # latest attempt
                    if a.get("status") == "SKIPPED":
                        continue
                    n_stages += 1
                    tasks += a.get("numCompleteTasks", 0)
                    sh_read += a.get("shuffleReadBytes", 0)
                    sh_write += a.get("shuffleWriteBytes", 0)
            return {
                "stages": n_stages,
                "tasks": tasks,
                "shuffle_read_mb": round(sh_read / 2**20, 2),
                "shuffle_write_mb": round(sh_write / 2**20, 2),
            }
        except Exception:
            return None

    registry = load_all()
    out = {}
    for name in names:
        spec = registry[name]
        times = []
        metrics = None
        for i in range(n):
            group = f"measure:{name}:{i}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            print(f"  {name} run{i}: {times[-1]}s", flush=True)
            if i == n - 1:  # steady-state rep
                metrics = _group_stage_metrics(group)
        out[name] = {"runs": times, "best": min(times), "stage_metrics": metrics}
        if metrics:
            print(f"  {name} stage metrics: {metrics}", flush=True)
    print(json.dumps(out))


main()
