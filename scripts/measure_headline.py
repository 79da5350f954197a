#!/usr/bin/env python3
"""Warm best-of-N timing for named queries under the EXACT bench session
shape (shuffle width, maxPartitionBytes, clustered cache) — the focused
A/B harness for headline-query work (guide §1).

Usage: python scripts/measure_headline.py [-n N] [--noop] <query> [query ...]

Timed action defaults to .collect() (bench methodology); --noop switches to
the noop sink (guide §1.4) for isolating computation. Prints per-run times
and one JSON line; also prints the pass's steal share so stolen windows can
be discarded (same signal bench.py uses).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _cpu_times() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    noop = "--noop" in args
    names = [a for a in args if a != "--noop"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from otterbrix_spark.session import get_spark
    from otterbrix_spark.sources.registry import persist_clustered
    from otterbrix_spark.workload import load_all

    corpus_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).rglob("*.parquet") if f.is_file()
    )
    shuffle = int(os.environ.get("OTX_BENCH_SHUFFLE", 0)) or max(
        8, min(int(cpus), corpus_bytes // (64 << 20))
    )
    split_bytes = max(1 << 20, min(128 << 20, corpus_bytes // (2 * int(cpus))))
    spark = get_spark(
        app_name="otterbrix-measure-headline",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.sql.files.maxPartitionBytes": str(split_bytes),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    persist_clustered(spark, sf_dir)

    # warm each named query once (cache materialisation, JIT) before timing
    for name in names:
        registry[name].spark_fn(spark, sf_dir).collect()

    s0, t0_j = _cpu_times()
    out = {}
    for name in names:
        spec = registry[name]
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"measure:{name}:{i}")
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(round(time.perf_counter() - t0, 4))
            print(f"  {name} run{i}: {runs[-1]}s", flush=True)
        out[name] = {"runs": runs, "best": min(runs)}
    s1, t1_j = _cpu_times()
    steal = round((s1 - s0) / max(1, t1_j - t0_j), 4)
    print(json.dumps({"queries": out, "steal_share": steal, "noop": noop}))


main()
