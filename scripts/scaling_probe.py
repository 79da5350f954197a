#!/usr/bin/env python3
"""Scaling probe: run headline operators at sf0.1 and at a 10x-replicated
~sf1 dataset (derived on the fly in /tmp), and report wall-time ratios.

Purpose: evidence that the plans scale sub-linearly-in-overhead — per-query
fixed cost stays flat and the data-dependent part grows ~linearly, i.e. the
1000x-cluster extrapolation in SCALE.md is grounded in measured behaviour,
not assertion.

Writes one JSON line; never touches /root/testdata (read-only) — the
replicated copy lands in a temp dir and is removed afterwards.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REPLICATION = int(os.environ.get("OTX_PROBE_REPL", "5"))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_QUERIES = [
    q.strip()
    for q in os.environ.get(
        "OTX_PROBE_QUERIES",
        "q01_pricing_summary,q03_shipping_priority,q06_forecast_revenue,"
        "d04_minhash_signature,s01_sessionize",
    ).split(",")
    if q.strip()
]


def replicate(spark, src_dir: str, dst_dir: str, factor: int) -> None:
    """Write a factor-x copy of each table; key columns are offset per
    replica so join fan-outs stay realistic (no artificial key collisions).
    """
    from pyspark.sql import functions as F

    from otterbrix_spark.sources.registry import TABLES, load_table

    key_offsets = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "part": [],
        "supplier": [],
        "region": [],
        "nation": [],
    }
    for name in TABLES:
        df = load_table(spark, src_dir, name)
        if name in ("region", "nation", "part", "supplier"):
            out = df  # fixed-size dims stay fixed
        else:
            pieces = []
            offset_step = 100_000_000
            for r in range(factor):
                piece = df
                for key in key_offsets.get(name, []):
                    piece = piece.withColumn(key, F.col(key) + F.lit(r * offset_step))
                # documents: make each replica's text distinct so dedup/minhash
                # workloads see real (not duplicated) content
                if name == "documents" and r > 0:
                    piece = piece.withColumn(
                        "text", F.concat(F.col("text"), F.lit(f" replica{r}"))
                    )
                pieces.append(piece)
            out = pieces[0]
            for p in pieces[1:]:
                out = out.unionByName(p)
        # coalesce: without it the union-of-replicas writes hundreds of tiny
        # files and task-scheduling overhead dominates the measurement
        out.repartition(16).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{name}.parquet")
        )
        print(f"replicated {name}", file=sys.stderr, flush=True)


def main() -> None:
    from otterbrix_spark.session import get_spark
    from otterbrix_spark.workload import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="otterbrix-scaling-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    tmp = tempfile.mkdtemp(prefix="otx-probe-")
    try:
        replicate(spark, BASE_SF, tmp, REPLICATION)

        best_of = int(os.environ.get("OTX_PROBE_BESTOF", "3"))

        def run_set(sf_dir: str) -> dict[str, float]:
            # best-of-N warm: the round-4 ds16 false alarm showed single-shot
            # readings are dominated by first-pass page cache, not plans
            times: dict[str, float] = {}
            for name in PROBE_QUERIES:
                # co-run isolation (VERDICT r8 #3): sequential probes share
                # one SparkSession, and cached relations / persisted gate
                # state left by an earlier query inflated later readings
                # under memory pressure (ds50 read 6.17 co-run vs 1.03
                # solo in round 8). Start each query from a clean cache so
                # published rows are right the first time. load_table's
                # per-session relation cache is also dropped — clearCache
                # unpersists the blocks but the cached DataFrame handles
                # would silently re-cache on next use.
                spark.catalog.clearCache()
                from otterbrix_spark.sources.registry import drop_table_cache

                drop_table_cache(spark)
                registry[name].spark_fn(spark, sf_dir).collect()  # warm
                samples = []
                for _ in range(best_of):
                    t0 = time.perf_counter()
                    registry[name].spark_fn(spark, sf_dir).collect()
                    samples.append(time.perf_counter() - t0)
                times[name] = round(min(samples), 3)
                print(f"{sf_dir} {name}: {times[name]}s (best of {best_of})",
                      file=sys.stderr, flush=True)
            # memory-sink hygiene lives in the streaming harness itself
            # (pipeline._detach_sink) — every streaming gate's sink is
            # checkpointed off the driver and dropped on return, so no
            # per-query cleanup special case is needed here
            return times

        base = run_set(BASE_SF)
        big = run_set(tmp)
        ratios = {k: round(big[k] / base[k], 2) for k in base}
        print(
            json.dumps(
                {
                    "replication": REPLICATION,
                    "base_sf_dir": BASE_SF,
                    "base_sec": base,
                    "replicated_sec": big,
                    "ratio": ratios,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
