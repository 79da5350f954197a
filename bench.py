#!/usr/bin/env python3
"""Benchmark harness: runs the headline workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _cpu_times() -> tuple[int, int, int]:
    """(steal, iowait, total) jiffies from /proc/stat's aggregate cpu
    line. Co-tenant CPU steal inflated two whole round-10 bench passes
    2-3x while loadavg looked innocent at start (VERDICT r10) — the
    steal SHARE over a pass is the signal that separates a stolen sample
    from a regression."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal ...
    iowait = vals[4] if len(vals) > 4 else 0
    steal = vals[7] if len(vals) > 7 else 0
    return steal, iowait, sum(vals)


def _pass_shares(before, after) -> dict:
    """steal/iowait share of a pass, as fractions of total jiffies."""
    dt = max(1, after[2] - before[2])
    return {
        "steal_share": round((after[0] - before[0]) / dt, 4),
        "iowait_share": round((after[1] - before[1]) / dt, 4),
    }


# a pass whose steal share exceeds this is marked stolen (and the
# sequential/concurrent passes auto-rerun once): ~5% steal was the
# boundary between the quiet 1.0-1.1s and the inflated 2-3s round-10
# samples
_STEAL_FLAG = 0.05


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sustained_secs = 0.0
    if "--sustained" in sys.argv:
        i = sys.argv.index("--sustained")
        sustained_secs = (
            float(sys.argv[i + 1])
            if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-")
            else 30.0
        )
    # machine-load context: absolute wall times on this host vary several-x
    # with co-tenant load (observed across rounds), so record loadavg at
    # start and end — cross-round deltas are only interpretable alongside it
    load_before = os.getloadavg()
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    from otterbrix_spark.session import get_spark
    from otterbrix_spark.workload import load_all

    # shuffle fan-out sized to the CORPUS, not the core count: the same
    # rule a cluster deployment uses — ~64MB target partitions with a
    # floor for parallelism and a ceiling at the core count; at 100TB it
    # yields the core-bound ceiling, at bench scale the floor. Kept for
    # that sizing PRINCIPLE, not as a measured win: the round-8
    # interleaved best-of-5 A/B (8 vs 32, loadavg 0.1-3) read medians
    # 4.94s vs 4.94s — indistinguishable within +/-0.35s host variance
    # (the round-7 "+1.5s saved" single A/B did not reproduce). The same
    # session's interleaved r6-code-vs-r7-code A/B read 4.45-5.18s vs
    # 4.32-5.15s, naming HOST-DAY variance (not any round-7 change) as
    # the r6->r7 "inflation" culprit. AQE stays ON (skew splitting /
    # join re-planning are the scale story).
    corpus_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).rglob("*.parquet") if f.is_file()
    )

    def _auto_shuffle() -> int:
        return max(8, min(int(cpus), corpus_bytes // (64 << 20)))

    shuffle = int(os.environ.get("OTX_BENCH_SHUFFLE", 0)) or _auto_shuffle()
    # Input-split sizing for the COLD pass (round-13 optimization, guide
    # §6/§2.2): a table under the default 128MB maxPartitionBytes scans as
    # ONE task, so every cold query ran its scan+filter+hash pipeline
    # single-threaded on a 32-core machine. Derive the split size from the
    # corpus and core count (~2 scan tasks per core across the corpus)
    # exactly like the shuffle rule above: at bench scale it lands on the
    # 1MB floor (lineitem 10.8MB -> ~11 splits), at >=8GB/core the rule
    # clamps back to the 128MB default — a cluster-scale deployment sees
    # stock behaviour (larger splits are better there, guide §6).
    split_bytes = max(1 << 20, min(128 << 20, corpus_bytes // (2 * int(cpus))))
    # FAIR scheduling so the concurrent batch pass below shares executor
    # slots evenly; with one job at a time (the sequential passes) FAIR
    # degenerates to FIFO, so the per-query numbers are unaffected
    spark = get_spark(
        app_name="otterbrix-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.scheduler.mode": "FAIR",
            "spark.sql.files.maxPartitionBytes": str(split_bytes),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    headline = {name: spec for name, spec in registry.items() if spec.bench}

    # Per-query task counts (round-14, VERDICT r13 #8): at sf0.1 every warm
    # headline query is fixed-overhead-dominated, so the driver's 8-vs-32
    # core wall-clock ratio carries no parallelism signal. The number of
    # TASKS a query launches is the signal that survives that regime: a
    # query pinned to one task per stage cannot scale, whatever its wall
    # time reads. Collected from the status tracker per job group —
    # additions-only (new JSON keys), the timed methodology is untouched.
    def _group_task_counts(group: str) -> int | None:
        try:
            tracker = spark.sparkContext.statusTracker()
            total = 0
            for jid in tracker.getJobIdsForGroup(group):
                info = tracker.getJobInfo(jid)
                if info is None:
                    return None  # evicted from the status store: no claim
                for sid in info.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is not None:
                        total += sinfo.numTasks
            return total
        except Exception:
            return None

    # cold pass FIRST: uncached parquet scans, cold JIT — what a fresh
    # cluster sees on its first query batch. Recorded separately so
    # round-over-round deltas can isolate plan work from cache warming.
    cpu_before = _cpu_times()
    cold: dict[str, float] = {}
    cold_tasks: dict[str, int | None] = {}
    for name in sorted(headline):
        spark.sparkContext.setJobGroup(f"cold:{name}", f"cold:{name}")
        start = time.perf_counter()
        headline[name].spark_fn(spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - start, 4)
        cold_tasks[name] = _group_task_counts(f"cold:{name}")
    spark.sparkContext.setJobGroup("bench", "bench")
    cold_shares = _pass_shares(cpu_before, _cpu_times())

    # cache the corpus in executor memory: a long-running deployment serves
    # hot tables from the cluster cache (or OS page cache), not cold parquet.
    # The persist uses the CLUSTER_KEYS layout (registry.persist_clustered):
    # fact tables repartitioned to the shuffle width before caching — a
    # sub-128MB parquet file otherwise caches as ONE partition and every
    # stage reading it runs single-threaded (the measured 2-3x win); the
    # hash keys mirror the on-disk bucketBy layout a cluster deployment
    # writes (see the registry comment for what the cache seam does NOT
    # buy). The per-session DataFrame cache in load_table makes every
    # query reuse these exact persisted relations.
    from otterbrix_spark.sources.registry import persist_clustered

    persist_clustered(spark, sf_dir)

    # warm pass: JVM JIT, parquet footers, cache materialisation, AQE stats —
    # the recorded numbers are steady-state per-query wall times, which is
    # what a long-running cluster deployment sees. The SECOND execution per
    # query below is the steady-state plan (first run materialises the
    # cache), so warm task counts are collected here on a dedicated rep.
    for spec in headline.values():
        spec.spark_fn(spark, sf_dir).collect()
    warm_tasks: dict[str, int | None] = {}
    for name in sorted(headline):
        spark.sparkContext.setJobGroup(f"warm:{name}", f"warm:{name}")
        headline[name].spark_fn(spark, sf_dir).collect()
        warm_tasks[name] = _group_task_counts(f"warm:{name}")
    spark.sparkContext.setJobGroup("bench", "bench")

    # best-of-3 guards against transient CPU-steal windows (co-tenant
    # background jobs were observed inflating single measurements 10-20x);
    # a WHOLE stolen pass slips through best-of-3, so the pass-level steal
    # share is measured and the pass auto-reruns ONCE when it exceeds the
    # flag threshold (VERDICT r10 #3)
    def _sequential_pass() -> tuple[dict[str, float], dict]:
        before = _cpu_times()
        out: dict[str, float] = {}
        for name in sorted(headline):
            best = float("inf")
            for _ in range(3):
                start = time.perf_counter()
                rows = headline[name].spark_fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - start)
                del rows
            out[name] = round(best, 4)
        return out, _pass_shares(before, _cpu_times())

    timings, seq_shares = _sequential_pass()
    seq_stolen = seq_shares["steal_share"] > _STEAL_FLAG
    if seq_stolen:
        retry, retry_shares = _sequential_pass()
        if retry_shares["steal_share"] <= seq_shares["steal_share"]:
            timings, seq_shares = retry, retry_shares
            seq_stolen = retry_shares["steal_share"] > _STEAL_FLAG

    total = round(sum(timings.values()), 4)

    # concurrent batch pass: submit the whole headline set at once through
    # a thread pool (Spark schedules the 12 jobs concurrently; FAIR mode
    # shares slots). This is how a deployment actually serves a query
    # batch, and it amortises the ~0.25s/job fixed driver overhead that
    # dominates the sequential total at bench scale — measured ~3.5x
    # faster than sequential on this host. Since round 9 (VERDICT r8 #2,
    # ratified from ADVICE) this is the PRIMARY vs-oracle metric —
    # emitted first as "value_concurrent" — because it is the
    # deployment-shaped number; the sequential "value" is kept for
    # cross-round comparability. Read BOTH against the recorded loadavg.
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(headline)

    # prepared plans (round-10, per VERDICT r9 #5): each rep builds
    # FRESH DataFrames and forces Catalyst analysis + physical planning
    # OUTSIDE the timer — the prepared-statement deployment shape (plan
    # once, then execute) — while the timed collect runs the COMPLETE
    # job: fresh RDD instances per rep, so no stage is skipped and every
    # scan/shuffle re-executes. The obvious-looking alternative
    # (re-collect ONE DataFrame object across reps) was measured and
    # REJECTED: Spark registers the first execution's shuffle outputs
    # and skips those stages on re-submission of the same plan instance,
    # so that pass times a partial re-execution (0.50s vs 1.19s for the
    # full-execution form on the same quiet host) — a benchmark artifact,
    # not deployment behaviour. The sequential metric above keeps
    # per-rep construction inside the timer (end-to-end latency incl.
    # planning, cross-round comparable).
    def _concurrent_pass() -> tuple[float, dict, dict]:
        # per-query decomposition (VERDICT r11 #2): each thread times its
        # own collect, so the batch number can be attributed — a query's
        # concurrent latency includes slot contention, which is the point
        before = _cpu_times()
        best = float("inf")
        best_lat: dict[str, float] = {}
        for _ in range(3):
            fresh = {n: headline[n].spark_fn(spark, sf_dir) for n in names}
            for df in fresh.values():
                df._jdf.queryExecution().executedPlan()

            lat: dict[str, float] = {}

            def run_one(n: str) -> None:
                t0 = time.perf_counter()
                fresh[n].collect()
                lat[n] = round(time.perf_counter() - t0, 4)

            start = time.perf_counter()
            with ThreadPoolExecutor(max_workers=len(names)) as ex:
                list(ex.map(run_one, names))
            took = time.perf_counter() - start
            if took < best:
                best, best_lat = took, lat
        return round(best, 4), _pass_shares(before, _cpu_times()), best_lat

    concurrent_best, conc_shares, conc_lat = _concurrent_pass()
    conc_stolen = conc_shares["steal_share"] > _STEAL_FLAG
    if conc_stolen:
        retry_best, retry_shares, retry_lat = _concurrent_pass()
        if retry_shares["steal_share"] <= conc_shares["steal_share"]:
            concurrent_best, conc_shares, conc_lat = (
                retry_best, retry_shares, retry_lat,
            )
            conc_stolen = retry_shares["steal_share"] > _STEAL_FLAG

    # optional sustained-throughput pass (bench.py --sustained [secs]):
    # closed-loop concurrent submission of the headline shapes
    # round-robin for N seconds — QPS and latency percentiles are the
    # deployment-shaped numbers a concurrent burst cannot show, and a
    # per-query session-state leak surfaces here as latency drift
    sustained = None
    if sustained_secs > 0:
        import itertools
        import threading

        counter = itertools.count()
        lock = threading.Lock()
        latencies: list[tuple[str, float]] = []
        deadline = time.perf_counter() + sustained_secs
        workers = min(len(names), int(cpus))

        def loop() -> None:
            while True:
                with lock:
                    name = names[next(counter) % len(names)]
                if time.perf_counter() >= deadline:
                    return
                df = headline[name].spark_fn(spark, sf_dir)
                df._jdf.queryExecution().executedPlan()
                start = time.perf_counter()
                df.collect()
                took = time.perf_counter() - start
                with lock:
                    latencies.append((name, took))

        before = _cpu_times()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(lambda _: loop(), range(workers)))
        elapsed = time.perf_counter() - t0
        lats = sorted(t for _, t in latencies)

        def pct(p: float) -> "float | None":
            # None when zero queries completed inside the window (ADVICE
            # r12: indexing empty lats crashed the whole run at the end)
            if not lats:
                return None
            return round(lats[min(len(lats) - 1, int(p * len(lats)))], 4)

        sustained = {
            "seconds": round(elapsed, 2),
            "completed": len(lats),
            "qps": round(len(lats) / elapsed, 2) if elapsed > 0 else 0.0,
            "p50_sec": pct(0.50),
            "p95_sec": pct(0.95),
            "workers": workers,
            **_pass_shares(before, _cpu_times()),
        }

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                # PRIMARY metric (round-9 policy): the concurrent batch —
                # deployment-shaped, amortises fixed per-job driver overhead
                "value_concurrent": concurrent_best,
                # per-query latency inside the best concurrent rep
                # (includes slot contention — attribution, not a sum)
                "concurrent_queries": conc_lat,
                # sequential total, kept for cross-round comparability
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_value": round(sum(cold.values()), 4),
                "cold_queries": cold,
                # tasks launched per query (cold scan plan / warm cached
                # plan) — the parallelism signal the wall-clock scaling
                # block cannot carry at overhead-bound SFs (VERDICT r13 #8)
                "cold_tasks": cold_tasks,
                "warm_tasks": warm_tasks,
                "sf": sf,
                "n_queries": len(timings),
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
                # /proc/stat steal+iowait share per pass (VERDICT r10 #3):
                # a sample with steal_share above the flag threshold is a
                # co-tenant-stolen window, not an engine regression — the
                # flagged passes already auto-reran once
                "cpu_shares": {
                    "cold": cold_shares,
                    "sequential": seq_shares,
                    "concurrent": conc_shares,
                },
                "stolen": {
                    "sequential": seq_stolen,
                    "concurrent": conc_stolen,
                },
                **({"sustained": sustained} if sustained else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
