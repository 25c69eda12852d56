"""Diagnose one pinned bench leg: per-2s (java CPU, python CPU) tree
samples across the timed round, plus the engine's phase walls.

This is the tool that separated engine behavior from hypervisor
weather in round 4: a leg whose samples sit at N cores for the whole
round is saturated (the box granted its slots); a leg reading far
below N during a phase is starved or stalled, and the phase name says
where. It also exposed the kernel-discards-reaped-worker-CPU
accounting bug bench.py's _CoreSampler now works around — a python
worker's CPU vanishes from the process tree retroactively when it
exits (pyspark's daemon ignores SIGCHLD), visible here as a large
negative python-bucket delta.

Usage: python tools/profile_leg.py <cores>   (fixtures must exist —
run bench.py once first, or use --quick fixtures)
Writes /tmp/prof_leg_<cores>.json and prints per-interval core use.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
from time import perf_counter

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
os.sched_setaffinity(0, set(range(CORES)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

import bench  # noqa: E402
from silkworm_spark.plans.engine import CrawlConfig, CrawlEngine  # noqa: E402
from silkworm_spark.schemas import SEEDS_SCHEMA  # noqa: E402
from silkworm_spark.sources.webgen import build_robots, robots_df, url_of  # noqa: E402

TICK = os.sysconf("SC_CLK_TCK")


def snap() -> tuple[float, float]:
    """(java_cpu_s, python_cpu_s) over this process's live tree,
    including each process's already-reaped children (cutime)."""
    procs: dict[int, tuple[int, str, float]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            rest = raw.rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue
        cpu = (int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])) / TICK
        procs[int(pid)] = (int(rest[1]), comm, cpu)
    children: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    jcpu = pcpu = 0.0
    stack, seen = [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        _, comm, cpu = procs[p]
        if "java" in comm:
            jcpu += cpu
        else:
            pcpu += cpu
        stack.extend(children.get(p, []))
    return jcpu, pcpu


def main() -> None:
    spark = bench._spark(CORES)
    bt = bench.BENCH_TMP
    web = spark.read.parquet(bench._web_path(spark))
    robots = robots_df(spark, build_robots(bench.N_HOSTS))
    cfg = CrawlConfig(max_rounds=1, round_budget=bench.ROUND_BUDGET,
                      num_partitions=max(8, CORES))

    warm_dir = tempfile.mkdtemp(prefix=f"plwarm_{CORES}_", dir=bt)
    n_warm = max(2000, CORES * 200)
    warm_seeds = spark.createDataFrame(
        [dict(url=url_of(i, bench.N_HOSTS, 42), seq=i, priority=0)
         for i in range(n_warm)], SEEDS_SCHEMA)
    warm = CrawlEngine(spark, warm_dir,
                       CrawlConfig(max_rounds=1, round_budget=n_warm,
                                   num_partitions=max(8, CORES),
                                   min_rows_per_partition=16), web=web)
    warm._resolved_path = os.path.join(bt, f"resolved_{bench.N_PAGES}_v2")
    warm.initialize(warm_seeds, None)
    warm.run()
    shutil.rmtree(warm_dir, ignore_errors=True)

    ckpt = tempfile.mkdtemp(prefix=f"plrun_{CORES}_", dir=bt)
    engine = CrawlEngine(spark, ckpt, cfg, web=web)
    engine._resolved_path = os.path.join(bt, f"resolved_{bench.N_PAGES}_v2")
    engine._resolved_web(engine._resolved_path)
    engine.initialize(bench._read_seeds(spark, bench.N_SEEDS), robots)

    samples: list[tuple[float, float, float]] = []
    stop = threading.Event()

    def loop() -> None:
        while not stop.is_set():
            j, p = snap()
            samples.append((perf_counter(), j, p))
            stop.wait(2.0)

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    t0 = perf_counter()
    engine.run()
    dt = perf_counter() - t0
    stop.set()
    t.join(timeout=10)

    print("ROUND_SECONDS", round(dt, 2))
    for r in engine.stats.per_round:
        print("TIMINGS", json.dumps(r["timings"]))
    prev = None
    for s in samples:
        if prev:
            w = s[0] - prev[0]
            print(f"{s[0]-t0:7.1f}s  java {(s[1]-prev[1])/w:5.1f}  "
                  f"py {(s[2]-prev[2])/w:6.1f}")
        prev = s
    out = {"cores": CORES, "dt": dt,
           "samples": [[round(a - t0, 1), round(j, 1), round(p, 1)]
                       for a, j, p in samples]}
    with open(f"/tmp/prof_leg_{CORES}.json", "w") as f:
        json.dump(out, f)
    shutil.rmtree(ckpt, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
