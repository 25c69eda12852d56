"""Second headline scaling pair at wider widths: 8 -> 32 (VERDICT r5
item 5).

The shipped bench gate is evidenced at 4 -> 16; this tool records an
independent pair at 8 -> 32 with the SAME methodology, by driving the
frozen ``bench.py --leg`` child mode (one subprocess per leg, pinned
via sched_setaffinity to exactly its core count) against the fixtures
``bench.py --prepare`` already built in /dev/shm/silkworm_bench. The
box's own 8->32 python-scaling and memory-bandwidth ceilings are
sampled right after each leg (same contention window), because the
shared 32-vCPU box itself historically scales only ~0.6 at 8->32
(pure-Python process pool) -- the ceiling, not the engine, caps the
wider pair, which is exactly why 4->16 is the headline.

Usage: python tools/second_pair.py        # fixtures must already exist
Prints one JSON line: both legs, ratio/4, ceilings.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen driver contract; imported, not edited)

SMALL, BIG = 8, 32


def main() -> None:
    if not os.path.isdir(os.path.join(bench.BENCH_TMP, f"web_{bench.N_PAGES}")):
        bench.prepare_fixtures()
    out: dict = {"ceilings": [], "bw": []}
    for cores, key in ((SMALL, "small"), (BIG, "big")):
        out[key] = bench.run_leg(cores)
        out["ceilings"].append(bench.machine_ceiling(SMALL, BIG))
        out["bw"].append(bench.machine_bandwidth_ceiling(SMALL, BIG))
    factor = BIG / SMALL
    eff = (
        out["big"]["steady_urls_per_sec"] / out["small"]["steady_urls_per_sec"]
    ) / factor
    ok_small = (out["small"].get("cores_used") or 0) >= 0.85 * SMALL
    ok_big = (out["big"].get("cores_used") or 0) >= 0.85 * BIG
    print(json.dumps({
        "pair": f"{SMALL}->{BIG}",
        "urls_per_sec_n": out["small"]["steady_urls_per_sec"],
        "urls_per_sec_4n": out["big"]["steady_urls_per_sec"],
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "cores_used_n": out["small"].get("cores_used"),
        "cores_used_4n": out["big"].get("cores_used"),
        "window_clean": bool(
            ok_small and ok_big and min(out["ceilings"]) >= 0.90
        ),
        "machine_python_ceiling_8_32": out["ceilings"],
        "machine_bandwidth_ceiling_8_32": out["bw"],
        "scaling_efficiency_vs_ceiling": round(
            min(1.0, eff / min(out["ceilings"])), 3
        ) if min(out["ceilings"]) else None,
        "legs": {"small": out["small"], "big": out["big"]},
    }))


if __name__ == "__main__":
    main()
