"""Auxiliary measurements for the optimization rounds (bench.py is
FROZEN as the driver contract — extra benchmarks live here, guide §1.4).

- default: time every declared query with the NOOP SINK (computes every
  column of every row, no output cost, full plan in the SQL tab) at
  $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS; prints one JSON line.
- --count: use .count() instead (bench.py's methodology, for apples-
  to-apples with BENCH_*.json query sections).
- --explain DIR --suffix SFX: write DIR/<query>_<SFX>.txt with
  df.explain("formatted") for each selected query (the plan evidence
  committed under plans/r06/).
- positional args: query names (default: all registered).

Usage: python bench_extra.py [--count] [--explain DIR --suffix SFX] [q ...]
"""

from __future__ import annotations

import json
import os
import sys
from time import perf_counter

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entrymod
    from silkworm_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    use_count = "--count" in args
    explain_dir = None
    suffix = "after"
    if "--explain" in args:
        explain_dir = args[args.index("--explain") + 1]
        os.makedirs(explain_dir, exist_ok=True)
    if "--suffix" in args:
        suffix = args[args.index("--suffix") + 1]
    skip = {"--count", "--explain", "--suffix"}
    names = [
        a for i, a in enumerate(args)
        if a not in skip and (i == 0 or args[i - 1] not in ("--explain", "--suffix"))
    ]

    spark = get_spark(
        app_name="silkworm-bench-extra", master=f"local[{min(CPUS, 32)}]",
        shuffle_partitions=max(8, min(CPUS, 32)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = names or list(qs)
    times: dict[str, float] = {}
    try:
        for name in names:
            if name not in qs:
                continue
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = perf_counter()
            df = qs[name](spark, SF_DIR)
            if explain_dir is not None:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            times[name] = round(perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS,
                      "mode": "count" if use_count else "noop",
                      "queries": times, "total": round(sum(times.values()), 2)}))


if __name__ == "__main__":
    main()
