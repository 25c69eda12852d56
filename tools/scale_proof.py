"""Corpus-operator scale proof (VERDICT r4 item 7).

Runs the WORST corpus operator (`dedup_minhash_lsh` — banded MinHash
near-dup over word shingles, the priciest per-row query in BENCH) on a
corpus scaled 10× past the bench's sf0.1 (= sf1: 50k docs), at two
pinned parallelism widths (local[4] vs local[16], each leg its own
subprocess bound via sched_setaffinity — the same cgroup stand-in as
bench.py's headline legs), and reports the N→4N scaling efficiency at
that scale. The 100× leg (x100 = 500k docs) WAS run in round 5 and is
the headline scale-proof result (BASELINE.md: 92.6 s @ 4c → 24.9 s @
16c, N→4N 0.93); pass the copy counts on argv (e.g. ``10 100``) to
reproduce.

Scaling the fixture: each of the K copies of the sf0.1 documents table
is passed through a DIFFERENT vowel-substitution (translate()), so
every word shingle in copy k differs from every shingle of copy j≠k —
the copies are independent sub-corpora with the ORIGINAL's near-dup
density, not a pathological 10-way exact-duplicate explosion (naively
unioning identical copies multiplies every LSH bucket's membership by
K and the candidate join by K², which measures the blow-up, not the
engine).

Usage: python tools/scale_proof.py            # builds fixtures, runs legs
       prints one JSON line per scale with both widths + efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from time import perf_counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1/documents.parquet"
SCRATCH = "/dev/shm/silkworm_scale_proof"
CONSONANTS = "bcdfghjklmnpqrstvwxz0123456789"


def fixture_dir(copies: int) -> str:
    return os.path.join(SCRATCH, f"x{copies}")


def build_fixture(spark, copies: int) -> str:
    """K decorrelated copies of the sf0.1 documents table (see module
    docstring); doc_ids offset per copy so they stay unique."""
    from pyspark.sql import functions as F

    out = fixture_dir(copies)
    if os.path.isdir(os.path.join(out, "documents.parquet")):
        return out
    docs = spark.read.parquet(BASE)
    n = docs.count()
    rep = docs.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    )
    expr = None
    for k in range(copies):
        # base-30 digit encoding: position i carries digit i of k, so
        # every k < 30^5 gets a DISTINCT substitution (the old
        # (k*7+i*11)%30 collided for k ≡ k' mod 30, which at x100 would
        # have made copies 0/30/60/90 exact duplicates — the K² bucket
        # blow-up the module docstring exists to avoid)
        repl = "".join(
            CONSONANTS[((k // len(CONSONANTS) ** i) * 7 + i * 11) % len(CONSONANTS)]
            for i in range(5)
        )
        t = F.translate(F.col("text"), "aeiou", repl)
        expr = t if expr is None else F.when(F.col("copy") == k, t).otherwise(expr)
    big = rep.select(
        (F.col("doc_id") + F.col("copy") * F.lit(n * 10)).alias("doc_id"),
        expr.alias("text"),
        "lang", "source", "n_chars",
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def run_query_leg(cores: int, sf_dir: str, repeats: int = 2) -> dict:
    """Child mode: pinned session at local[cores]; best-of-repeats
    wall time for the full query (signatures + banded join + rerank)."""
    os.sched_setaffinity(0, set(range(cores)))
    import __spark_entry__ as e
    from silkworm_spark import get_spark

    spark = get_spark(master=f"local[{cores}]")
    q = e.queries()["dedup_minhash_lsh"]
    best, rows = None, None
    for _ in range(repeats):
        t0 = perf_counter()
        rows = q(spark, sf_dir).count()
        dt = perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"cores": cores, "seconds": round(best, 2), "rows": rows}


def main() -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    from silkworm_spark import get_spark

    spark = get_spark(master="local[16]")
    copies = [int(a) for a in sys.argv[1:] if a.isdigit()] or [10]
    dirs = {k: build_fixture(spark, k) for k in copies}
    spark.stop()

    results = {}
    for k, d in dirs.items():
        legs = {}
        for cores in (4, 16):
            out = os.path.join(SCRATCH, f"leg_{k}_{cores}.json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--leg", str(cores), d, out],
                check=True, timeout=3000,
            )
            with open(out) as f:
                legs[cores] = json.load(f)
        eff = (legs[4]["seconds"] / legs[16]["seconds"]) / 4.0
        results[f"x{k}"] = {
            "docs": 5000 * k,
            "local4_seconds": legs[4]["seconds"],
            "local16_seconds": legs[16]["seconds"],
            "rows_out": legs[16]["rows"],
            "scaling_efficiency_n_to_4n": round(eff, 3),
        }
        print(json.dumps({f"x{k}": results[f"x{k}"]}))
    print(json.dumps({"scale_proof_dedup_minhash_lsh": results}))


if __name__ == "__main__":
    if "--leg" in sys.argv:
        i = sys.argv.index("--leg")
        cores, sf_dir, out_path = int(sys.argv[i + 1]), sys.argv[i + 2], sys.argv[i + 3]
        res = run_query_leg(cores, sf_dir)
        with open(out_path, "w") as f:
            json.dump(res, f)
    else:
        main()
