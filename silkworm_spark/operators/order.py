"""Distributed dense sequence assignment.

The reference's FIFO order is an execution property of its single
``asyncio.Queue`` (engine.py:52-59). Here order is a *data column*:
new frontier rows get dense ``seq`` values in total order
``(parent_seq, child_index)`` — exactly the enqueue order a single
FIFO worker would produce (children in yield order per parent, parents
in dequeue order; SURVEY.md §3.4).

A bare ``Window.orderBy`` with no partition key funnels every row
through one task — unusable at 10^10 rows. And ``repartitionByRange``
is unusable for numbering: its range boundaries come from sampling
that may re-execute differently between the counting pass and the
numbering pass (a real nondeterminism bug caught by the bench).

Instead: a *deterministic* bucket key computed from the leading order
column's value range, a per-bucket count collected to the driver
(tiny), a prefix-sum offset per bucket, and a row_number window
partitioned by bucket. seq = offset[bucket] + rn - 1. Fully
deterministic under any physical partitioning, and the window works
on ~n/buckets rows per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_seq(
    df: DataFrame,
    order_cols: list[str],
    start: int,
    out_col: str = "seq",
    num_partitions: int | None = None,
    bounds: tuple | None = None,
    probe_col: str | None = None,
) -> tuple[DataFrame, int] | tuple[DataFrame, int, tuple]:
    """Returns (df with dense ``out_col`` in ``order_cols`` order,
    total row count). Requires the order key to be unique per row
    (it is: (parent_seq, child_index) is unique by construction).

    ``bounds`` = (min, max) of the leading order column when the caller
    already knows it (the engine does: parents' seq range) — skips one
    full pass over the input.

    ``probe_col``: also return that column's (min, max) — piggybacked
    on the bucket-count aggregation, so it costs no extra job. The
    engine probes ``priority`` here to keep its uniform-priority flag
    honest when spider callbacks yield prioritized Requests mid-crawl
    (a prioritized child must demote the dequeue from the uniform
    seq-horizon to the mixed-priority ruled-host-exempt horizon).
    Return becomes (df, count, (min, max)); (None, None) when empty."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    lead = order_cols[0]

    def ret(out: DataFrame, n: int, probe: tuple = (None, None)):
        return (out, n, probe) if probe_col is not None else (out, n)

    if bounds is None:
        agg = df.agg(
            F.min(lead).alias("mn"), F.max(lead).alias("mx"), F.count("*").alias("n")
        ).first()
        if agg["n"] == 0:
            return ret(df.withColumn(out_col, F.lit(start).cast("long")), 0)
        mn, mx = int(agg["mn"]), int(agg["mx"])
    else:
        mn, mx = int(bounds[0]), int(bounds[1])
    if mn == mx and len(order_cols) > 1:
        # degenerate leading key (e.g. seeds: parent_seq = -1 for all) —
        # bucket on the next order column instead of one giant bucket
        lead = order_cols[1]
        agg = df.agg(F.min(lead).alias("mn"), F.max(lead).alias("mx")).first()
        if agg["mn"] is None:
            return ret(df.withColumn(out_col, F.lit(start).cast("long")), 0)
        mn, mx = int(agg["mn"]), int(agg["mx"])

    n_buckets = max(1, parts * 4)
    span = max(1, mx - mn + 1)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(lead) - F.lit(mn)) * F.lit(n_buckets) / F.lit(span)),
    ).cast("int")
    b = df.withColumn("_bkt", bucket)
    probe_aggs = (
        [F.min(probe_col).alias("_pmn"), F.max(probe_col).alias("_pmx")]
        if probe_col is not None else []
    )
    rows = b.groupBy("_bkt").agg(F.count("*").alias("cnt"), *probe_aggs).collect()
    counts = {r["_bkt"]: r["cnt"] for r in rows}
    if not counts:
        return ret(df.withColumn(out_col, F.lit(start).cast("long")), 0)
    probe = (None, None)
    if probe_col is not None:
        pmns = [r["_pmn"] for r in rows if r["_pmn"] is not None]
        pmxs = [r["_pmx"] for r in rows if r["_pmx"] is not None]
        probe = (min(pmns), max(pmxs)) if pmns else (None, None)
    offsets, acc = {}, start
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_bkt").orderBy(*[F.col(c) for c in order_cols])
    out = (
        b.withColumn("_rn", F.row_number().over(w))
        .withColumn(out_col, (offmap[F.col("_bkt")] + F.col("_rn") - 1).cast("long"))
        .drop("_bkt", "_rn")
    )
    return ret(out, acc - start, probe)