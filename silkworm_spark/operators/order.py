"""Distributed dense sequence assignment.

The reference's FIFO order is an execution property of its single
``asyncio.Queue`` (engine.py:52-59). Here order is a *data column*:
new frontier rows get dense ``seq`` values in total order
``(parent_seq, child_index)`` — exactly the enqueue order a single
FIFO worker would produce (children in yield order per parent, parents
in dequeue order; SURVEY.md §3.4).

A bare ``Window.orderBy`` with no partition key funnels every row
through one task — unusable at 10^10 rows. Instead: range-repartition
by the order key, rank within partitions, then add per-partition
offsets (a tiny driver-side prefix sum over partition counts).
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
) -> tuple[DataFrame, int]:
    """Returns (df with dense ``out_col``, total row count) — the count
    falls out of the per-partition prefix sum for free."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    if not counts:
        return df.withColumn(out_col, F.lit(start).cast("long")), 0
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .withColumn(out_col, (offmap[F.col("_pid")] + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn")
    )
    return out, acc - start
