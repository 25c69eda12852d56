"""Frontier dequeue: per-host politeness priority queue.

Replaces the reference's bounded FIFO ``asyncio.Queue``
(engine.py:52-59) with a budgeted per-round dequeue:

- eligibility: ``not_before <= vtime`` (virtual-clock politeness and
  retry backoff — the deterministic analog of DelayMiddleware sleeps,
  middlewares.py:164-263, strengthened from global-per-worker to
  per-host per the north rule);
- robots: broadcast join on host; disallowed path prefixes dropped and
  counted; per-host ``fetch_budget`` enforced against cumulative host
  state (north-rule addition, no reference equivalent);
- per-host rank: ``row_number() over (partition by host order by
  priority desc, seq)`` — activates the reference's reserved
  ``priority`` field (request.py:25, docs/core-concepts.md:37) while
  keeping FIFO (``seq``) within a priority class;
- global round budget: ``orderBy(seq).limit(n)`` (TakeOrderedAndProject
  — no full sort materialization);
- hot-host skew: the dequeued batch is repartitioned on a salted host
  hash so one hot domain (30% of the fixture) spreads over
  ``ceil(rows/target)`` partitions instead of serializing one task —
  AQE cannot rebalance UDF fan-out by value, so salting is explicit.

The virtual clock makes politeness exactly reproducible in tests; in a
wall-clock deployment ``vtime`` is seconds-since-epoch and nothing else
changes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INF = (1 << 31) - 1


@dataclass
class DequeueResult:
    batch: DataFrame  # selected rows, fetch-ready (salted partition col `part`)
    denied: DataFrame  # robots-disallowed rows (removed from frontier)
    new_host_state: DataFrame  # host, fetched, next_free after this round
    host_counts: DataFrame  # host, taken (for metrics)
    n_batch: int = -1  # rows in batch when known (budget not hit ⇒ ranked count)
    seq_bounds: tuple | None = None  # (min seq, max seq) of the batch
    _ranked: DataFrame | None = None  # internal cache handle (unpersist after round)

    def release(self) -> None:
        if self._ranked is not None:
            self._ranked.unpersist()


def dequeue_round(
    frontier: DataFrame,
    robots: DataFrame,
    host_state: DataFrame,
    vtime: float,
    round_seconds: float = 1.0,
    round_budget: int = 1_000_000,
    per_host_cap: int = _INF,
    num_partitions: int | None = None,
    target_rows_per_partition: int = 1000,
) -> DequeueResult:
    spark = frontier.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    window_end = vtime + round_seconds

    eligible = frontier.filter(F.col("not_before") <= F.lit(vtime))

    rb = F.broadcast(
        robots.select(
            "host",
            F.col("disallow_prefixes").alias("_disallow"),
            (F.coalesce(F.col("crawl_delay_ms"), F.lit(0)) / 1000.0).alias("_delay_s"),
            F.coalesce(F.col("fetch_budget"), F.lit(_INF)).alias("_budget"),
        )
    )
    e = eligible.join(rb, on="host", how="left").withColumns(
        {
            "_delay_s": F.coalesce(F.col("_delay_s"), F.lit(0.0)),
            "_budget": F.coalesce(F.col("_budget"), F.lit(_INF)),
            "_path": F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/")),
        }
    )
    is_denied = F.when(
        F.col("_disallow").isNotNull(),
        F.exists("_disallow", lambda p: F.col("_path").startswith(p)),
    ).otherwise(F.lit(False))
    e = e.withColumn("_denied", is_denied)
    denied = e.filter(F.col("_denied"))
    allowed = e.filter(~F.col("_denied"))

    hs = F.broadcast(
        host_state.select(
            "host", F.col("fetched").alias("_fetched"), F.col("next_free").alias("_next_free")
        )
    )
    a = allowed.join(hs, on="host", how="left").withColumns(
        {
            "_fetched": F.coalesce(F.col("_fetched"), F.lit(0)),
            "_next_free": F.greatest(
                F.coalesce(F.col("_next_free"), F.lit(float(vtime))), F.lit(float(vtime))
            ),
        }
    )
    # slots at next_free + m*delay for m=0,1,.. while < window_end →
    # ceil((window_end - next_free)/delay). ceil (not floor): a host with
    # delay > round_seconds still gets ≥1 slot whenever next_free <
    # window_end, otherwise it would never be dequeued at all (the
    # reference DelayMiddleware fetches every request, just slowly).
    cap_polite = F.when(F.col("_delay_s") <= 0, F.lit(_INF)).otherwise(
        F.ceil((F.lit(window_end) - F.col("_next_free")) / F.col("_delay_s")).cast("int")
    )
    cap = F.greatest(
        F.least(cap_polite, (F.col("_budget") - F.col("_fetched")).cast("int"), F.lit(per_host_cap)),
        F.lit(0),
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    ranked = a.withColumn("_rank", F.row_number().over(w)).filter(F.col("_rank") <= cap)

    # global round budget: a bare orderBy().limit(k) merges k rows per
    # partition onto the driver — instead find the k-th smallest seq
    # (a narrow single-column TakeOrdered) and filter distributedly
    ranked = ranked.cache()
    stats = ranked.agg(
        F.count("*").alias("n"), F.min("seq").alias("mn"), F.max("seq").alias("mx")
    ).first()
    n_ranked, seq_min, seq_max = stats["n"], stats["mn"], stats["mx"]
    n_batch = n_ranked
    if n_ranked > round_budget:
        kth = (
            ranked.select("seq").orderBy("seq").limit(round_budget)
            .agg(F.max("seq")).first()[0]
        )
        batch = ranked.filter(F.col("seq") <= kth)
        n_batch, seq_max = round_budget, kth
    else:
        batch = ranked

    # salted partition key: hot hosts fan out over ceil(rows/target)
    # salts. `part` is a logical key in a fixed 1024 space — the engine
    # repartitions on it with a width adapted to the batch size.
    key_space = 1024
    cnt_w = Window.partitionBy("host")
    batch = (
        batch.withColumn("_host_rows", F.count("*").over(cnt_w))
        .withColumn(
            "_salts",
            F.greatest(F.ceil(F.col("_host_rows") / F.lit(target_rows_per_partition)), F.lit(1)),
        )
        .withColumn(
            "part",
            F.pmod(F.xxhash64("host") + F.pmod(F.xxhash64("url"), F.col("_salts")), F.lit(key_space)).cast("int"),
        )
    )

    taken = batch.groupBy("host").agg(
        F.count("*").alias("taken"), F.first("_delay_s").alias("_delay_s")
    )
    prev = host_state.select("host", "fetched", "next_free")
    new_host_state = (
        prev.join(taken, on="host", how="full")
        .select(
            "host",
            (F.coalesce(F.col("fetched"), F.lit(0)) + F.coalesce(F.col("taken"), F.lit(0))).alias("fetched"),
            F.when(
                F.col("taken").isNotNull(),
                F.greatest(F.coalesce(F.col("next_free"), F.lit(float(vtime))), F.lit(float(vtime)))
                + F.col("taken") * F.coalesce(F.col("_delay_s"), F.lit(0.0)),
            )
            .otherwise(F.coalesce(F.col("next_free"), F.lit(float(vtime))))
            .alias("next_free"),
        )
    )

    keep_cols = frontier.columns
    batch = batch.select(*keep_cols, "part")
    return DequeueResult(
        batch=batch,
        denied=denied.select(*keep_cols),
        new_host_state=new_host_state,
        host_counts=taken.select("host", "taken"),
        n_batch=n_batch,
        seq_bounds=(seq_min, seq_max) if n_batch else None,
        _ranked=ranked,
    )
