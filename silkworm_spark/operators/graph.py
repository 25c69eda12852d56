"""Connected components over near-duplicate pair edges.

Near-dup mining (minhash-LSH / Jaccard / simhash in dedup_corpus)
yields PAIRS; deduplication needs CLUSTERS — duplicates are
transitive in practice (a~b, b~c ⇒ keep one of {a,b,c}), so the
standard corpus pipeline step is: pairs → connected components →
keep one representative per component.

Algorithm: hash-min label propagation. Every node starts labeled with
its own id; each round every node takes the min of its label and its
neighbors' labels; fixpoint = components labeled by their min node id.
Each round is ONE keyed shuffle (edge join + min-agg, both
map-side-combinable) and converges in O(component diameter) rounds —
near-dup clusters are dense and shallow (diameter ≤ ~3 for duplicate
blobs), so 3-5 rounds is typical at any corpus size. For adversarial
long-chain graphs the large-star/small-star variant (Kiveris et al.
2014, "Connected Components in MapReduce and Beyond") drops the bound
to O(log n) rounds; it is not needed for dedup workloads.

The driver-side loop is the iterative-algorithm exception to the
"declare one plan" rule: per round it launches one job and reads back
ONE scalar (the changed-label count) — no data is collected. Lineage
is truncated every round with localCheckpoint, so plan size stays
constant regardless of round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(doc_id, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of the node's connected
    component. Deterministic; raises if not converged in ``max_iter``
    rounds (a dedup edge set converges in a handful).

    ONE Spark job per round: the changed-label count rides the round's
    own materialization as an ``Observation`` metric instead of a
    second join+count job (round 5 launched 2 jobs + an extra join per
    round — guide §1.2, remove passes). Labels rows carry their own
    previous label through the min-aggregation (``_old``; neighbor rows
    contribute NULL, which min() ignores), so "changed" =
    count(new comp < old comp) is computable inside the same pass.

    ``scratch_dir``: materialize the undirected edge table there as
    parquet instead of the executor block-manager cache — the form for
    edge sets beyond cache scale. Default (None) keeps the cache: a
    near-dup pair table is df-capped upstream (max_doc_freq bounds
    per-doc pair fan-out), orders of magnitude smaller than the corpus.
    """
    from pyspark.sql import Observation

    und = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    ).distinct()
    cached = None
    if scratch_dir is not None:
        import os

        spill = os.path.join(scratch_dir, "cc_edges.parquet")
        und.write.mode("overwrite").parquet(spill)
        und = edges.sparkSession.read.parquet(spill)
    else:
        und = cached = und.cache()
    comp_t = edges.schema[a].dataType
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            nbr = und.join(
                labels.withColumnRenamed("node", "src"), "src"
            ).select(
                F.col("dst").alias("node"), "comp",
                F.lit(None).cast(comp_t).alias("_old"),
            )
            obs = Observation()
            new = (
                labels.withColumn("_old", F.col("comp"))
                .unionByName(nbr)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"), F.min("_old").alias("_old"))
                .observe(
                    obs,
                    F.sum((F.col("comp") < F.col("_old")).cast("long")).alias("chg"),
                )
                .select("node", "comp")
                .localCheckpoint(eager=True)
            )
            labels = new
            if int(obs.get["chg"] or 0) == 0:
                return labels.select(
                    F.col("node").alias("doc_id"), F.col("comp").alias("component")
                )
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    finally:
        if cached is not None:
            cached.unpersist()


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the crawl
    engine's authority signal (frontier prioritization by link
    authority is the classic crawl-ordering policy; the reference has
    no link analytics at all, this is a beyond-the-reference scale
    operator).

    All arithmetic is FIXED-POINT over BIGINTs (ranks scaled by
    ``scale``, integer division everywhere): floating-point PageRank
    sums partial contributions in engine- and partition-dependent
    order, so two correct engines disagree in the low bits and a
    value-hash oracle can never match. Integer arithmetic is exact and
    associative — the DuckDB oracle reproduces every rank bit-for-bit
    with the same unrolled recurrence:

        r0(v)   = scale // n_nodes
        c_i(v)  = sum over in-edges (u,v) of  r_i(u) // outdeg(u)
        r_i+1(v)= (scale * (100-damping_pct)) // (100 * n_nodes)
                  + (damping_pct * c_i(v)) // 100

    Dangling mass is dropped, not redistributed (identically on both
    sides). Each iteration is one edge-join + one keyed sum — both
    map-side combinable; lineage is truncated per round so the plan
    stays constant-size at any iteration count
    (``checkpoint_rounds=False`` keeps full lineage so tests can
    audit the physical plan of a round). Returns (node, rank) for
    every node appearing in ``edges``."""
    edges = edges.select("src", "dst").distinct().cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    base = scale // n
    teleport = (scale * (100 - damping_pct)) // (100 * n)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    contrib_edges = edges.join(outdeg, "src").cache()
    try:
        ranks = nodes.withColumn("rank", F.lit(base).cast("long"))
        for _ in range(iterations):
            contribs = (
                contrib_edges.join(
                    ranks.withColumnRenamed("node", "src"), "src"
                )
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank div outdeg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("s"))
            )
            ranks = nodes.join(contribs, "node", "left").select(
                "node",
                F.expr(
                    f"CAST({teleport} AS BIGINT)"
                    f" + ({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) div 100"
                ).alias("rank"),
            )
            if checkpoint_rounds:
                ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        edges.unpersist()
        nodes.unpersist()
        contrib_edges.unpersist()


def dedup_keep_representatives(
    docs: DataFrame, edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Near-dup dedup by clustering: every doc in a component keeps
    only the min-id representative; docs in no pair survive untouched.
    Returns docs ∖ (cluster members that are not their component's
    representative)."""
    comps = connected_components(edges, a, b)
    losers = comps.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")
