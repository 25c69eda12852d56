"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: exact baseline, one pass, JVM-side
  ``aggregate``/``zip_with`` arithmetic (no Python);
- LSH-bucketed ANN: random-hyperplane sign buckets prune candidates
  before the exact rerank — the scale path (bucket equi-join instead
  of scanning all N per query).

Hyperplanes are deterministic (seeded), embedded as literals so a SQL
oracle can recompute the same buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return [[round(float(v), 6) for v in rng.randn(dim)] for _ in range(n_planes)]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector. orderBy+limit
    compiles to TakeOrderedAndProject (per-partition heaps, no global
    sort materialization)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(v, q), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket_col(vec_col: Column, planes: list[list[float]]) -> Column:
    """Bucket id = integer of sign bits of ⟨v, plane_i⟩."""
    acc = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, pl) > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0))
        acc = acc + bit
    return acc


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_planes: int = 4,
    k: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: exact rerank within the query's hyperplane-sign bucket.

    At 10^10 scale the bucket column is a partition key: candidates
    land in one partition-pruned scan instead of a full pass."""
    dim = len(query_vec)
    planes = hyperplanes(n_planes, dim, seed)
    v = F.col(vec_col).cast("array<double>")
    qnp = query_vec
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(qnp, p)) > 0:
            qbucket |= 1 << i
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.withColumn("bucket", lsh_bucket_col(v, planes))
        .filter(F.col("bucket") == qbucket)
        .select(F.col(id_col), F.round(cosine_col(v, q), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ τ, LSH-bucketed: only pairs
    sharing a sign-bucket in ≥1 of ``n_tables`` independent hyperplane
    tables are compared (the multi-table trick: each table misses a
    true pair with prob (1-p^k); L tables miss with (1-p^k)^L, so
    recall → 1 exponentially in L while the join stays bucket-bounded).
    Precision is exact — every candidate passes the true cosine
    post-filter, so the output is always a SUBSET of the brute-force
    pairs; only recall is approximate.

    Join shape: ONLY ids ride the bucket join and the cross-table
    pair dedup — vectors rejoin by id afterwards, and each vector's
    norm is folded once per side (not once per pair). Candidates
    outnumber vectors by orders of magnitude, so shuffling arrays
    through the candidate stage is the thing that must never happen
    at 10^10 scale (it was also the sandbox's 95-second hot spot).
    The cosine expression is unchanged — dot-fold / (norm-fold ·
    norm-fold) — so every value is bit-identical to the brute-force
    oracle's."""
    first = embeddings.select(F.col(vec_col)).first()
    dim = len(first[0])
    v = F.col(vec_col).cast("array<double>")
    # table t's bucket is prefixed with t so tables never cross-match
    buckets = F.array(*[
        F.concat_ws(
            ":", F.lit(t),
            lsh_bucket_col(v, hyperplanes(n_planes, dim, seed + 101 * t)).cast("string"),
        )
        for t in range(n_tables)
    ])
    e = embeddings.select(F.col(id_col), F.explode(buckets).alias("bucket"))
    cand = (
        e.select(F.col(id_col).alias("a"), "bucket")
        .join(e.select(F.col(id_col).alias("b"), "bucket"), "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return _score_pairs(cand, embeddings, threshold, id_col, vec_col)


def _score_pairs(
    cand: DataFrame,
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine rerank of an (a, b) id-pair candidate set: vectors
    rejoin by id (ids-only candidate generation upstream), each side's
    norm folded once per vector, cosine = dot / (na·nb) rounded to 4dp
    and thresholded. Output ⊆ brute-force pairs for any candidate set —
    precision is structural, only recall depends on the generator."""
    v = F.col(vec_col).cast("array<double>")
    ev = embeddings.select(
        F.col(id_col), v.alias("_v"), _norm(v).alias("_n")
    )
    pairs = cand.join(
        ev.select(F.col(id_col).alias("a"), F.col("_v").alias("va"), F.col("_n").alias("na")), "a"
    ).join(
        ev.select(F.col(id_col).alias("b"), F.col("_v").alias("vb"), F.col("_n").alias("nb")), "b"
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 8,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic dedup in the SemDeDup shape (Abbas et al. 2023,
    arXiv:2303.09540): coarse-quantize the embeddings with k-means
    (``ivf_centroids`` by default; pass ``centroids`` to reuse a
    trained/SQL-recomputable quantizer such as ``prefix_centroids``),
    generate candidate pairs WITHIN a cluster only — the paper's
    approximation, which bounds pair volume to Σ n_c² instead of n² —
    exact-cosine rerank (≥ τ), connected components, and every vector
    labeled with its component's min id (itself when unpaired) plus
    ``keep`` = is-representative. The keep/drop partition is what
    corpus dedup actually applies — pairs alone aren't transitive.

    100 TB shape: quantizer training is a bounded driver sample
    (``ivf_centroids``); assignment is a pure column expression over
    the full table; the candidate join is cluster-keyed (one shuffle,
    never all-pairs, per-key fan-out n_c² with n_c ≈ n/k); clustering
    is hash-min label propagation — keyed shuffles only, O(component
    diameter) rounds (semantic-dup clusters are shallow). Cross-cluster
    duplicates are missed by construction — the paper's documented
    recall trade; raise ``n_clusters`` resolution or re-run on cluster
    representatives to tighten it."""
    from silkworm_spark.operators.graph import connected_components

    if centroids is None:
        centroids = ivf_centroids(
            embeddings, n_clusters=n_clusters, id_col=id_col, vec_col=vec_col
        )
    ids = ivf_assign(embeddings, centroids, vec_col).select(
        F.col(id_col), F.col("cluster").alias("_sd_c")
    )
    cand = (
        ids.select(F.col(id_col).alias("a"), "_sd_c")
        .join(ids.select(F.col(id_col).alias("b"), "_sd_c"), "_sd_c")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    pairs = _score_pairs(cand, embeddings, threshold, id_col, vec_col)
    comps = connected_components(pairs).withColumnRenamed("doc_id", id_col)
    return (
        embeddings.select(F.col(id_col))
        .join(comps, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster"))
    )


# ---- IVF (inverted-file) ANN: the coarse-quantizer scale path ----

def ivf_centroids(
    embeddings: DataFrame,
    n_clusters: int = 16,
    iters: int = 5,
    sample_rows: int = 50_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd k-means on a bounded driver sample: the
    coarse quantizer of an IVF index. Init = the first ``n_clusters``
    vectors in id order (no RNG, resume/replay-stable); at 100 TB the
    sample is a tiny fixed-size pull while assignment/search below stay
    fully distributed."""
    rows = (
        embeddings.orderBy(id_col).limit(sample_rows)
        .select(vec_col).collect()
    )
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    c = x[:n_clusters].copy()
    for _ in range(iters):
        sims = x @ c.T  # cosine == dot on normalized vectors
        assign = sims.argmax(axis=1)
        for j in range(n_clusters):
            m = x[assign == j]
            if len(m):
                v = m.mean(axis=0)
                c[j] = v / (np.linalg.norm(v) + 1e-12)
    return [[round(float(v), 6) for v in row] for row in c]


def prefix_centroids(
    embeddings: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Quantizer = the first ``n_clusters`` vectors in id order,
    unit-normalized, rounded to 6 decimals — a deterministic,
    SQL-recomputable centroid set (no k-means iterations), so the
    PARTIAL-probe IVF search can be value-oracled cross-engine
    (oracle ``embed_ivf_topk_nprobe``). Production trains with
    ``ivf_centroids``; the search path below is identical either way —
    this is the "externally supplied quantizer" loading pattern."""
    rows = (
        embeddings.orderBy(id_col).limit(n_clusters).select(vec_col).collect()
    )
    cents = []
    for r in rows:
        v = np.asarray(r[0], dtype=np.float64)
        nv = np.linalg.norm(v)
        cents.append([round(float(x / nv), 6) for x in v])
    return cents


def _nearest_centroid_col(vec: Column, centroids: list[list[float]]) -> Column:
    """argmax over centroid dot products, as a pure column expression
    (centroids embedded as literals → SQL-oracle-recomputable). Built
    as one sims array + array_position(max) — NOT a folded F.when
    chain, which embeds every previous step's expression tree into the
    next and goes exponential in len(centroids) (8 centroids × 64-dim
    dots took ~9 s of Catalyst planning per query before this).
    array_position returns the FIRST maximal index, the same min-index
    tie-break the SQL oracles' ``ORDER BY sim DESC, cid`` uses."""
    norm = _norm(vec)  # constant per row — keeps sims == true cosines
    sims = F.array(*[
        _dot(vec, F.array(*[F.lit(float(v)) for v in cvec])) / norm
        for cvec in centroids
    ])
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    partition_by_cluster: bool = False,
) -> DataFrame:
    """Attach the IVF list id. With ``partition_by_cluster`` the table
    is physically clustered on it — the layout that turns a top-k query
    into a scan of nprobe partitions instead of all N (partition
    pruning on the `cluster` column when persisted partitioned)."""
    out = embeddings.withColumn(
        "cluster", _nearest_centroid_col(F.col(vec_col).cast("array<double>"), centroids)
    )
    if partition_by_cluster:
        out = out.repartition("cluster")
    return out


def ivf_topk(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: rank centroids against the query driver-side, scan
    only the ``nprobe`` nearest inverted lists, exact cosine rerank
    inside them. ``nprobe == len(centroids)`` degenerates to exact
    brute force (the verification mode — the driver oracle uses it);
    small nprobe is the 100 TB path (recall tested in
    tests/test_similarity_recall.py)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) + 1e-12)
    sims = np.asarray(centroids, dtype=np.float64) @ qn
    # deterministic tie-break: higher sim first, lower list id on ties
    # (matches the SQL oracle's ORDER BY sim DESC, cid ASC)
    order = np.lexsort((np.arange(len(sims)), -sims))
    probe = [int(i) for i in order[:nprobe]]
    assigned = ivf_assign(embeddings, centroids, vec_col)
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = cosine_col(F.col(vec_col).cast("array<double>"), qlit)
    return (
        assigned.filter(F.col("cluster").isin(probe))
        .select(id_col, F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
