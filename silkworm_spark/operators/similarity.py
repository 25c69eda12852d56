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
    n_planes: int = 2,
    n_tables: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shape semantic dedup (Abbas et al. 2023): embedding
    near-dup pairs (multi-table hyperplane LSH, cosine ≥ τ) → connected
    components → every vector labeled with its component's min id
    (itself when unpaired) and ``keep`` = is-representative. The
    keep/drop partition is what corpus dedup actually applies — pairs
    alone aren't transitive.

    100 TB shape: the candidate join is LSH-bucket-bounded (never
    all-pairs) and the clustering is hash-min label propagation —
    keyed shuffles only, O(component diameter) rounds (semantic-dup
    clusters are shallow)."""
    from silkworm_spark.operators.graph import connected_components

    pairs = embedding_neardup_pairs(
        embeddings, threshold, n_planes, n_tables, seed, id_col, vec_col
    )
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
    (centroids embedded as literals → SQL-oracle-recomputable)."""
    norm = _norm(vec)
    best_sim, best_idx = None, None
    for j, cvec in enumerate(centroids):
        lit = F.array(*[F.lit(float(v)) for v in cvec])
        sim = _dot(vec, lit) / norm  # centroid is unit-norm already
        if best_sim is None:
            best_sim, best_idx = sim, F.lit(j)
        else:
            better = sim > best_sim
            best_idx = F.when(better, F.lit(j)).otherwise(best_idx)
            best_sim = F.when(better, sim).otherwise(best_sim)
    return best_idx


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
