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
    pairs; only recall is approximate."""
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
    e = embeddings.select(
        F.col(id_col), F.col(vec_col), F.explode(buckets).alias("bucket")
    )
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "va", "b", "vb")
        .distinct()
    )
    cos = cosine_col(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>"))
    return (
        cand.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
