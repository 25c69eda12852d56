"""Sharded bloom filter over canonical-URL xxhash64 keys, maintained
executor-side.

Replaces the reference's in-memory ``set[str]`` membership test
(engine.py:60,99-106) on the fast path. The authoritative seen set is
the checkpointed ``seen`` table; the bloom is a pre-filter so that
definitely-unseen URLs (the overwhelming majority each round) never
shuffle into the exact anti-join.

Scale design (north rule: "partitioned bloom/cuckoo-filter URL-seen
set"):

- the filter is *sharded* by ``pmod(url_hash, n_shards)``; each shard
  is an independent bit array. Maintenance is executor-side: one
  ``applyInPandas`` job groups the round's new hashes by shard and
  emits one OR-delta bit array per shard — the driver merges at most
  ``n_shards`` fixed-size arrays (O(filter bits), never O(rows)). No
  URL hash is ever collected to the driver.
- probes broadcast the bits once per round (``SparkContext.broadcast``)
  and test k positions fully vectorized in numpy inside an Arrow
  pandas UDF. All k positions derive from the single 64-bit xxhash64
  key by splitmix64 remixing — no string re-hashing.
- the bits are serialized into each round's checkpoint
  (plans/checkpoint.py) so resume restores the filter instead of
  rebuilding it from 10^10 seen rows. On a cluster the shards map 1:1
  onto seen-table partitions; sizing is ``n_shards * bits_per_shard``
  (10^10 URLs at 1% fp ≈ 2^37 bits → 4096 shards x 2^25 bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _shard_of(hashes: np.ndarray, n_shards: int) -> np.ndarray:
    # matches F.pmod(col, n_shards) on the signed int64 JVM side
    return np.mod(hashes.astype(np.int64), n_shards).astype(np.int64)


def _positions(hashes: np.ndarray, k: int, bits_per_shard: int) -> np.ndarray:
    """(n, k) in-shard bit positions for int64 xxhash64 keys."""
    h = hashes.astype(np.int64).view(np.uint64)
    out = np.empty((len(h), k), dtype=np.uint64)
    cur = h
    for j in range(k):
        cur = _splitmix64(cur)
        out[:, j] = cur & np.uint64(bits_per_shard - 1)
    return out


def _delta_bits(hashes: np.ndarray, k: int, bits_per_shard: int) -> np.ndarray:
    """Packed OR-delta bit array for one shard's hashes."""
    bits = np.zeros(bits_per_shard // 8, dtype=np.uint8)
    if len(hashes):
        pos = _positions(hashes, k, bits_per_shard).ravel()
        np.bitwise_or.at(
            bits, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
        )
    return bits


_DELTA_SCHEMA = T.StructType(
    [T.StructField("shard", T.IntegerType()), T.StructField("bits", T.BinaryType())]
)


class ShardedBloom:
    def __init__(self, n_shards: int = 64, bits_per_shard: int = 1 << 17, k: int = 7) -> None:
        assert n_shards >= 1
        assert bits_per_shard & (bits_per_shard - 1) == 0, "bits_per_shard must be 2^n"
        self.n_shards = n_shards
        self.bits_per_shard = bits_per_shard
        self.k = k
        self.bits = np.zeros((n_shards, bits_per_shard // 8), dtype=np.uint8)
        self.count = 0

    @property
    def is_empty(self) -> bool:
        return self.count == 0

    # --- driver-side maintenance (tests / tiny inputs) ---
    def add_many(self, hashes) -> None:
        h = np.asarray(hashes, dtype=np.int64)
        if len(h) == 0:
            return
        shards = _shard_of(h, self.n_shards)
        for s in np.unique(shards):
            self.bits[s] |= _delta_bits(h[shards == s], self.k, self.bits_per_shard)
        self.count += len(h)

    def contains_many(self, hashes) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        shards = _shard_of(h, self.n_shards)
        pos = _positions(h, self.k, self.bits_per_shard)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        return (self.bits[shards[:, None], byte_idx] & bit != 0).all(axis=1)

    # --- executor-side maintenance (the scale path) ---
    def update_from_df(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """Merge every ``hash_col`` value of ``df`` into the filter with
        ONE Spark job: hashes shuffle by shard (narrow single column),
        each shard group builds its OR-delta bit array executor-side,
        and the driver merges ≤ n_shards fixed-size arrays. Driver data
        volume is O(filter bits), independent of the row count."""
        k, bps = self.k, self.bits_per_shard

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {"shard": [int(pdf["_shard"].iloc[0])],
                 "bits": [_delta_bits(h, k, bps).tobytes()],
                 "n": [len(h)]}
            )

        deltas = (
            df.select(hash_col)
            .withColumn("_shard", F.pmod(F.col(hash_col), F.lit(self.n_shards)).cast("int"))
            .groupBy("_shard")
            .applyInPandas(build, schema="shard int, bits binary, n long")
            .collect()
        )
        for r in deltas:
            self.bits[r["shard"]] |= np.frombuffer(r["bits"], dtype=np.uint8)
            self.count += r["n"]

    def probe_col(self, df_or_spark, hash_col: str) -> Column:
        """Boolean column: True = *maybe* seen (needs the exact
        anti-join); False = definitely unseen (skips the join). The
        bits ship once per executor via a Spark broadcast."""
        spark = getattr(df_or_spark, "sparkSession", df_or_spark)
        bc = spark.sparkContext.broadcast(self.bits)
        n_shards, k, bps = self.n_shards, self.k, self.bits_per_shard

        @pandas_udf(BooleanType())
        def probe(hashes: pd.Series) -> pd.Series:
            bits = bc.value
            h = hashes.to_numpy(dtype=np.int64)
            if len(h) == 0:
                return pd.Series(np.zeros(0, dtype=bool))
            shards = _shard_of(h, n_shards)
            pos = _positions(h, k, bps)
            byte_idx = (pos >> np.uint64(3)).astype(np.int64)
            bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
            return pd.Series((bits[shards[:, None], byte_idx] & bit != 0).all(axis=1))

        return probe(F.col(hash_col))

    # --- checkpoint (de)serialization ---
    def save(self, path: str) -> None:
        np.savez_compressed(path, bits=self.bits, k=self.k, count=self.count)

    @classmethod
    def load(cls, path: str) -> "ShardedBloom":
        z = np.load(path)
        bits = z["bits"]
        if bits.ndim == 1:  # pre-shard checkpoint format
            bits = bits.reshape(1, -1)
        bf = cls(n_shards=bits.shape[0], bits_per_shard=bits.shape[1] * 8, k=int(z["k"]))
        bf.bits = bits
        bf.count = int(z["count"])
        return bf
