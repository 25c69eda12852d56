"""Sharded bloom filter over canonical-URL xxhash64 keys — bits live
as a ``(shard, bits)`` TABLE, never as one driver/broadcast array.

Replaces the reference's in-memory ``set[str]`` membership test
(engine.py:60,99-106) on the fast path. The authoritative seen set is
the checkpointed ``seen`` table; the bloom is a pre-filter so that
definitely-unseen URLs never enter the exact anti-join.

Scale design (north rule: "partitioned bloom/cuckoo-filter URL-seen
set"):

- the filter is *sharded* by ``pmod(url_hash, n_shards)``; each shard
  is an independent bit array stored as one row of a ``(shard:int,
  bits:binary)`` parquet table inside the checkpoint. All k probe
  positions derive from the single 64-bit xxhash64 key by splitmix64
  remixing — no string re-hashing.
- **maintenance is merge-on-read, like the frontier**: each round
  writes only an OR-*delta* part (the touched shards' delta bit
  arrays, built executor-side by ``delta_bits_df`` — O(new URLs) IO);
  readers OR all parts per shard; checkpoint compaction periodically
  folds the parts into one base (``fold_bits``). No URL hash and no
  bit array ever lands on the driver.
- **probes are shard-local** (``probe_maybe``): ONLY the 8-byte hash
  column is exchanged, grouped by ``pmod(url_hash, n_shards)`` and
  cogrouped with the bits table on ``shard`` — each task holds just
  the one shard it probes, vectorized in numpy over Arrow batches.
  Nothing is broadcast.
- sizing at the 10^10-URL / 1% fp target: 2^37 total bits → 4096
  shards × 2^25 bits = 4 MiB per shard row. What each process actually
  holds: driver **0 bytes** of filter; an executor task holds ONE
  shard (4 MiB) plus its hash batch during probe or fold; the
  checkpoint stores ≤16 GiB of parts spread across shard rows, written
  incrementally (per-round delta ≈ round's new-URL bits only).

``ShardedBloom`` below keeps the driver-resident array form as the
reference implementation for unit tests and for the equivalence test
pinning the table path (test_bloom_table_probe_equals_driver_filter);
the engine itself uses only the table form (``BloomTable``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

BITS_SCHEMA = "shard int, bits binary"


def delta_bits_df(df: DataFrame, n_shards: int, bits_per_shard: int, k: int,
                  hash_col: str = "url_hash") -> DataFrame:
    """OR-delta bits for ``df``'s hashes as a sparse (shard, bits)
    DataFrame — only touched shards appear. The single exchange carries
    the 8-byte hash column; each task builds its shard's delta
    vectorized (np.bitwise_or.at over the packed array)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf[hash_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"shard": [int(pdf["_shard"].iloc[0])],
             "bits": [_delta_bits(h, k, bits_per_shard).tobytes()]}
        )

    return (
        df.select(hash_col)
        .withColumn("_shard", F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int"))
        .groupBy("_shard")
        .applyInPandas(build, schema=BITS_SCHEMA)
    )


def fold_bits(parts: DataFrame) -> DataFrame:
    """OR-fold multiple (shard, bits) parts into one row per shard
    (checkpoint compaction). One keyed shuffle of fixed-size rows."""

    def orfold(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "bits": [acc.tobytes()]})

    return parts.groupBy("shard").applyInPandas(orfold, schema=BITS_SCHEMA)


def probe_maybe(df: DataFrame, bits: DataFrame, n_shards: int,
                bits_per_shard: int, k: int,
                hash_col: str = "url_hash") -> DataFrame:
    """Distinct 'maybe seen' hashes of ``df[hash_col]`` — the
    shard-local probe. ONLY the hash column is exchanged (grouped by
    ``pmod(hash, n_shards)``, asserted by the plan audit); the bits
    table cogroups on ``shard`` so each task holds exactly the one
    shard it probes. Multiple bits rows per shard (un-compacted
    merge-on-read parts) are OR-ed before probing. A shard with no
    bits row has nothing seen → no maybes."""

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return pd.DataFrame({"url_hash": np.empty(0, dtype=np.int64)})
        bb = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
        if len(right) > 1:
            bb = bb.copy()
            for b in right["bits"].iloc[1:]:
                bb |= np.frombuffer(b, dtype=np.uint8)
        h = np.unique(left["url_hash"].to_numpy(dtype=np.int64))
        pos = _positions(h, k, bits_per_shard)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        hit = (bb[byte_idx] & bit != 0).all(axis=1)
        return pd.DataFrame({"url_hash": h[hit]})

    hashes = (
        df.select(F.col(hash_col).alias("url_hash"))
        .withColumn("_shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))
    )
    return (
        hashes.groupBy("_shard")
        .cogroup(bits.groupBy("shard"))
        .applyInPandas(probe, schema="url_hash long")
    )


class BloomTable:
    """Checkpoint-backed sharded bloom: the engine's scale form. Holds
    only metadata (paths via the checkpoint manifest + sizing); bits
    stay in (shard, bits) parquet parts, probed shard-locally. See the
    module docstring for the 10^10 sizing of what each process holds."""

    def __init__(self, ckpt, n_shards: int, bits_per_shard: int, k: int) -> None:
        assert bits_per_shard & (bits_per_shard - 1) == 0, "bits_per_shard must be 2^n"
        self.ckpt = ckpt
        self.n_shards = n_shards
        self.bits_per_shard = bits_per_shard
        self.k = k

    @property
    def _parts(self) -> list[str]:
        return self.ckpt.manifest.get("bloom_parts") or []

    @property
    def is_empty(self) -> bool:
        return not self._parts

    def bits_df(self) -> DataFrame:
        import os

        paths = [os.path.join(self.ckpt.root, p) for p in self._parts]
        return self.ckpt.spark.read.schema(BITS_SCHEMA).parquet(*paths)

    def maybe_hashes(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        return probe_maybe(df, self.bits_df(), self.n_shards,
                           self.bits_per_shard, self.k, hash_col)

    def delta_for(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        return delta_bits_df(df, self.n_shards, self.bits_per_shard, self.k, hash_col)


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

    # --- executor-built deltas, driver-merged (test/driver form only;
    # the engine's scale path is BloomTable, which never merges or
    # holds bits on the driver) ---
    def update_from_df(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """Merge every ``hash_col`` value of ``df`` into the in-memory
        filter with ONE Spark job: each shard group builds its OR-delta
        executor-side, the driver merges ≤ n_shards fixed-size arrays
        (O(filter bits), never O(rows))."""
        n = df.count()
        deltas = delta_bits_df(df, self.n_shards, self.bits_per_shard,
                               self.k, hash_col).collect()
        for r in deltas:
            self.bits[r["shard"]] |= np.frombuffer(r["bits"], dtype=np.uint8)
        self.count += n

    def bits_df(self, spark) -> DataFrame:
        """The in-memory filter as a sparse (shard, bits) DataFrame —
        the table form BloomTable stores in the checkpoint."""
        rows = [
            (int(s), bytes(self.bits[s]))
            for s in range(self.n_shards)
            if self.bits[s].any()
        ]
        return spark.createDataFrame(rows or [], schema=BITS_SCHEMA)

    def maybe_hashes(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Shard-local probe against the in-memory bits (test form;
        same code path as BloomTable.maybe_hashes)."""
        spark = df.sparkSession
        return probe_maybe(df, self.bits_df(spark), self.n_shards,
                           self.bits_per_shard, self.k, hash_col)

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
