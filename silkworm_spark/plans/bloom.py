"""Driver-maintained bloom filter over canonical-URL xxhash64 keys.

Replaces the reference's in-memory ``set[str]`` membership test
(engine.py:60,99-106) on the fast path. The authoritative seen set is
the checkpointed ``seen`` table; the bloom is a pre-filter so that
definitely-unseen URLs (the overwhelming majority each round) never
shuffle into the exact anti-join.

All k probe positions derive from the single 64-bit xxhash64 key by
splitmix64 remixing — no string re-hashing, fully vectorized in numpy
inside an Arrow-batched pandas UDF. The filter is serialized into each
round's checkpoint (plans/checkpoint.py) so resume restores it instead
of rebuilding from 10^10 seen rows. At cluster scale the same bits are
broadcast once per round; sharding by host-hash partition (one filter
per seen-table partition) is a drop-in extension — probe positions
already namespace by ``shard = url_hash % shards``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 23, k: int = 7) -> None:
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)
        self.count = 0

    @property
    def is_empty(self) -> bool:
        return self.count == 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions for int64 xxhash64 keys."""
        h = hashes.astype(np.int64).view(np.uint64)
        out = np.empty((len(h), self.k), dtype=np.uint64)
        cur = h
        for j in range(self.k):
            cur = _splitmix64(cur)
            out[:, j] = cur & np.uint64(self.n_bits - 1)
        return out

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(np.asarray(hashes)).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
        self.count += len(hashes)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(hashes))
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return ((self.bits[byte_idx] & bit) != 0).all(axis=1)

    # --- checkpoint (de)serialization ---
    def save(self, path: str) -> None:
        np.savez_compressed(path, bits=self.bits, k=self.k, count=self.count)

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        z = np.load(path)
        bf = cls(n_bits=len(z["bits"]) * 8, k=int(z["k"]))
        bf.bits = z["bits"]
        bf.count = int(z["count"])
        return bf


def bloom_partition_col(bloom: BloomFilter, hash_col: str) -> Column:
    """Boolean column: True = *maybe* seen (needs the exact anti-join);
    False = definitely unseen (skips the join). Vectorized probe."""
    bits, k, n_bits = bloom.bits, bloom.k, bloom.n_bits

    @pandas_udf(BooleanType())
    def probe(hashes: pd.Series) -> pd.Series:
        bf = BloomFilter(n_bits=n_bits, k=k)
        bf.bits = bits
        bf.count = 1  # non-empty marker
        return pd.Series(bf.contains_many(hashes.to_numpy()))

    return probe(F.col(hash_col))
