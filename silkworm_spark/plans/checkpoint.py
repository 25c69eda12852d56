"""Atomic per-round checkpointing (Iceberg-contract tables on Parquet).

No Iceberg runtime ships in this sandbox (no network for jars), so the
same contract — snapshot isolation, atomic commit, exact resume — is
realized as Parquet table-directories plus a JSON manifest committed by
write-temp + atomic rename. Append-log tables (seen, documents,
metrics, fetch_log) accumulate one directory per round and are read as
a multi-path union (partition-pruned scans); snapshot tables (frontier,
host_state) point at the latest round only. The bloom filter bits ride
along in the same commit, so resume never rebuilds them from the seen
table.

This is the rebuild of the reference's implicit state — the in-memory
queue/seen/stats that vanish on crash (engine.py:52-77) — as durable,
resumable state (north rule: "resumes exactly, carrying per-partition
lineage and fetch/parse metrics").
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.types import StructType

from silkworm_spark import schemas
from silkworm_spark.plans.bloom import BloomFilter

_APPEND_TABLES = ("seen", "documents", "metrics", "fetch_log", "frontier_delta", "consumed")
_SNAPSHOT_TABLES = ("host_state",)

TABLE_SCHEMAS: dict[str, StructType] = {
    "frontier_delta": schemas.FRONTIER_SCHEMA,
    "consumed": StructType([T.StructField("seq", T.LongType(), False)]),
    "seen": schemas.SEEN_SCHEMA,
    "documents": schemas.DOCUMENTS_SCHEMA,
    "metrics": schemas.METRICS_SCHEMA,
    "host_state": schemas.HOST_STATE_SCHEMA,
    "fetch_log": StructType(
        [
            T.StructField("round", T.IntegerType()),
            T.StructField("seq", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("host", T.StringType()),
        ]
    ),
}


class CrawlCheckpoint:
    def __init__(self, spark: SparkSession, root: str, compact_every: int = 8) -> None:
        self.spark = spark
        self.root = root
        self.compact_every = compact_every
        os.makedirs(root, exist_ok=True)
        self.manifest: dict[str, Any] = {
            "round": -1,
            "vtime": 0.0,
            "seq_next": 0,
            "tables": {name: [] for name in (*_APPEND_TABLES, *_SNAPSHOT_TABLES)},
            "bloom": None,
        }
        self._load_manifest()

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _load_manifest(self) -> None:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def read(self, name: str) -> DataFrame:
        paths = self.manifest["tables"].get(name, [])
        if not paths:
            return self.spark.createDataFrame([], TABLE_SCHEMAS[name])
        abs_paths = [os.path.join(self.root, p) for p in paths]
        return self.spark.read.schema(TABLE_SCHEMAS[name]).parquet(*abs_paths)

    def read_frontier(self) -> DataFrame:
        """The live frontier is merge-on-read: appended per-round deltas
        (new enqueues) minus consumed seqs (fetched or robots-denied).
        Per-round commit cost is O(round budget), never O(frontier) —
        the property that keeps a 10^10-row frontier checkpointable.
        Compaction (in ``commit``) bounds the read-side anti-join."""
        deltas = self.read("frontier_delta")
        consumed = self.read("consumed")
        if not self.manifest["tables"].get("consumed"):
            return deltas
        return deltas.join(consumed, "seq", "left_anti")

    def load_bloom(self, n_bits: int, k: int) -> BloomFilter:
        if self.manifest.get("bloom"):
            return BloomFilter.load(os.path.join(self.root, self.manifest["bloom"]))
        return BloomFilter(n_bits=n_bits, k=k)

    def commit(
        self,
        round_no: int,
        vtime: float,
        seq_next: int,
        appends: dict[str, DataFrame],
        snapshots: dict[str, DataFrame],
        bloom: BloomFilter | None = None,
    ) -> None:
        """Write this round's data, then atomically publish the manifest.

        A crash before the rename leaves the previous manifest intact →
        the next run resumes from the prior round exactly; orphan round
        directories are inert.
        """
        import concurrent.futures as cf

        rdir = f"round_{round_no:05d}"
        new_manifest = json.loads(json.dumps(self.manifest))  # deep copy
        new_manifest["round"] = round_no
        new_manifest["vtime"] = vtime
        new_manifest["seq_next"] = seq_next

        # all table writes run as concurrent Spark jobs (separate driver
        # threads); the manifest publishes only after every write lands,
        # so atomicity is unchanged — commit wall time ≈ the largest
        # single write instead of the sum
        def write_append(name: str, df: DataFrame) -> tuple[str, str | None]:
            if df is None or df.isEmpty():
                return name, None
            rel = os.path.join(rdir, name)
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            return name, rel

        def write_snapshot(name: str, df: DataFrame) -> tuple[str, str]:
            rel = os.path.join(rdir, name)
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            return name, rel

        with cf.ThreadPoolExecutor(max_workers=len(appends) + len(snapshots) or 1) as pool:
            afuts = [pool.submit(write_append, n, df) for n, df in appends.items()]
            sfuts = [pool.submit(write_snapshot, n, df) for n, df in snapshots.items()]
            for f in afuts:
                name, rel = f.result()
                if rel is not None:
                    new_manifest["tables"].setdefault(name, []).append(rel)
            for f in sfuts:
                name, rel = f.result()
                new_manifest["tables"][name] = [rel]

        # merge-on-read compaction: once enough deltas accumulate, fold
        # deltas ⊖ consumed into one base so the read-side anti-join
        # stays bounded. Still atomic — the compacted base is written
        # before the manifest flips to it; old dirs become inert.
        if len(new_manifest["tables"].get("frontier_delta", [])) >= self.compact_every:
            dpaths = [os.path.join(self.root, p) for p in new_manifest["tables"]["frontier_delta"]]
            live = self.spark.read.schema(TABLE_SCHEMAS["frontier_delta"]).parquet(*dpaths)
            cpaths = [os.path.join(self.root, p) for p in new_manifest["tables"].get("consumed", [])]
            if cpaths:
                consumed = self.spark.read.schema(TABLE_SCHEMAS["consumed"]).parquet(*cpaths)
                live = live.join(consumed, "seq", "left_anti")
            base_rel = os.path.join(rdir, "frontier_base")
            live.write.mode("overwrite").parquet(os.path.join(self.root, base_rel))
            new_manifest["tables"]["frontier_delta"] = [base_rel]
            new_manifest["tables"]["consumed"] = []
        if bloom is not None:
            rel = os.path.join(rdir, "bloom.npz")
            bloom.save(os.path.join(self.root, rel))
            new_manifest["bloom"] = rel

        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_manifest, f)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX
        self.manifest = new_manifest
