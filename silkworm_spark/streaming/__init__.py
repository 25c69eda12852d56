"""Streaming surface.

The reference is a bounded batch job (runs until ``queue.join()``,
engine.py:354) — no watermarks, windows, or late data — so the rebuild
deliberately uses iterative, checkpointed DataFrame rounds instead of
Structured Streaming (SURVEY.md §2.10): explicit table state is
exactly-resumable and the round boundary is the natural politeness
unit.

What Structured Streaming *is* the right tool for here is consuming
the crawl's output as it lands: each round's atomic commit appends new
parquet files under the checkpoint, which downstream jobs can tail as
a file-source stream without coordinating with the crawler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silkworm_spark.plans.checkpoint import TABLE_SCHEMAS


def documents_stream(spark: SparkSession, checkpoint_root: str) -> DataFrame:
    """readStream over the crawl's documents output: downstream
    pipelines (dedup, quality filtering, indexing) attach here and see
    each round's documents as a micro-batch."""
    return (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{checkpoint_root}/round_*/documents")
    )


def metrics_stream(spark: SparkSession, checkpoint_root: str) -> DataFrame:
    """Per-round, per-partition crawl metrics as a stream — the live
    analog of the reference's periodic stats logger (engine.py:318-337)."""
    return (
        spark.readStream.schema(TABLE_SCHEMAS["metrics"])
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{checkpoint_root}/round_*/metrics")
    )


def span_texts_stream(docs: DataFrame) -> DataFrame:
    """Explode a documents stream into (doc_id, offset, kind, text,
    media_ref) span rows — the typical shape for downstream text
    pipelines. Works on batch DataFrames too."""
    return docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.offset", "s.kind", "s.text", "s.media_ref")
