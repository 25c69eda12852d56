"""Benchmark decontamination for training-data pipelines.

Finds training documents that share word n-grams with an evaluation
benchmark set — the standard contamination check run before a corpus
ships (GPT-3 appendix C / PaLM-style 8-gram overlap; the n is a
parameter because published pipelines range 8-13).

Shape at scale: the benchmark side is tiny relative to the corpus
(10^5-10^6 distinct eval n-grams vs 10^10+ corpus grams), so its
distinct-gram set is BROADCAST and the probe is a map-side hash join
against the streamed corpus grams — no shuffle of the corpus at all;
the only shuffles are the two per-doc count aggregations, keyed by
doc_id (map-side combinable). Gram hashing reuses the md5-derived
32-bit shingle hash from dedup_corpus so a DuckDB oracle recomputes
every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from silkworm_spark.operators.dedup_corpus import shingle_hashes


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_overlap, n_grams, overlap_frac) for every corpus
    document sharing ≥1 distinct word-n-gram with the benchmark set.

    ``n_grams`` counts the document's distinct grams, so
    ``overlap_frac`` is the contaminated fraction of its distinct
    n-gram set — the quantity pipelines threshold on to drop (or flag)
    a document before pre-training."""
    cg = shingle_hashes(corpus, n, text_col)
    bg = shingle_hashes(benchmark, n, text_col).select("h").distinct()
    sizes = cg.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        cg.join(F.broadcast(bg), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_overlap",
        "n_grams",
        F.round(F.col("n_overlap") / F.col("n_grams"), 4).alias("overlap_frac"),
    )
