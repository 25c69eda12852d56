"""Composed training-data corpus pipeline stages.

The individual operators (exact dedup, quality scoring, language ID,
token stats — operators/dedup_corpus, operators/textstats) compose
into the standard pre-training cleaning flow; these functions are the
compositions a pipeline author actually runs, kept SQL-oracle-exact so
the whole chain is value-verified, not just its pieces:

- ``clean_corpus``: exact-dedup (keep the min doc_id per normalized
  fingerprint) → quality filter (length band + alpha ratio) →
  per-language token accounting. One shuffle for the dedup groupBy,
  one for the final agg; the quality/language columns are pure
  codegen expressions in between.
- ``hash_stratified_sample``: DETERMINISTIC per-stratum sampling by
  content hash — ``md5(doc_id)`` bucketed into 0..9999 and compared
  to a per-stratum permille rate. Hash sampling (not ``sampleBy``'s
  RNG) is the form that is reproducible across engines, resumable
  mid-pipeline, and stable under repartitioning — the properties a
  100 TB corpus job needs; DuckDB recomputes it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from silkworm_spark.operators.dedup_corpus import exact_dedup
from silkworm_spark.operators.textstats import (
    lang_guess,
    quality_score,
    token_count_col,
)


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    min_alpha_ratio: float = 0.5,
    drop_len_bands: tuple = ("short",),
) -> DataFrame:
    """documents → per-language summary of the cleaned corpus:
    (lang_guess, n_docs, n_tokens, avg_alpha) over deduped,
    quality-filtered documents. The winners of exact dedup join back
    to their text by doc_id (broadcast-sized winner set is typical;
    the equi-join scales either way)."""
    winners = exact_dedup(docs, text_col).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept = docs.join(winners, "doc_id")
    q = quality_score(kept, text_col)
    good = (
        q.filter(
            (F.col("alpha_ratio") >= min_alpha_ratio)
            & ~F.col("len_band").isin(*drop_len_bands)
        )
        .select("doc_id", "alpha_ratio")
    )
    lang = lang_guess(kept, text_col).select("doc_id", "lang_guess")
    toks = kept.select("doc_id", token_count_col(text_col).alias("n_tokens"))
    return (
        good.join(lang, "doc_id")
        .join(toks, "doc_id")
        .groupBy("lang_guess")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("alpha_ratio"), 4).alias("avg_alpha"),
        )
    )


def hash_bucket_col(key: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic 0..buckets-1 bucket from md5(key) — the sampling
    key every engine (and the DuckDB oracle) computes identically."""
    return (
        F.conv(F.substring(F.md5(F.col(key) if isinstance(key, str) else key), 1, 8), 16, 10)
        .cast("bigint") % buckets
    )


def hash_stratified_sample(
    docs: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Per-language deterministic sample: keep a document iff its
    md5-hash bucket (0..999) falls below its language's permille rate.
    ``rates_permille``: e.g. {"en": 500, "de": 250} — downsample
    dominant languages, keep the tail. Rows of unlisted languages keep
    ``default_permille``."""
    lang = lang_guess(docs, text_col).select("doc_id", "lang_guess")
    rate = None
    for code, permille in sorted(rates_permille.items()):
        c = F.when(F.col("lang_guess") == code, F.lit(permille))
        rate = c if rate is None else rate.when(F.col("lang_guess") == code, F.lit(permille))
    rate = (rate.otherwise(F.lit(default_permille))
            if rate is not None else F.lit(default_permille))
    return (
        docs.join(lang, "doc_id")
        .withColumn("_bucket", hash_bucket_col(F.col("doc_id").cast("string"), 1000))
        .filter(F.col("_bucket") < rate)
        .select("doc_id", "lang_guess", F.col("_bucket").alias("sample_bucket"))
    )
