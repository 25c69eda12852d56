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
- ``filter_corpus``: the combined document keep/drop policy (length
  floor + Gopher repetition caps + alpha floor) with audit columns.
- ``source_mix``: the per-(source, language) composition report a
  data recipe is written against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from silkworm_spark.operators.dedup_corpus import exact_dedup
from silkworm_spark.operators.textstats import (
    lang_guess,
    quality_score,
    repetition_stats,
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


def filter_corpus(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 30,
    max_top_token: float = 0.15,
    min_distinct: float = 0.35,
    max_top2: float = 0.08,
    min_alpha: float = 0.5,
) -> DataFrame:
    """The combined document-level keep/drop policy: length floor +
    Gopher-style repetition caps (top-token / top-2-gram occupancy,
    distinct-token ratio) + alpha-ratio floor, returning the surviving
    documents with the features the decision used (the audit columns a
    filtering run must keep). Thresholds apply to the ROUNDED feature
    values the stats operators emit, so the policy is reproducible
    bit-for-bit by any engine computing the same features.

    Shape at scale: repetition/quality/language are per-doc hash aggs
    and column expressions; the three feature tables equi-join on
    doc_id (co-partitioned by the same key — one shuffle each, no
    skew: doc_id is unique)."""
    q = quality_score(docs, text_col).select("doc_id", "alpha_ratio")
    r = repetition_stats(docs, text_col)
    lang = lang_guess(docs, text_col).select("doc_id", "lang_guess")
    return (
        r.join(q, "doc_id")
        .join(lang, "doc_id")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("top_token_frac") <= max_top_token)
            & (F.col("distinct_token_ratio") >= min_distinct)
            & (F.col("top_2gram_frac") <= max_top2)
            & (F.col("alpha_ratio") >= min_alpha)
        )
        .select(
            "doc_id", "lang_guess", "n_tokens", "alpha_ratio",
            "top_token_frac", "distinct_token_ratio", "top_2gram_frac",
        )
    )


def source_mix_weights(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Temperature-scaled sampling weights per source — the data-MIXING
    step of a pre-training recipe (upweight small high-quality sources,
    α=0.5 square-root scaling): w_s = √tokens_s / Σ_s √tokens_s.
    sqrt is IEEE-exact so the weight is DuckDB-recomputable; the
    normalizing sum runs over a handful of source rows (an
    all-partition window on the tiny aggregate table, not on docs)."""
    from pyspark.sql import Window

    toks = (
        docs.select("source", token_count_col(text_col).alias("_nt"))
        .groupBy("source")
        .agg(F.sum("_nt").alias("n_tokens"))
    )
    s = F.sqrt(F.col("n_tokens").cast("double"))
    return toks.select(
        "source",
        "n_tokens",
        F.round(s / F.sum(s).over(Window.partitionBy()), 6).alias("weight"),
    )


def token_budget_pack(
    docs: DataFrame, budget_tokens: int, text_col: str = "text"
) -> DataFrame:
    """Materialize a mixing recipe as an actual document selection:
    allocate a global token budget across sources by the √-scaled mix
    weights (source_mix_weights), then fill each source's allocation
    deterministically in doc_id order — keep a document while the
    running token total stays within the source's budget. This is the
    step between "weights" and "training set": the output IS the epoch
    sample.

    Exactness: per-source budget = floor(weight × budget) with the
    6-dp-rounded weight, and the greedy fill is a windowed cumulative
    sum over integers — every value DuckDB recomputes bit-for-bit.

    100 TB shape: weights are one hash agg over docs; the (source,
    budget) table is tiny and broadcast into the join; the fill is ONE
    window per source partition. The per-source sort is the real cost
    at scale — store the corpus bucketed by source and the window
    degenerates to a partition-local scan."""
    from pyspark.sql import Window

    budgets = source_mix_weights(docs, text_col).select(
        "source",
        F.floor(F.col("weight") * F.lit(float(budget_tokens))).alias("source_budget"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select("doc_id", "source", token_count_col(text_col).alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(budgets), "source")
        .filter(F.col("cum_tokens") <= F.col("source_budget"))
        .select("doc_id", "source", "n_tokens", "cum_tokens", "source_budget")
    )


def source_mix(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(source, language) corpus composition report: document and
    token counts plus mean document length — the mixture table a
    pre-training data recipe is written against (and re-checked after
    every filtering stage). One map-side-combinable hash agg."""
    return (
        docs.select(
            "source", "lang", token_count_col(text_col).alias("_nt"), "n_chars"
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )
