"""Text analysis for large-scale training-data pipelines.

All pure-column expressions (JVM-side, whole-stage codegen — no Python
in the hot path), designed so an equivalent ANSI-SQL oracle can verify
every value: token counting, quality scoring, n-gram-free language ID
(stopword-hit heuristic), and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword markers for the heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "los", "de"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "les", "des", "et"],
    "zh": ["的", "是", "在", "了"],
}


def _marker_regex(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count_col(text: str | Column) -> Column:
    """Whitespace tokenization — size of the split array."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+"))


# GPT-2-style pre-tokenizer pattern, restricted to the RE2-expressible
# subset (no lookahead) so a SQL engine recomputes the same counts:
# contraction suffixes, optionally-space-prefixed letter runs, digit
# runs, punctuation runs. Trailing pure-whitespace tokens are not
# counted (the lookahead cases of the original merge into token
# prefixes here). Matched case-sensitively like the original.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token accounting with the GPT-2 pre-tokenizer
    regex (Radford et al. 2019 — the split BPE merges start from; the
    count upper-bounds and tightly tracks real BPE token counts, the
    standard pre-costing proxy when the merge table isn't shipped to
    the cluster). Whitespace-token ratio compares it against the
    coarse split: pure codegen projections, zero shuffles."""
    t = F.col(text_col)
    bpe = F.regexp_count(t, F.lit(BPE_TOKEN_RE))
    ws = token_count_col(t)
    return docs.select(
        "doc_id",
        bpe.alias("n_bpe_tokens"),
        ws.alias("n_ws_tokens"),
        F.round(bpe / ws, 4).alias("bpe_per_ws_token"),
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(F.length(F.regexp_replace(text_col, r"\s+", "")) / F.size(toks), 4).alias(
            "avg_token_len"
        ),
    )


# Unicode script ranges by explicit codepoint BLOCKS (not \p{Script=}
# properties, whose tables drift across Unicode versions between
# engines) — identical semantics in Java regex and RE2, so the SQL
# oracle recomputes the same counts. Priority order = tie-break order.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("cjk", "぀-ヿ一-鿿가-힯"),
    ("arabic", "؀-ۿ"),
]


def script_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode-script composition: the ratio of non-space
    characters in each major script block plus the dominant script —
    the standard cheap triage before language-specific pipelines in a
    multilingual crawl (script ≠ language, but a CJK-dominant page
    never goes to the Latin tokenizer). Pure codegen projections, zero
    shuffles; dominant = first maximal ratio in SCRIPT_RANGES order
    ('other' only when every listed script scores 0)."""
    t = F.col(text_col)
    nonspace = F.length(F.regexp_replace(t, r"\s+", ""))
    # nullif-guard the denominator: 0/0 is NaN, and Spark sorts NaN
    # ABOVE every double, so a whitespace-only doc would win the
    # array_max > 0 test and be mislabeled 'latin' instead of 'other'
    # (and diverge from the SQL oracle's NULL-on-zero division)
    safe_nonspace = F.nullif(nonspace, F.lit(0))
    ratios = [
        F.coalesce(
            F.round(
                F.length(F.regexp_replace(t, f"[^{rng}]", "")) / safe_nonspace,
                4,
            ),
            F.lit(0.0),
        ).alias(f"{name}_ratio")
        for name, rng in SCRIPT_RANGES
    ]
    out = docs.select("doc_id", *ratios)
    arr = F.array(*[F.col(f"{n}_ratio") for n, _ in SCRIPT_RANGES])
    name_arr = F.array(*[F.lit(n) for n, _ in SCRIPT_RANGES])
    dominant = F.when(
        F.array_max(arr) > 0.0,
        name_arr[(F.array_position(arr, F.array_max(arr)) - 1).cast("int")],
    ).otherwise(F.lit("other"))
    return out.withColumn("dominant_script", dominant)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: alpha ratio, digit ratio, stopword
    ratio, length band — the usual cheap pre-filters before expensive
    model-based scoring."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    stop_hits = F.regexp_count(F.lower(t), F.lit(_marker_regex(LANG_MARKERS["en"])))
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    return docs.select(
        "doc_id",
        F.round(alpha / n, 4).alias("alpha_ratio"),
        F.round(digits / n, 4).alias("digit_ratio"),
        F.round(stop_hits / n_tokens, 4).alias("stopword_ratio"),
        F.when(n < 100, "short").when(n < 300, "medium").otherwise("long").alias("len_band"),
    )


def lang_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: argmax of per-language marker counts
    (deterministic tie-break by language code)."""
    t = F.lower(F.col(text_col))
    hits = [
        F.struct(
            F.regexp_count(t, F.lit(_marker_regex(words))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, words in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    # array_max picks highest hits; ties resolved toward the earlier code
    # because reverse-sorted structs compare (hits, code) lexicographically
    best = F.array_max(F.array(*hits))
    return docs.select("doc_id", best["code"].alias("lang_guess"), best["hits"].alias("marker_hits"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized lowercase md5 — the exact-dedup key."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy (bits) of the document's unigram token
    distribution — the cheap perplexity proxy corpus filters use to
    catch degenerate text (near-zero entropy = repeated tokens; the
    ceiling log2(n_tokens) = no repetition at all).

    H = log2(n) - (Σ c·log2(c)) / n over per-token counts c — one
    explode plus two map-side-combinable hash aggs keyed by doc_id.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    counts = (
        docs.select("doc_id", F.explode(words).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log2("c")).alias("s"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.round(F.log2("n") - F.col("s") / F.col("n"), 4).alias("entropy"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by tf·idf
    (idf = ln(N/df)) — the classic keyword/topic signal a corpus
    explorer runs after cleaning.

    Shape at scale: (doc_id, term) count agg → term-keyed df agg
    (one row per vocab term, bounded build side) → join back → per-doc
    row_number window. The window partitions by doc_id, so no single
    task ever sees more than one document's terms. The rank key is the
    score ROUNDED to 6 decimals (ties then break on the term string):
    cross-engine ln() agrees to ~1 ULP, so ranking on the raw double
    would let a 1e-16 difference flip the order of genuinely-tied
    terms between engines; rounding first makes the order — and the
    oracle comparison — deterministic."""
    from pyspark.sql import Window

    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tf = (
        docs.select("doc_id", F.explode(words).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    score = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.round(score, 6).desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", F.round(score, 4).alias("tfidf"), "rank")
    )


def gram_array(words: Column, n: int) -> Column:
    """Word n-gram array from a token array, empty when the document
    has fewer than n tokens (``F.sequence(1, 0)`` would count DOWN —
    Spark infers a negative step — so the short-doc case needs the
    explicit guard)."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1),
    adapted to token streams: the fraction of token/bigram/trigram
    slots occupied by the single most frequent token / 2-gram /
    3-gram, plus the distinct-token ratio. High values mark the
    boilerplate / keyword-stuffing / degenerate-generation documents a
    pre-training corpus filter drops first.

    Shape at scale: three explode → (doc_id, gram) partial-count →
    per-doc aggregations, all map-side-combinable hash aggs keyed by
    doc_id — no joins across documents, so the operator is embarrassingly
    parallel over the corpus. Fractions for docs too short to have any
    2-/3-grams are 0.0 by definition.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.select("doc_id", words.alias("w"))

    def _top(n: int) -> DataFrame:
        return (
            base.select("doc_id", F.explode(gram_array(F.col("w"), n)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(
                F.max("c").alias(f"max{n}"),
                F.count("*").alias(f"nd{n}"),
                F.sum("c").alias(f"n{n}"),
            )
        )

    t1, t2, t3 = _top(1), _top(2), _top(3)
    return (
        t1.join(t2, "doc_id", "left")
        .join(t3, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n1").alias("n_tokens"),
            F.round(F.col("max1") / F.col("n1"), 4).alias("top_token_frac"),
            F.round(F.col("nd1") / F.col("n1"), 4).alias("distinct_token_ratio"),
            F.coalesce(F.round(F.col("max2") / F.col("n2"), 4), F.lit(0.0)).alias(
                "top_2gram_frac"
            ),
            F.coalesce(F.round(F.col("max3") / F.col("n3"), 4), F.lit(0.0)).alias(
                "top_3gram_frac"
            ),
        )
    )
