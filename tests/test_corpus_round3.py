"""Round-3 corpus operators: repetition stats edge cases, benchmark
decontamination, connected-components dedup clustering, the combined
filter policy, and the source-mix report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from silkworm_spark.operators.corpus_pipeline import filter_corpus, source_mix
from silkworm_spark.operators.decontam import ngram_contamination
from silkworm_spark.operators.graph import (
    connected_components,
    dedup_keep_representatives,
)
from silkworm_spark.operators.textstats import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_values(spark):
    docs = _docs(spark, [
        (1, "a a a a"),                  # one token repeated
        (2, "a b c d"),                  # all distinct
        (3, "x y x y x y"),              # dominant 2-gram
    ])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["top_token_frac"] == 1.0
    assert got[1]["distinct_token_ratio"] == 0.25
    assert got[1]["top_2gram_frac"] == 1.0           # "a a" fills all 3 slots
    assert got[2]["top_token_frac"] == 0.25
    assert got[2]["distinct_token_ratio"] == 1.0
    assert got[2]["top_2gram_frac"] == pytest.approx(1 / 3, abs=1e-4)
    # "x y" occupies 3 of 5 bigram slots; "x y x" 2 of 4 trigram slots
    assert got[3]["top_2gram_frac"] == 0.6
    assert got[3]["top_3gram_frac"] == 0.5


def test_repetition_stats_short_docs(spark):
    """Docs shorter than the gram width get frac 0.0, not an error or
    a negative-step sequence artifact."""
    docs = _docs(spark, [(1, "solo"), (2, "two words")])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["n_tokens"] == 1
    assert got[1]["top_2gram_frac"] == 0.0
    assert got[1]["top_3gram_frac"] == 0.0
    assert got[2]["top_2gram_frac"] == 1.0   # the single bigram fills its slot
    assert got[2]["top_3gram_frac"] == 0.0


def test_ngram_contamination(spark):
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated words here nothing shared at all"),
        (3, "quick brown fox jumps high above"),
    ])
    bench = _docs(spark, [(100, "a quick brown fox jumps story")])
    got = {r["doc_id"]: r.asDict()
           for r in ngram_contamination(corpus, bench, n=4).collect()}
    # bench 4-grams include "quick brown fox jumps" — docs 1 and 3 hit it
    assert set(got) == {1, 3}
    assert got[1]["n_overlap"] == 1 and got[1]["n_grams"] == 6
    assert got[1]["overlap_frac"] == pytest.approx(1 / 6, abs=1e-4)
    assert got[3]["n_overlap"] == 1 and got[3]["n_grams"] == 3


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round),
    # pair 10-11, and a separate triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a long, b long",
    )
    got = {r["doc_id"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_connected_components_deterministic(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "a long, b long"
    ).repartition(5)
    a = sorted(map(tuple, connected_components(edges).collect()))
    b = sorted(map(tuple, connected_components(edges).collect()))
    assert a == b
    assert all(comp == 1 for _, comp in a)


def test_dedup_keep_representatives(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(1, 7)])
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a long, b long")
    kept = sorted(r["doc_id"] for r in
                  dedup_keep_representatives(docs, edges).collect())
    # components {1,2,3} -> keep 1; {5,6} -> keep 5; 4 untouched
    assert kept == [1, 4, 5]


def test_filter_corpus_policy(spark):
    letters = "abcdefghij"
    words = [letters[i // 10] + letters[i % 10] for i in range(40)]
    docs = _docs(spark, [
        (1, " ".join(words)),                            # clean: passes
        (2, "spam " * 40),                               # top-token 1.0: drop
        (3, " ".join(words[:10])),                       # too short: drop
        (4, " ".join("12 34" for _ in range(20))),       # alpha 0: drop
    ])
    kept = filter_corpus(docs).collect()
    assert [r["doc_id"] for r in kept] == [1]
    row = kept[0].asDict()
    assert row["n_tokens"] == 40 and row["distinct_token_ratio"] == 1.0


def test_tfidf_top_terms(spark):
    import math

    from silkworm_spark.operators.textstats import tfidf_top_terms

    docs = _docs(spark, [
        (1, "apple apple banana shared"),
        (2, "cherry shared shared date"),
        (3, "apple cherry shared"),
    ])
    got = {}
    for r in tfidf_top_terms(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tfidf"]))
    for v in got.values():
        v.sort()
    # doc 1: apple tf=2 df=2 -> 2*ln(3/2)=0.8109 beats banana ln(3)=1.0986?
    # banana tf=1 df=1 -> ln(3)=1.0986 wins rank 1; apple 0.8109 rank 2
    assert got[1][0][1] == "banana"
    assert got[1][0][2] == pytest.approx(round(math.log(3), 4), abs=1e-4)
    assert got[1][1][1] == "apple"
    assert got[1][1][2] == pytest.approx(round(2 * math.log(1.5), 4), abs=1e-4)
    # doc 2: shared tf=2 df=3 -> 0.0; date/cherry tf=1: date df=1 (1.0986)
    # beats cherry df=2 (0.4055)
    assert [t[1] for t in got[2]] == ["date", "cherry"]
    # every doc yields exactly k=2 rows here
    assert all(len(v) == 2 for v in got.values())


def test_substring_dup_stats(spark):
    from silkworm_spark.operators.dedup_corpus import substring_dup_stats

    shared = "one two three four five six seven eight"      # 8-token run
    docs = _docs(spark, [
        (1, shared + " alpha beta gamma delta epsilon zeta"),
        (2, "pre amble words " + shared),                    # shares the run
        (3, "totally different content with no overlap at all here"),
    ])
    got = {r["doc_id"]: r.asDict()
           for r in substring_dup_stats(docs, n=8).collect()}
    # docs 1 and 2 share exactly the one 8-gram window of `shared`
    assert got[1]["n_dup_windows"] == 1 and got[2]["n_dup_windows"] == 1
    assert got[3]["n_dup_windows"] == 0 and got[3]["dup_frac"] == 0.0
    assert got[1]["n_windows"] == 7   # 14 tokens -> 7 windows
    assert got[1]["dup_frac"] == pytest.approx(1 / 7, abs=1e-4)


def test_shingle_hashes_short_docs(spark):
    """Documents shorter than n tokens must yield ZERO shingles, not
    crash the job: F.sequence(1, size-(n-1)) counts DOWN for short docs
    and F.slice(start=0) throws INVALID_PARAMETER_VALUE.START. One
    short doc would otherwise kill every shingle-based run (n-gram
    Jaccard, substring dup, contamination)."""
    from silkworm_spark.operators.dedup_corpus import (
        ngram_jaccard_pairs,
        shingle_hashes,
        substring_dup_stats,
    )

    docs = _docs(spark, [
        (1, "just two"),                      # < n for any n >= 3
        (2, ""),                              # empty
        (3, "alpha beta gamma delta"),        # normal
        (4, "alpha beta gamma delta"),        # exact dup of 3
    ])
    sh = shingle_hashes(docs, n=3).collect()
    assert {r["doc_id"] for r in sh} == {3, 4}
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in pairs] == [(3, 4, 1.0)]
    # substring stats: short docs have no windows, so (like the DuckDB
    # oracle) they emit no row — and nothing crashes
    stats = {r["doc_id"]: r.asDict()
             for r in substring_dup_stats(docs, n=3).collect()}
    assert set(stats) == {3, 4}
    assert stats[3]["n_dup_windows"] == 2  # both windows shared with doc 4


def test_token_entropy(spark):
    from silkworm_spark.operators.textstats import token_entropy

    docs = _docs(spark, [
        (1, "a a a a"),          # zero entropy
        (2, "a b c d"),          # uniform: log2(4) = 2 bits
        (3, "a a b b"),          # uniform over 2: 1 bit
    ])
    got = {r["doc_id"]: r["entropy"] for r in token_entropy(docs).collect()}
    assert got[1] == 0.0
    assert got[2] == 2.0
    assert got[3] == 1.0


def test_bpe_token_stats(spark):
    """Closed-form GPT-2 pre-tokenizer counts: contractions split off,
    letter/digit/punct runs each one token (space-prefixed), counts
    upper-bound the whitespace split."""
    from silkworm_spark.operators.textstats import bpe_token_stats

    docs = _docs(spark, [
        (1, "hello world"),        # 2 bpe ("hello", " world") / 2 ws
        (2, "can't stop won't"),   # can + 't + " stop" + " won" + 't = 5 / 3
        (3, "x2024!! done."),      # x + 2024 + !! + " done" + . = 5 / 2
        (4, "one"),                # 1 / 1
    ])
    got = {r["doc_id"]: r.asDict() for r in bpe_token_stats(docs).collect()}
    assert got[1]["n_bpe_tokens"] == 2 and got[1]["n_ws_tokens"] == 2
    assert got[2]["n_bpe_tokens"] == 5 and got[2]["n_ws_tokens"] == 3
    assert got[3]["n_bpe_tokens"] == 5 and got[3]["n_ws_tokens"] == 2
    assert got[4]["n_bpe_tokens"] == 1
    assert all(r["n_bpe_tokens"] >= r["n_ws_tokens"] for r in got.values())
    assert got[2]["bpe_per_ws_token"] == round(5 / 3, 4)


def test_token_budget_pack(spark):
    """Closed-form packing: two sources with 16 and 4 tokens → √-scaled
    weights 2/3 and 1/3 of a 12-token budget → budgets 8 and 4; greedy
    doc_id-order fill keeps exactly the prefix whose cumsum fits."""
    from silkworm_spark.operators.corpus_pipeline import token_budget_pack

    rows = [
        # source a: four 4-token docs (16 tokens)
        (1, "a", "w x y z"), (2, "a", "w x y z"),
        (3, "a", "w x y z"), (4, "a", "w x y z"),
        # source b: one 4-token doc (4 tokens)
        (5, "b", "p q r s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r.asDict()
           for r in token_budget_pack(docs, budget_tokens=12).collect()}
    # weights: sqrt(16)=4, sqrt(4)=2 → a: 4/6=0.666667, b: 2/6=0.333333
    # budgets: floor(0.666667*12)=8, floor(0.333333*12)=3 (< 4 → b empty)
    assert set(got) == {1, 2}  # a's 2-doc prefix fills 8 of 8
    assert got[1]["cum_tokens"] == 4 and got[2]["cum_tokens"] == 8
    assert got[1]["source_budget"] == 8
    assert all(r["cum_tokens"] <= r["source_budget"] for r in got.values())


def test_script_profile(spark):
    """Closed-form Unicode-script ratios over planted mixed-script docs;
    dominant = first maximal block in SCRIPT_RANGES priority order,
    'other' only when no listed script appears."""
    from silkworm_spark.operators.textstats import script_profile

    docs = _docs(spark, [
        (1, "hello world"),        # 10 non-space latin chars
        (2, "привет мир"),         # cyrillic
        (3, "日本語 テスト"),        # cjk (han + katakana)
        (4, "hi мир"),             # latin 2 / cyrillic 3 of 5 → cyrillic
        (5, "1234 !!"),            # no listed script → other
        (6, "ab яб"),              # 2 vs 2 tie → latin (priority order)
    ])
    got = {r["doc_id"]: r.asDict() for r in script_profile(docs).collect()}
    assert got[1]["latin_ratio"] == 1.0 and got[1]["dominant_script"] == "latin"
    assert got[2]["cyrillic_ratio"] == 1.0 and got[2]["dominant_script"] == "cyrillic"
    assert got[3]["cjk_ratio"] == 1.0 and got[3]["dominant_script"] == "cjk"
    assert got[4]["cyrillic_ratio"] == 0.6 and got[4]["latin_ratio"] == 0.4
    assert got[4]["dominant_script"] == "cyrillic"
    assert got[5]["dominant_script"] == "other" and got[5]["latin_ratio"] == 0.0
    assert got[6]["latin_ratio"] == got[6]["cyrillic_ratio"] == 0.5
    assert got[6]["dominant_script"] == "latin"  # tie → priority order


def test_script_profile_whitespace_only_doc(spark):
    """A whitespace-only (or empty) document has zero non-space chars:
    without a denominator guard 0/0 is NaN, and Spark sorts NaN above
    every double, so array_max(NaN...) > 0 held and the doc was
    mislabeled 'latin'. Must be all-zero ratios and 'other'."""
    from silkworm_spark.operators.textstats import script_profile

    docs = _docs(spark, [(1, "   \t\n  "), (2, ""), (3, "ok")])
    got = {r["doc_id"]: r.asDict() for r in script_profile(docs).collect()}
    for d in (1, 2):
        assert got[d]["dominant_script"] == "other"
        for name in ("latin", "cyrillic", "cjk", "arabic"):
            assert got[d][f"{name}_ratio"] == 0.0
    assert got[3]["dominant_script"] == "latin"


def test_pii_scan_and_redact(spark):
    from silkworm_spark.operators.pii import pii_scan, redact_pii

    docs = _docs(spark, [
        (1, "write to alice.smith@mail.example.org today"),
        (2, "call 555-0134 or 555-9999 now"),
        (3, "server at 192.168.1.77 responded"),
        (4, "perfectly clean text"),
    ])
    scan = {r["doc_id"]: r.asDict() for r in pii_scan(docs).collect()}
    assert scan[1]["n_emails"] == 1 and scan[1]["has_pii"]
    assert scan[2]["n_phones"] == 2
    assert scan[3]["n_ips"] == 1
    assert scan[4] == dict(doc_id=4, n_emails=0, n_phones=0, n_ips=0,
                           has_pii=False)
    red = {r["doc_id"]: r["redacted"] for r in redact_pii(docs).collect()}
    assert red[1] == "write to [EMAIL] today"
    assert red[2] == "call [PHONE] or [PHONE] now"
    assert red[3] == "server at [IP] responded"
    assert red[4] == "perfectly clean text"


def test_pii_email_case_insensitive(spark):
    """Mixed-case emails must be detected AND redacted — a lowercase-
    only pattern silently under-redacts (Alice@Example.COM survives a
    'redacted' corpus release)."""
    from silkworm_spark.operators.pii import pii_scan, redact_pii

    docs = _docs(spark, [
        (1, "mail Alice@Example.COM or BOB.JONES+x@CORP.IO please"),
        (2, "MixedCase@domain.Org"),
    ])
    scan = {r["doc_id"]: r.asDict() for r in pii_scan(docs).collect()}
    assert scan[1]["n_emails"] == 2 and scan[1]["has_pii"]
    assert scan[2]["n_emails"] == 1
    red = {r["doc_id"]: r["redacted"] for r in redact_pii(docs).collect()}
    assert red[1] == "mail [EMAIL] or [EMAIL] please"
    assert red[2] == "[EMAIL]"


def test_source_mix(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "en", "s1", 5), (2, "d e", "en", "s1", 3),
         (3, "f", "de", "s2", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {(r["source"], r["lang"]): r.asDict() for r in source_mix(docs).collect()}
    assert got[("s1", "en")]["n_docs"] == 2
    assert got[("s1", "en")]["n_tokens"] == 5
    assert got[("s1", "en")]["avg_chars"] == 4.0
    assert got[("s2", "de")]["n_tokens"] == 1


def test_pagerank_fixed_point_matches_python_recurrence(spark):
    """Spark PageRank vs an independent pure-Python implementation of
    the same fixed-point recurrence on a small skewed graph — every
    BIGINT rank must match exactly (the whole point of integer-scaled
    arithmetic is cross-engine bit-equality)."""
    from silkworm_spark.operators.graph import pagerank_fixed_point

    n = 60
    edge_list = sorted({
        (s, d) for s in range(n)
        for d in ((s * s + 7) % n, (s * 13 + 11) % n, s % 4) if d != s
    })
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank_fixed_point(edges, iterations=3).collect()}

    scale, damping = 10**12, 85
    nodes = sorted({v for e in edge_list for v in e})
    outdeg = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // len(nodes) for v in nodes}
    tele = (scale * (100 - damping)) // (100 * len(nodes))
    for _ in range(3):
        contrib = {v: 0 for v in nodes}
        for s, d in edge_list:
            contrib[d] += rank[s] // outdeg[s]
        rank = {v: tele + (damping * contrib[v]) // 100 for v in nodes}

    assert got == rank
    # hubs (dst of the % 4 map) must outrank the median node
    ranks = sorted(rank.values())
    assert min(rank[h] for h in range(4)) > ranks[len(ranks) // 2]


def test_semantic_dedup_invariants(spark):
    """semantic_dedup's keep/drop partition must be consistent with its
    own pair graph: exactly one representative (the min id) kept per
    cluster, near-dup vectors co-clustered, unpaired vectors kept as
    their own singleton cluster. Runs the LEARNED-quantizer default
    (ivf_centroids k-means); the prefix-quantizer path is value-oracled
    by the embed_semantic_dedup driver query. On this fixture every
    brute-force near-dup pair lands in one k-means cell (near-copies
    quantize together), so the within-cluster candidate set — the
    paper's approximation — equals brute force and the invariants are
    checked against the EXACT pair graph, not the operator's own."""
    import numpy as np

    from silkworm_spark.operators.similarity import (
        ivf_assign, ivf_centroids, semantic_dedup,
    )

    rng = np.random.RandomState(3)
    base = rng.randn(6, 16)
    rows = []
    vid = 0
    # pass 0 first emits ONE copy of every base, so k-means init (the
    # first n_clusters ids) is one per distinct base — init from two
    # near-identical copies would split a dup group across two cells
    for rep in range(3):
        for bi, b in enumerate(base):
            if rep <= bi % 3:  # 1-3 near-copies per base
                v = b + rng.randn(16) * 0.01
                rows.append((vid, [float(x) for x in v]))
                vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=0.95, n_clusters=6).collect()
    }

    # brute-force ground-truth pairs (numpy) + the operator's cell map
    x = np.asarray([r[1] for r in rows])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    brute = [
        (i, j)
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if round(float(sims[i, j]), 4) >= 0.95
    ]
    cents = ivf_centroids(emb, n_clusters=6)
    cell = {
        r["vec_id"]: r["cluster"] for r in ivf_assign(emb, cents).collect()
    }
    # fixture precondition: no true pair straddles two k-means cells,
    # so the operator saw every brute pair as a candidate
    assert all(cell[a] == cell[b] for a, b in brute)

    assert set(out) == {r[0] for r in rows}  # total coverage incl. singletons
    for a, b in brute:  # near-dup vectors share a component label
        assert out[a]["cluster"] == out[b]["cluster"]
    clusters: dict[int, list[int]] = {}
    for vid_, r in out.items():
        clusters.setdefault(r["cluster"], []).append(vid_)
    for label, members in clusters.items():
        assert label == min(members)  # representative = min id
        kept = [m for m in members if out[m]["keep"]]
        assert kept == [label]  # exactly the representative survives
