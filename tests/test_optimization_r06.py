"""Round-6 optimization invariants: the JVM canonicalization fast path
matches the Python functions, and the size-adaptive spill routes its
scratch through the session config (VERDICT r5 items 3/4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from silkworm_spark.functions.urls import (
    canonicalize_url,
    host_of,
    with_canonical_url_host,
)
from silkworm_spark.operators import dedup_corpus as dc

URL_CASES = [
    "http://h3.example.com/p/17",            # canonical, fast path
    "http://h3.example.com",                  # no path -> '/'
    "https://Host.Example.COM:443/a?b=1#f",  # slow path: case/port/fragment
    "http://h1.example.com:80/x",            # default port dropped
    "http://h1.example.com/x?b=2&a=1",       # query byte-preserved
    "ftp://files.example.com/pub",           # non-http scheme -> slow path
    "http://h2.example.com/päth",            # non-ascii path -> slow path
    "http://h2.example.com/p#frag",          # fragment -> slow path
    "  http://h4.example.com/ws  ",          # whitespace -> slow path
]


def test_with_canonical_url_host_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in URL_CASES], "url string")
    got = {
        r["orig"]: (r["url"], r["host"])
        for r in with_canonical_url_host(df.withColumn("orig", F.col("url")))
        .select("orig", "url", "host").collect()
    }
    for u in URL_CASES:
        cu = canonicalize_url(u)
        assert got[u] == (cu, host_of(cu)), u


def test_spill_or_reuse_small_input_not_materialized(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.range(100).selectExpr("id AS doc_id", "'x' AS text").write.parquet(p)
    docs = spark.read.parquet(p)
    sh = docs.select("doc_id")
    out = dc._spill_or_reuse(sh, docs, None, "t.parquet")
    assert out is sh  # below threshold: no materialization at all


def test_spill_routes_through_session_conf(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "docs.parquet")
    spark.range(100).selectExpr("id AS doc_id", "'x y z' AS text").write.parquet(p)
    docs = spark.read.parquet(p)
    conf_dir = str(tmp_path / "scratch")
    spark.conf.set(dc.SCRATCH_CONF_KEY, conf_dir)
    try:
        monkeypatch.setattr(dc, "SPILL_THRESHOLD_BYTES", 0)  # force the spill
        out = dc._spill_or_reuse(docs.select("doc_id"), docs, None, "t.parquet")
        assert out.count() == 100
        assert os.path.isdir(os.path.join(conf_dir, "t.parquet"))
    finally:
        spark.conf.unset(dc.SCRATCH_CONF_KEY)


def test_explicit_scratch_dir_wins(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.range(50).selectExpr("id AS doc_id", "'x y' AS text").write.parquet(p)
    docs = spark.read.parquet(p)
    target = str(tmp_path / "explicit")
    out = dc._spill_or_reuse(docs.select("doc_id"), docs, target, "s.parquet")
    assert out.count() == 50
    assert os.path.isdir(os.path.join(target, "s.parquet"))


def test_embed_neardup_scale_guard(spark, monkeypatch):
    """The registered brute-force baseline refuses inputs past the
    oracle-fixture scale (VERDICT r5 item 9) and still runs below it."""
    import __spark_entry__ as entrymod

    assert entrymod.queries()["embed_neardup"](spark, "/root/testdata/sf0.001") \
        .count() >= 0
    monkeypatch.setattr(entrymod, "_NEARDUP_BRUTE_MAX_BYTES", 1)
    with pytest.raises(ValueError, match="brute-force"):
        entrymod.queries()["embed_neardup"](spark, "/root/testdata/sf0.001")


def test_connected_components_fused_rounds(spark):
    """The Observation-fused CC must converge and label components by
    min node id (chain + triangle + isolated pair)."""
    from silkworm_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a long, b long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_scratch_dir(spark, tmp_path):
    from silkworm_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(edges, scratch_dir=str(tmp_path)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}
    assert os.path.isdir(os.path.join(str(tmp_path), "cc_edges.parquet"))
