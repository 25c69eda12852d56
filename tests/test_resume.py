"""Exact-resume contract (north rule): a crawl interrupted after K
rounds and resumed from its checkpoint produces byte-identical state
to an uninterrupted crawl — fetch order, seen set, documents, and the
delta-compacted frontier all line up."""

from __future__ import annotations

from silkworm_spark.plans.engine import CrawlConfig, CrawlEngine, run_crawl
from silkworm_spark.schemas import WEB_SCHEMA
from silkworm_spark.sources.webgen import robots_df, seeds_df


def _state(engine):
    order = [(r["round"], r["seq"], r["url"]) for r in engine.fetch_log().orderBy("round", "seq").collect()]
    seen = sorted(r["url"] for r in engine.seen().collect())
    docs = sorted((r["doc_id"], r["seq"]) for r in engine.documents().collect())
    frontier = sorted(r["seq"] for r in engine.ckpt.read_frontier().collect())
    return order, seen, docs, frontier


def test_resume_matches_uninterrupted(spark, small_web, tmp_path):
    web = spark.createDataFrame(small_web["web"], WEB_SCHEMA)
    seeds = seeds_df(spark, small_web["seeds"])
    robots = robots_df(spark, small_web["robots"])
    cfg = dict(round_budget=40)

    full = run_crawl(spark, web, seeds, robots, str(tmp_path / "full"),
                     CrawlConfig(max_rounds=8, **cfg))

    partial = run_crawl(spark, web, seeds, robots, str(tmp_path / "part"),
                        CrawlConfig(max_rounds=3, **cfg))
    assert partial.stats.rounds == 3
    resumed = CrawlEngine(spark, str(tmp_path / "part"),
                          CrawlConfig(max_rounds=8, **cfg), web=web)
    resumed.run()

    assert _state(resumed) == _state(full)


def test_compaction_preserves_frontier(spark, small_web, tmp_path):
    """compact_every=2 forces several compactions mid-crawl; the live
    frontier must be unaffected (vs a no-compaction run)."""
    web = spark.createDataFrame(small_web["web"], WEB_SCHEMA)
    seeds = seeds_df(spark, small_web["seeds"])

    a = CrawlEngine(spark, str(tmp_path / "a"), CrawlConfig(max_rounds=4, round_budget=30), web=web)
    a.ckpt.compact_every = 2
    a.initialize(seeds, None)
    a.run()
    b = run_crawl(spark, web, seeds, None, str(tmp_path / "b"),
                  CrawlConfig(max_rounds=4, round_budget=30))
    fa = sorted(r["seq"] for r in a.ckpt.read_frontier().collect())
    fb = sorted(r["seq"] for r in b.ckpt.read_frontier().collect())
    assert fa == fb
    assert len(a.ckpt.manifest["tables"]["frontier_delta"]) <= 2


def test_resume_mixed_priority_with_politeness(spark, small_web, tmp_path):
    """Exact resume under the round-3 mixed-priority dequeue (ruled-
    host-exempt horizon + audit): the uniform_priority flag, per-band
    state and horizon floors must all round-trip through the manifest."""
    web = spark.createDataFrame(small_web["web"], WEB_SCHEMA)
    mixed = [dict(s, priority=int(s["seq"]) % 3) for s in small_web["seeds"]]
    seeds = seeds_df(spark, mixed)
    robots = robots_df(spark, small_web["robots"])
    cfg = dict(round_budget=30, horizon_factor=1)

    full = run_crawl(spark, web, seeds, robots, str(tmp_path / "full"),
                     CrawlConfig(max_rounds=8, **cfg))

    partial = run_crawl(spark, web, seeds, robots, str(tmp_path / "part"),
                        CrawlConfig(max_rounds=3, **cfg))
    assert partial.stats.rounds == 3
    resumed = CrawlEngine(spark, str(tmp_path / "part"),
                          CrawlConfig(max_rounds=8, **cfg), web=web)
    resumed.run()

    assert _state(resumed) == _state(full)
