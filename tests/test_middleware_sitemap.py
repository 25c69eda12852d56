"""Middleware column expressions + sitemap callback dispatch e2e."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from silkworm_spark.operators.middleware import (
    apply_request_middlewares,
    backoff_col,
    skip_non_html,
)
from silkworm_spark.plans.engine import CrawlConfig, run_crawl
from silkworm_spark.plans.simulator import SimConfig, simulate
from silkworm_spark.schemas import SEEDS_SCHEMA, WEB_SCHEMA


def test_user_agent_and_proxy_columns(spark):
    df = spark.createDataFrame(
        [(f"http://h/{i}", i) for i in range(20)], "url string, seq long"
    )
    out = apply_request_middlewares(df, ["ua-a", "ua-b"], ["p1", "p2", "p3"]).collect()
    # proxy: strict round-robin by seq (reference middlewares.py:92-93)
    assert [r["proxy"] for r in out[:6]] == ["p1", "p2", "p3", "p1", "p2", "p3"]
    # ua: deterministic hash pick from the pool
    assert set(r["ua"] for r in out) <= {"ua-a", "ua-b"}
    again = apply_request_middlewares(df, ["ua-a", "ua-b"], ["p1", "p2", "p3"]).collect()
    assert [r["ua"] for r in out] == [r["ua"] for r in again]


def test_user_agent_default(spark):
    df = spark.createDataFrame([("http://h/1", 1)], "url string, seq long")
    r = apply_request_middlewares(df, None, None).first()
    assert r["ua"] == "silkworm/0.1" and r["proxy"] is None


def test_skip_non_html_swaps_callback(spark):
    df = spark.createDataFrame(
        [
            ("a", b"<html></html>", "text/html", "parse"),
            ("b", b'{"x":1}', "application/json", "parse"),
        ],
        "url string, body binary, content_type string, callback string",
    )
    got = {r["url"]: r["callback"] for r in skip_non_html(df).collect()}
    assert got == {"a": "parse", "b": "noop"}


def test_backoff_col(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "retry_times int")
    got = [r["b"] for r in df.select(backoff_col().alias("b")).collect()]
    assert got == [0.5, 1.0, 2.0]  # reference middlewares.py:141


def _sitemap_web():
    """Mini web: sitemap index → sub-sitemap → 2 HTML pages."""
    def page(url, host, body, ct="text/html", status=200):
        return dict(url=url, host=host, status=status, content_type=ct,
                    redirect_to=None, body=body, out_links=[],
                    spans_expected=[], attempts_until_ok=0)

    idx = b"<sitemapindex><sitemap><loc>http://s.com/sub.xml</loc></sitemap></sitemapindex>"
    sub = (b"<urlset><url><loc>http://s.com/p/1</loc></url>"
           b"<url><loc>http://s.com/p/2</loc></url></urlset>")
    p1 = b'<html><body><p>one</p><a href="/p/2">two</a></body></html>'
    p2 = b"<html><body><p>two</p></body></html>"
    return [
        page("http://s.com/sitemap.xml", "s.com", idx, ct="application/xml"),
        page("http://s.com/sub.xml", "s.com", sub, ct="application/xml"),
        page("http://s.com/p/1", "s.com", p1),
        page("http://s.com/p/2", "s.com", p2),
    ]


def test_sitemap_callback_dispatch_e2e(spark, tmp_path):
    web_rows = _sitemap_web()
    web = spark.createDataFrame(web_rows, WEB_SCHEMA)
    seed_rows = [dict(url="http://s.com/sitemap.xml", seq=0, priority=0,
                      callback="parse_sitemap")]
    seeds = spark.createDataFrame(
        seed_rows,
        T.StructType(SEEDS_SCHEMA.fields + [T.StructField("callback", T.StringType())]),
    )
    engine = run_crawl(spark, web, seeds, None, str(tmp_path / "c"),
                       CrawlConfig(max_rounds=6))
    sim = simulate(web_rows, seed_rows, None, SimConfig(max_rounds=6))

    log = [(r["round"], r["seq"], r["url"])
           for r in engine.fetch_log().orderBy("round", "seq").collect()]
    assert log == sim.fetch_order
    assert {r["url"] for r in engine.seen().collect()} == sim.seen
    # both HTML pages harvested as documents; sitemaps are not items
    docs = sorted(r["doc_id"] for r in engine.documents().collect())
    assert docs == ["http://s.com/p/1", "http://s.com/p/2"]
    # round structure: sitemap idx → sub → pages = 3 BFS levels
    assert max(r[0] for r in log) == 3
