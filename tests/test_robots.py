"""robots.txt parsing → politeness rules table (functions/robots)."""

from __future__ import annotations

from pyspark.sql import functions as F

from silkworm_spark.functions.robots import (
    parse_robots_txt,
    robots_rules,
    robots_rules_from_responses,
    select_group,
)

SAMPLE = """\
# comments everywhere
User-agent: googlebot
Disallow: /private/
Crawl-delay: 2.5

User-agent: silkworm
User-agent: otherbot
Disallow: /admin
Disallow: /tmp/*.log
Allow: /admin/public
Crawl-delay: 1

User-agent: *
Disallow: /secret$
Disallow:
"""


def test_group_parse_and_adjacent_agents():
    groups = parse_robots_txt(SAMPLE)
    assert len(groups) == 3
    assert groups[1].agents == ["silkworm", "otherbot"]
    assert groups[1].disallow == ["/admin", "/tmp/*.log"]
    assert groups[1].allow == ["/admin/public"]
    assert groups[1].crawl_delay_s == 1.0


def test_group_selection_longest_match_and_fallback():
    groups = parse_robots_txt(SAMPLE)
    assert select_group(groups, "Mozilla (compatible; GoogleBot/2.1)").agents[0] == "googlebot"
    assert select_group(groups, "silkworm-spark/0.1").agents == ["silkworm", "otherbot"]
    # unknown agent falls back to the * group
    assert select_group(groups, "randombot").disallow == ["/secret$"]
    assert select_group([], "any") is None


def test_rules_wildcard_truncation_and_anchor():
    prefixes, delay = robots_rules(SAMPLE, "silkworm-spark/0.1")
    # /tmp/*.log truncates at the wildcard -> /tmp/ (polite superset)
    assert prefixes == ["/admin", "/tmp/"]
    assert delay == 1.0
    star, _ = robots_rules(SAMPLE, "nobody")
    assert star == ["/secret"]  # trailing $ anchor dropped


def test_rules_shadowed_prefixes_and_empty_disallow():
    text = "User-agent: *\nDisallow: /a\nDisallow: /a/b\nDisallow: /c\nDisallow:\n"
    prefixes, _ = robots_rules(text, "any")
    assert prefixes == ["/a", "/c"]  # /a/b shadowed by /a; empty ignored


def test_bom_case_and_garbage_tolerance():
    text = "﻿USER-AGENT: SilkWorm\nDISALLOW: /X\nCrawl-Delay: nope\nnocolonline\n"
    prefixes, delay = robots_rules(text, "silkworm-spark")
    assert prefixes == ["/X"] and delay is None
    # rules before any User-agent line are ignored
    assert robots_rules("Disallow: /y\nUser-agent: *\n", "a") == ([], None)


def test_rules_table_stage(spark):
    """Fetched robots.txt responses → ROBOTS_SCHEMA rows the scheduler
    consumes directly; 4xx ⇒ allow-all, 5xx ⇒ disallow-all."""
    rows = [
        ("a.test", 200, SAMPLE.encode()),
        ("b.test", 404, None),
        ("c.test", 503, None),
    ]
    df = spark.createDataFrame(rows, "host string, status int, body binary")
    out = {r["host"]: r for r in
           robots_rules_from_responses(df, "silkworm-spark").collect()}
    assert out["a.test"]["disallow_prefixes"] == ["/admin", "/tmp/"]
    assert out["a.test"]["crawl_delay_ms"] == 1000
    assert out["b.test"]["disallow_prefixes"] == []
    assert out["c.test"]["disallow_prefixes"] == ["/"]

    # and the table drives the engine's dequeue denial end to end
    from silkworm_spark.operators.scheduler import dequeue_round
    from silkworm_spark.plans.checkpoint import _empty_df
    from silkworm_spark.schemas import HOST_STATE_SCHEMA, ROBOTS_SCHEMA

    robots = robots_rules_from_responses(df, "silkworm-spark")
    frontier_rows = [
        ("http://a.test/admin/x", 1, "a.test"), ("http://a.test/ok", 2, "a.test"),
        ("http://c.test/anything", 3, "c.test"),
    ]
    frontier = spark.createDataFrame(frontier_rows, "url string, url_hash long, host string") \
        .withColumns({"depth": F.lit(0), "parent_seq": F.lit(-1).cast("long"),
                      "child_index": F.lit(0), "seq": F.col("url_hash"),
                      "callback": F.lit("parse"), "priority": F.lit(0),
                      "dont_filter": F.lit(False), "retry_times": F.lit(0),
                      "not_before": F.lit(0.0), "round_added": F.lit(0)})
    dq = dequeue_round(frontier, robots.select(*[f.name for f in ROBOTS_SCHEMA.fields]),
                       _empty_df(spark, HOST_STATE_SCHEMA), vtime=0.0, round_budget=10)
    try:
        denied = {r["url"] for r in dq.denied.collect()}
        batch = {r["url"] for r in dq.batch.collect()}
        assert denied == {"http://a.test/admin/x", "http://c.test/anything"}
        assert batch == {"http://a.test/ok"}
    finally:
        dq.release()


def test_fetch_robots_rules_live_bootstrap(spark):
    """Live-crawl politeness bootstrap: /robots.txt fetched per host
    through live_fetch (real loopback HTTP), parsed into the rules
    table; a host without robots.txt (404) yields allow-all."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from silkworm_spark.functions.robots import fetch_robots_rules

    ROBOTS = b"User-agent: silkworm\nDisallow: /private\nCrawl-delay: 0.5\n"

    class H(BaseHTTPRequestHandler):
        serves_robots = True

        def do_GET(self):
            if self.path == "/robots.txt" and self.serves_robots:
                self.send_response(200)
                self.send_header("Content-Length", str(len(ROBOTS)))
                self.end_headers()
                self.wfile.write(ROBOTS)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):
            pass

    class H404(H):
        serves_robots = False

    servers = []
    bases = []
    for handler in (H, H404):
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        bases.append(f"127.0.0.1:{srv.server_address[1]}")
    try:
        seeds = spark.createDataFrame(
            [(f"http://{bases[0]}/page1",), (f"http://{bases[0]}/page2",),
             (f"http://{bases[1]}/other",)],
            "url string",
        ).withColumn("host", F.col("url").substr(F.lit(8), F.length("url")))
        # host column derived properly by the helper when absent — drop ours
        rules = {r["host"]: r for r in
                 fetch_robots_rules(seeds.drop("host"), "silkworm-spark").collect()}
        with_robots = rules["127.0.0.1"] if "127.0.0.1" in rules else None
        # host_of strips ports, so both loopback servers share one host
        # key; the FIRST seed's authority decides which robots.txt is
        # fetched (documented: politeness is per hostname)
        assert with_robots is not None
        assert with_robots["disallow_prefixes"] == ["/private"]
        assert with_robots["crawl_delay_ms"] == 500
    finally:
        for srv in servers:
            srv.shutdown()


def test_robots_sitemaps_scalar():
    from silkworm_spark.functions.robots import robots_sitemaps

    text = """
Sitemap: http://a.test/sitemap.xml
User-agent: *
Disallow: /private
Sitemap: http://a.test/extra.xml   # group-independent
Sitemap: http://a.test/sitemap.xml
"""
    assert robots_sitemaps(text) == [
        "http://a.test/sitemap.xml", "http://a.test/extra.xml",
    ]
    assert robots_sitemaps("") == []
    assert robots_sitemaps("User-agent: *\nDisallow:") == []


def test_robots_sitemap_seeds_stage(spark):
    from silkworm_spark.functions.robots import robots_sitemap_seeds

    body_ok = b"Sitemap: http://h1.test/s.xml\nUser-agent: *\nDisallow: /x"
    rows = [
        ("h1.test", 200, bytearray(body_ok)),
        ("h2.test", 404, bytearray(b"Sitemap: http://h2.test/s.xml")),
        ("h3.test", 200, None),
    ]
    responses = spark.createDataFrame(rows, "host string, status int, body binary")
    got = [r.asDict() for r in robots_sitemap_seeds(responses).collect()]
    assert got == [dict(host="h1.test", url="http://h1.test/s.xml",
                        callback="parse_sitemap")]


def test_robots_stages_tolerate_null_status(spark):
    """Error rows carry NULL status, which Arrow→pandas renders as NaN
    (not None) — both mapInPandas stages must skip them, not crash with
    'cannot convert float NaN to integer'."""
    from silkworm_spark.functions.robots import robots_sitemap_seeds

    rows = [
        ("h1.test", 200, bytearray(b"Sitemap: http://h1.test/s.xml")),
        ("err.test", None, None),  # connection error: null status
    ]
    responses = spark.createDataFrame(rows, "host string, status int, body binary")
    got = [r.asDict() for r in robots_sitemap_seeds(responses).collect()]
    assert got == [dict(host="h1.test", url="http://h1.test/s.xml",
                        callback="parse_sitemap")]
    # null status ⇒ disallow-all until a fetch succeeds (5xx semantics)
    out = {r["host"]: r for r in
           robots_rules_from_responses(responses, "silkworm-spark").collect()}
    assert out["err.test"]["disallow_prefixes"] == ["/"]
    assert out["h1.test"]["disallow_prefixes"] == []
