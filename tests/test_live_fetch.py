"""Live HTTP path over a loopback server: fetch_html, live_fetch, and
a full fetch_mode='live' crawl (reference http.py:67-203, api.py:11-38).

The sandbox has no external network, but 127.0.0.1 works — a stdlib
http.server serves a 3-page site so the production fetch path runs for
real: method/headers/UA columns, response-header normalization,
redirects (urllib follows them), JSON-item spiders, link following.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

PAGES = {
    "/": b"""<html><body>
      <div class="quote"><span class="text">LQ1</span></div>
      <a id="next" href="/two">next</a>
      <p>hello live</p></body></html>""",
    "/two": b"""<html><body>
      <div class="quote"><span class="text">LQ2</span></div></body></html>""",
    "/redirect": b"",  # 302 -> /two
}


REDIRECTS = {
    "/redirect": "/two",
    "/chain1": "/chain2",
    "/chain2": "/two",
    "/loopa": "/loopb",
    "/loopb": "/loopa",
}

HITS: dict[str, list[float]] = {}  # path -> monotonic request-start times
HITS_LOCK = threading.Lock()
CONN_COUNT = {"n": 0}  # distinct TCP connections accepted


class _Handler(BaseHTTPRequestHandler):
    server_version = "testsrv/1"
    # HTTP/1.1 so keep-alive is real (1.0 would close per request and
    # mask a client that fails to reuse connections)
    protocol_version = "HTTP/1.1"
    timeout = 10  # idle keep-alive connections self-close

    def setup(self):
        super().setup()
        with HITS_LOCK:
            CONN_COUNT["n"] += 1

    def do_GET(self):  # noqa: N802 (stdlib naming)
        from time import monotonic

        with HITS_LOCK:
            HITS.setdefault(self.path.split("?")[0], []).append(monotonic())
        if self.path == "/gzip":
            import gzip as _gzip

            raw = b"<html><body><p>gzip body ok</p></body></html>"
            gz = _gzip.compress(raw)
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Encoding", "gzip")
            self.send_header("X-Echo-Accept", self.headers.get("Accept", ""))
            self.send_header("X-Echo-UA", self.headers.get("User-Agent", ""))
            self.send_header("Content-Length", str(len(gz)))
            self.end_headers()
            self.wfile.write(gz)
            return
        if self.path == "/slow":
            # respond slower than the client's read timeout: a slow-
            # but-ALIVE host on a pooled connection (nothing stale)
            from time import sleep

            sleep(1.5)
            body = b"<html><body><p>slow</p></body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            try:
                self.wfile.write(body)
            except OSError:
                pass  # client already gave up
            self.close_connection = True
            return
        if self.path == "/sneakyclose":
            # 200 keep-alive, then close WITHOUT advertising it — the
            # stale-pooled-socket case a keep-alive client must absorb
            body = b"<html><body><p>sneaky</p></body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            self.close_connection = True
            return
        if self.path == "/die":
            # kill the connection before any status line — a FRESH-
            # connection failure the client must NOT blindly retry
            import socket as _socket

            self.close_connection = True
            try:
                self.connection.shutdown(_socket.SHUT_RDWR)
            except OSError:
                pass
            return
        if self.path in REDIRECTS:
            self.send_response(302)
            self.send_header("Location", REDIRECTS[self.path])
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = PAGES.get(self.path.split("?")[0])
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("X-Echo-UA", self.headers.get("User-Agent", ""))
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep test output clean
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.block_on_close = False  # don't join lingering keep-alive handlers
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_html_one_off(server):
    from silkworm_spark.api import fetch_html

    text, doc = fetch_html(f"{server}/", timeout=5)
    assert "hello live" in text
    assert doc.select_first(".quote .text").text == "LQ1"
    assert doc.xpath_first("//a[@id='next']").attr("href") == "/two"


def test_live_fetch_stage(server, spark):
    from pyspark.sql import functions as F

    from silkworm_spark.operators.fetch import live_fetch
    from silkworm_spark.operators.middleware import apply_request_middlewares
    from silkworm_spark.schemas import FRONTIER_SCHEMA

    rows = []
    for i, path in enumerate(["/", "/two", "/redirect", "/missing"]):
        rows.append(dict(
            url=f"{server}{path}", url_hash=i, host="127.0.0.1", depth=0,
            parent_seq=-1, child_index=i, seq=i, callback="parse",
            priority=0, dont_filter=False, retry_times=0, not_before=0.0,
            round_added=0, method=None, headers={"x-cust": "1"},
            params=None, meta=None, data=None, timeout=5.0,
        ))
    batch = spark.createDataFrame(
        [tuple(r[f.name] for f in FRONTIER_SCHEMA.fields) for r in rows],
        FRONTIER_SCHEMA,
    ).withColumn("part", F.lit(0))
    batch = apply_request_middlewares(batch, user_agents=["ua-a", "ua-b"])
    out = {r["url"]: r for r in live_fetch(batch, timeout_s=5).collect()}

    ok = out[f"{server}/"]
    assert ok["status"] == 200 and b"hello live" in ok["body"]
    # response headers normalized to lowercase keys (http.py:323-364)
    assert ok["resp_headers"]["content-type"].startswith("text/html")
    # the UA middleware column reached the wire
    assert ok["resp_headers"]["x-echo-ua"] in ("ua-a", "ua-b")
    # manual redirect driving: final_url is the target, hop counted
    red = out[f"{server}/redirect"]
    assert red["status"] == 200 and red["final_url"].endswith("/two")
    assert red["redirect_times"] == 1 and red["error"] is None
    # a 404 is a RESPONSE, not a fetch error (the reference returns it
    # to the middleware chain; RetryMiddleware needs real statuses)
    missing = out[f"{server}/missing"]
    assert missing["status"] == 404 and missing["error"] is None


def _mk_batch(spark, server, paths, delay_s=None):
    from pyspark.sql import functions as F

    from silkworm_spark.schemas import FRONTIER_SCHEMA

    rows = []
    for i, path in enumerate(paths):
        rows.append(dict(
            url=f"{server}{path}", url_hash=i, host=f"127.0.0.1:{server.rsplit(':', 1)[1]}",
            depth=0, parent_seq=-1, child_index=i, seq=i, callback="parse",
            priority=0, dont_filter=False, retry_times=0, not_before=0.0,
            round_added=0, method=None, headers=None,
            params=None, meta=None, data=None, timeout=5.0,
        ))
    batch = spark.createDataFrame(
        [tuple(r[f.name] for f in FRONTIER_SCHEMA.fields) for r in rows],
        FRONTIER_SCHEMA,
    ).withColumn("part", F.lit(0))
    if delay_s is not None:
        batch = batch.withColumn("_delay_s", F.lit(float(delay_s)))
    return batch


def test_live_fetch_redirect_chain_cap_and_loop(server, spark):
    from silkworm_spark.operators.fetch import live_fetch

    batch = _mk_batch(spark, server, ["/chain1", "/loopa", "/redirect"])
    out = {r["url"]: r for r in live_fetch(batch, timeout_s=5).collect()}

    chain = out[f"{server}/chain1"]  # /chain1 -> /chain2 -> /two
    assert chain["redirect_times"] == 2 and chain["final_url"].endswith("/two")
    assert chain["status"] == 200 and chain["error"] is None

    loop = out[f"{server}/loopa"]  # /loopa -> /loopb -> /loopa: visited
    assert loop["error"] == "redirect_loop" and loop["status"] == 302
    assert loop["redirect_times"] == 1  # one followed hop before detection

    # cap: max_redirects=1 turns the 2-hop chain into too_many_redirects
    capped = {
        r["url"]: r
        for r in live_fetch(
            _mk_batch(spark, server, ["/chain1"]), timeout_s=5, max_redirects=1
        ).collect()
    }[f"{server}/chain1"]
    assert capped["error"] == "too_many_redirects" and capped["redirect_times"] == 1


def test_live_fetch_paces_same_host(server, spark):
    """Same-host requests must start ≥ crawl-delay apart (reference
    DelayMiddleware, middlewares.py:164-263) — asserted from the
    loopback server's own request-start timestamps."""
    from silkworm_spark.operators.fetch import live_fetch

    delay = 0.3
    with HITS_LOCK:
        HITS.pop("/two", None), HITS.pop("/", None)
    batch = _mk_batch(spark, server, ["/", "/two", "/", "/two"], delay_s=delay)
    out = live_fetch(batch.coalesce(1), timeout_s=5).collect()
    assert all(r["status"] == 200 for r in out)
    with HITS_LOCK:
        times = sorted(HITS.get("/", []) + HITS.get("/two", []))
    assert len(times) == 4
    gaps = [b - a for a, b in zip(times, times[1:])]
    # scheduling jitter only ever widens gaps; a violation shrinks them
    assert all(g >= delay * 0.9 for g in gaps), gaps


def test_live_crawl_end_to_end(server, spark, tmp_path):
    from pyspark.sql import functions as F

    from silkworm_spark.operators.spider import register_spider_callback
    from silkworm_spark.plans.engine import CrawlConfig, CrawlEngine
    from silkworm_spark.schemas import SEEDS_SCHEMA

    @register_spider_callback("live_quotes")
    def live_quotes(resp):
        for q in resp.css(".quote .text"):
            yield {"text": q.text}
        nxt = resp.select_first("a#next")
        if nxt is not None:
            yield resp.follow(nxt.attr("href"))

    eng = CrawlEngine(
        spark, str(tmp_path / "ckpt"),
        CrawlConfig(max_rounds=4, round_budget=10,
                    user_agents=["live-ua"], request_timeout=5.0),
        fetch_mode="live",
    )
    seeds = spark.createDataFrame([(f"{server}/", 0, 0)], SEEDS_SCHEMA) \
        .withColumn("callback", F.lit("live_quotes"))
    eng.initialize(seeds, None)
    stats = eng.run()

    assert stats.requests_sent == 2 and stats.responses_received == 2
    items = sorted(json.loads(r["item"])["text"] for r in eng.items().collect())
    assert items == ["LQ1", "LQ2"]
    fetched = {r["url"] for r in eng.fetch_log().collect()}
    assert fetched == {f"{server}/", f"{server}/two"}


def test_live_fetch_reuses_connection_per_host(server, spark):
    """A host group's serial requests must ride ONE TCP connection
    (keep-alive pooling, matching the reference's pooled rnet client —
    http.py:43); redirect hops included. The server counts accepted
    connections; the count must rise by exactly 1 for a 5-URL
    same-host sequence incl. a redirect hop."""
    from silkworm_spark.operators.fetch import live_fetch

    base = CONN_COUNT["n"]
    batch = _mk_batch(spark, server, ["/", "/two", "/redirect", "/two", "/"])
    out = live_fetch(batch.repartition(1), timeout_s=5).collect()
    assert sorted(r["status"] for r in out) == [200, 200, 200, 200, 200]
    assert {r["redirect_times"] for r in out} == {0, 1}
    assert CONN_COUNT["n"] - base == 1


def test_live_fetch_stale_pooled_socket_reconnects_once(server, spark):
    """A pooled keep-alive socket the server closed between requests
    (without advertising Connection: close) gets ONE transparent
    reconnect: the 3-URL same-host sequence still returns all 200s on
    exactly 2 TCP connections (the original + the reconnect)."""
    from silkworm_spark.operators.fetch import live_fetch

    base = CONN_COUNT["n"]
    batch = _mk_batch(spark, server, ["/sneakyclose", "/two", "/"])
    out = live_fetch(batch.repartition(1), timeout_s=5).collect()
    assert sorted(r["status"] for r in out) == [200, 200, 200]
    assert all(r["error"] is None for r in out)
    assert CONN_COUNT["n"] - base == 2


def test_live_fetch_fresh_connection_failure_not_retried(server, spark):
    """A request that fails on a FRESH (non-pooled) connection must NOT
    be transparently re-sent — the server may have executed it, and a
    dead host would cost two full connect timeouts per URL. It becomes
    an error row for RetryMiddleware's explicit policy; exactly one TCP
    connection is opened."""
    from silkworm_spark.operators.fetch import live_fetch

    base = CONN_COUNT["n"]
    batch = _mk_batch(spark, server, ["/die"])
    out = live_fetch(batch.repartition(1), timeout_s=5).collect()
    assert len(out) == 1
    assert out[0]["status"] is None and out[0]["error"] is not None
    assert CONN_COUNT["n"] - base == 1


def test_live_fetch_browser_preset_headers_and_gzip(server, spark):
    """The stdlib-reachable half of the reference's browser emulation
    (rnet Emulation.Firefox139, http.py:26): the preset header set
    reaches the wire, and the gzip bodies it invites come back decoded
    (rnet decodes transparently; so must we). The TLS-fingerprint delta
    itself is documented at BROWSER_HEADER_PRESETS — stdlib ssl cannot
    reproduce a browser ClientHello."""
    from silkworm_spark.operators.fetch import BROWSER_HEADER_PRESETS, live_fetch

    preset = BROWSER_HEADER_PRESETS["firefox139"]
    batch = _mk_batch(spark, server, ["/gzip"])
    out = live_fetch(batch, timeout_s=5, default_headers=preset).collect()[0]
    assert out["status"] == 200 and out["error"] is None
    assert b"gzip body ok" in out["body"]  # decoded, not gzip bytes
    assert out["resp_headers"]["x-echo-ua"] == preset["User-Agent"]
    assert out["resp_headers"]["x-echo-accept"] == preset["Accept"]
    # stored headers must describe the STORED (decoded) body: the
    # Content-Encoding is gone and Content-Length is the decoded size
    assert "content-encoding" not in out["resp_headers"]
    assert int(out["resp_headers"]["content-length"]) == len(out["body"])


def test_live_fetch_read_timeout_not_transparently_retried(server, spark):
    """A read TIMEOUT on a pooled connection is a slow-but-alive host,
    not a stale socket: the client must NOT transparently reconnect and
    re-send (that would double the effective timeout and re-issue a GET
    the server is still processing). The server must see exactly ONE
    request to /slow on exactly one TCP connection."""
    from pyspark.sql import functions as F

    from silkworm_spark.operators.fetch import live_fetch

    base = CONN_COUNT["n"]
    with HITS_LOCK:
        HITS.pop("/slow", None)
    batch = _mk_batch(spark, server, ["/", "/slow"]).withColumn(
        "timeout",
        F.when(F.col("url").endswith("/slow"), F.lit(0.6)).otherwise(F.lit(5.0)),
    )
    out = {r["url"]: r for r in live_fetch(batch.repartition(1), timeout_s=5).collect()}
    assert out[f"{server}/"]["status"] == 200
    slow = out[f"{server}/slow"]
    assert slow["status"] is None and slow["error"] is not None
    with HITS_LOCK:
        assert len(HITS.get("/slow", [])) == 1  # no transparent re-send
    assert CONN_COUNT["n"] - base == 1  # no reconnect either


def test_decode_content_rewrites_headers():
    """_decode_content must leave headers describing the stored body:
    on a successful decode Content-Encoding is removed and
    Content-Length rewritten; on an undecodable body both survive
    untouched alongside the raw bytes."""
    import gzip as _gzip

    from silkworm_spark.operators.fetch import _decode_content

    raw = b"<html>" + b"x" * 100 + b"</html>"
    gz = _gzip.compress(raw)
    h = {"Content-Encoding": "gzip", "Content-Length": str(len(gz))}
    assert _decode_content(gz, h) == raw
    assert "Content-Encoding" not in h
    assert h["Content-Length"] == str(len(raw))

    h2 = {"Content-Encoding": "gzip", "Content-Length": "5"}
    assert _decode_content(b"nope!", h2) == b"nope!"
    assert h2 == {"Content-Encoding": "gzip", "Content-Length": "5"}


def test_env_proxy_applies(monkeypatch):
    """Environment proxies must route requests off the raw keep-alive
    pool (which would bypass them) — scheme-matched, no_proxy-aware."""
    from silkworm_spark.operators.fetch import _env_proxy_applies

    for var in ("http_proxy", "https_proxy", "no_proxy",
                "HTTP_PROXY", "HTTPS_PROXY", "NO_PROXY"):
        monkeypatch.delenv(var, raising=False)
    assert not _env_proxy_applies("http", "example.com")
    monkeypatch.setenv("http_proxy", "http://proxy.internal:3128")
    assert _env_proxy_applies("http", "example.com")
    assert not _env_proxy_applies("https", "example.com")  # scheme-matched
    monkeypatch.setenv("no_proxy", "example.com")
    assert not _env_proxy_applies("http", "example.com")  # no_proxy wins
