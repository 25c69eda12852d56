"""CDP fetch path over an in-process loopback CDP simulator
(reference cdp.py:26-397 — Lightpanda/headless-Chrome backends).

No browser exists in this sandbox, so the simulator speaks real
RFC-6455 websocket + CDP JSON over 127.0.0.1: createTarget/attach/
enable, Page.navigate + Page.loadEventFired, Runtime.evaluate
outerHTML/document.location, optional Page.getNavigationHistory (off
⇒ exercises the reference's Lightpanda fallback, cdp.py:296-316).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
import threading

import pytest

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

PAGES = {
    "http://cdp.test/": "<html><head><title>cdp root</title></head>"
                        "<body><p>rendered root</p>"
                        "<a id='next' href='http://cdp.test/two'>next</a>"
                        "</body></html>",
    "http://cdp.test/two": "<html><head><title>cdp two</title></head>"
                           "<body><p>rendered two</p></body></html>",
    "http://cdp.test/empty": "",  # empty outerHTML -> CDP fetch error
    "http://cdp.test/js-redirect": "!REDIRECT",  # location.href moved
}


class _CDPSim(threading.Thread):
    """Thread-per-connection CDP endpoint; each connection gets its own
    page state (matching one browser tab per CDP session)."""

    def __init__(self, with_history: bool):
        super().__init__(daemon=True)
        self.with_history = with_history
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(32)
        self.port = self.srv.getsockname()[1]
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def stop(self):
        self._halt.set()
        self.srv.close()

    # -- websocket server plumbing --
    def _handshake(self, conn) -> bool:
        buf = b""
        while b"\r\n\r\n" not in buf:
            chunk = conn.recv(4096)
            if not chunk:
                return False
            buf += chunk
        key = ""
        for line in buf.split(b"\r\n"):
            if line.lower().startswith(b"sec-websocket-key:"):
                key = line.split(b":", 1)[1].strip().decode()
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        conn.sendall(
            b"HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            b"Connection: Upgrade\r\nSec-WebSocket-Accept: " + accept.encode()
            + b"\r\n\r\n"
        )
        return True

    @staticmethod
    def _read_exact(conn, n) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client gone")
            buf += chunk
        return buf

    def _recv_msg(self, conn) -> str | None:
        b1, b2 = self._read_exact(conn, 2)
        op, ln = b1 & 0x0F, b2 & 0x7F
        if ln == 126:
            (ln,) = struct.unpack("!H", self._read_exact(conn, 2))
        elif ln == 127:
            (ln,) = struct.unpack("!Q", self._read_exact(conn, 8))
        mask = self._read_exact(conn, 4) if b2 & 0x80 else b""
        payload = self._read_exact(conn, ln)
        if mask:
            payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
        if op == 0x8:
            return None
        return payload.decode()

    @staticmethod
    def _send_msg(conn, obj: dict) -> None:
        payload = json.dumps(obj).encode()
        n = len(payload)
        if n < 126:
            head = b"\x81" + struct.pack("!B", n)
        elif n < 1 << 16:
            head = b"\x81" + struct.pack("!BH", 126, n)
        else:
            head = b"\x81" + struct.pack("!BQ", 127, n)
        conn.sendall(head + payload)

    # -- CDP protocol --
    def _serve(self, conn):
        try:
            if not self._handshake(conn):
                return
            current_url = "about:blank"
            history: list[str] = []
            while True:
                raw = self._recv_msg(conn)
                if raw is None:
                    return
                msg = json.loads(raw)
                mid, method = msg.get("id"), msg.get("method")
                params = msg.get("params") or {}
                if method == "Target.createTarget":
                    self._send_msg(conn, {"id": mid, "result": {"targetId": "T1"}})
                elif method == "Target.attachToTarget":
                    self._send_msg(conn, {"id": mid, "result": {"sessionId": "S1"}})
                elif method == "Page.navigate":
                    current_url = params["url"]
                    if PAGES.get(current_url) == "!REDIRECT":
                        current_url = "http://cdp.test/two"  # JS nav
                    history.append(current_url)
                    self._send_msg(conn, {"id": mid, "result": {"frameId": "F1"}})
                    self._send_msg(conn, {"method": "Page.loadEventFired",
                                          "params": {"timestamp": 1.0}})
                elif method == "Runtime.evaluate":
                    expr = params.get("expression", "")
                    if "outerHTML" in expr:
                        value = PAGES.get(current_url, "<html>404</html>")
                    else:  # document.location.href
                        value = current_url
                    self._send_msg(conn, {"id": mid,
                                          "result": {"result": {"value": value}}})
                elif method == "Page.getNavigationHistory":
                    if self.with_history:
                        self._send_msg(conn, {"id": mid, "result": {
                            "currentIndex": len(history) - 1,
                            "entries": [{"url": u} for u in history],
                        }})
                    else:  # Lightpanda: unimplemented command
                        self._send_msg(conn, {"id": mid, "error": {
                            "message": "'Page.getNavigationHistory' wasn't found"}})
                elif mid is not None:  # enable/closeTarget/etc.
                    self._send_msg(conn, {"id": mid, "result": {}})
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()


@pytest.fixture(scope="module", params=[True, False],
                ids=["with-history", "lightpanda-fallback"])
def cdp_endpoint(request):
    sim = _CDPSim(with_history=request.param)
    sim.start()
    yield f"ws://127.0.0.1:{sim.port}"
    sim.stop()


def test_cdp_client_fetch(cdp_endpoint):
    from silkworm_spark.operators.cdp import CDPClient, CDPError

    client = CDPClient(cdp_endpoint, timeout=5.0)
    try:
        r = client.fetch("http://cdp.test/")
        assert r["status"] == 200
        assert b"rendered root" in r["body"]
        assert r["final_url"] == "http://cdp.test/"
        # JS navigation: final_url reflects where the page ENDED UP,
        # via getNavigationHistory or the document.location fallback
        r2 = client.fetch("http://cdp.test/js-redirect")
        assert r2["final_url"] == "http://cdp.test/two"
        assert b"rendered two" in r2["body"]
        # empty outerHTML is an error (reference cdp.py:276-277)
        with pytest.raises(CDPError, match="Failed to retrieve HTML"):
            client.fetch("http://cdp.test/empty")
    finally:
        client.close()


def test_fetch_html_cdp_one_off(cdp_endpoint):
    """The driver-side rendered-DOM one-off (reference api.py:41-91):
    connect → navigate → rendered outerHTML → (text, Document), target
    closed afterwards. Sits beside test_fetch_html_one_off the same way
    the reference pairs fetch_html / fetch_html_cdp."""
    from silkworm_spark.api import fetch_html_cdp

    text, doc = fetch_html_cdp(
        "http://cdp.test/", ws_endpoint=cdp_endpoint, timeout=5.0
    )
    assert "rendered root" in text
    assert doc.select_first("title").text == "cdp root"


def test_cdp_fetch_stage(cdp_endpoint, spark):
    from pyspark.sql import functions as F

    from silkworm_spark.operators.cdp import cdp_fetch
    from silkworm_spark.schemas import FRONTIER_SCHEMA

    rows = []
    for i, path in enumerate(["", "two", "empty"]):
        rows.append(dict(
            url=f"http://cdp.test/{path}", url_hash=i, host="cdp.test", depth=0,
            parent_seq=-1, child_index=i, seq=i, callback="parse",
            priority=0, dont_filter=False, retry_times=0, not_before=0.0,
            round_added=0, method=None, headers=None, params=None,
            meta=None, data=None, timeout=5.0,
        ))
    batch = spark.createDataFrame(
        [tuple(r[f.name] for f in FRONTIER_SCHEMA.fields) for r in rows],
        FRONTIER_SCHEMA,
    ).withColumn("part", F.lit(0))
    out = {r["url"]: r for r in cdp_fetch(batch, cdp_endpoint, timeout_s=5).collect()}

    ok = out["http://cdp.test/"]
    assert ok["status"] == 200 and b"rendered root" in ok["body"]
    assert ok["content_type"] == "text/html; charset=utf-8"
    assert out["http://cdp.test/two"]["status"] == 200
    bad = out["http://cdp.test/empty"]
    assert bad["status"] is None and "Failed to retrieve HTML" in bad["error"]


def test_cdp_crawl_end_to_end(cdp_endpoint, spark, tmp_path):
    from pyspark.sql import functions as F

    from silkworm_spark.operators.spider import register_spider_callback
    from silkworm_spark.plans.engine import CrawlConfig, CrawlEngine
    from silkworm_spark.schemas import SEEDS_SCHEMA

    @register_spider_callback("cdp_titles")
    def cdp_titles(resp):
        t = resp.select_first("title")
        if t is not None:
            yield {"title": t.text}
        nxt = resp.select_first("a#next")
        if nxt is not None:
            yield resp.follow(nxt.attr("href"))

    eng = CrawlEngine(
        spark, str(tmp_path / "ckpt"),
        CrawlConfig(max_rounds=4, round_budget=10, request_timeout=5.0,
                    cdp_endpoint=cdp_endpoint),
        fetch_mode="cdp",
    )
    seeds = spark.createDataFrame([("http://cdp.test/", 0, 0)], SEEDS_SCHEMA) \
        .withColumn("callback", F.lit("cdp_titles"))
    eng.initialize(seeds, None)
    stats = eng.run()

    assert stats.requests_sent == 2 and stats.responses_received == 2
    items = sorted(json.loads(r["item"])["title"] for r in eng.items().collect())
    assert items == ["cdp root", "cdp two"]


@pytest.mark.skipif(
    not os.environ.get("SILKWORM_CDP_WS"),
    reason="set SILKWORM_CDP_WS=ws://host:port/... to smoke-test a real browser",
)
def test_cdp_real_browser_smoke():
    """Opt-in smoke against a NON-synthetic CDP peer (real Chrome /
    Lightpanda / chromium --headless --remote-debugging-port=9222):
    exercises the stdlib RFC-6455 client's frame handling — masking,
    fragmentation, big-payload reads — against a production
    implementation instead of the loopback simulator. Point
    SILKWORM_CDP_WS at the browser's DevTools websocket (the
    webSocketDebuggerUrl from http://host:port/json/version)."""
    from silkworm_spark.operators.cdp import CDPClient

    client = CDPClient(os.environ["SILKWORM_CDP_WS"], timeout=20.0)
    try:
        res = client.fetch("about:blank")
        assert res["error"] is None, res
        assert isinstance(res["body"], (bytes, bytearray))
    finally:
        client.close()
