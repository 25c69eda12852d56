"""CDP (Chrome DevTools Protocol) fetch stage.

Rebuilds the reference's CDP browser-rendering path (cdp.py:26-397,
used for Lightpanda/headless-Chrome backends) Spark-first: each
executor partition holds ONE CDP page session (a browser tab is
stateful — navigations are inherently serial per tab), and the
scheduler's salted ``part`` key supplies the fan-out, which is the
distributed analog of the reference's semaphore-capped concurrency
(cdp.py:53 ``asyncio.Semaphore(concurrency)``).

Protocol semantics mirrored from the reference client:

- connect → ``Target.createTarget`` → ``Target.attachToTarget``
  (flatten) → enable Page/Runtime/Network (cdp.py:199-225)
- fetch = ``Page.navigate``, wait for ``Page.loadEventFired`` with a
  proceed-anyway timeout (cdp.py:247-262), then
  ``Runtime.evaluate document.documentElement.outerHTML`` with
  ``returnByValue`` (cdp.py:264-274)
- final URL via ``Page.getNavigationHistory``; backends that don't
  implement it (e.g. Lightpanda) fall back to
  ``document.location.href`` (cdp.py:278-316)
- CDP exposes no HTTP status: responses surface as 200 with
  ``text/html; charset=utf-8`` (cdp.py:330-339)
- empty outerHTML ⇒ error "Failed to retrieve HTML content"
  (cdp.py:276-277)

The websocket layer is a minimal stdlib RFC-6455 client (the sandbox
has no ``websockets`` package; the reference import-gates on it,
cdp.py:16-23). Frame cap = ``html_max_bytes``, mirroring the
reference's ``max_size`` budget (cdp.py:81-84).

Tested against an in-process loopback CDP simulator
(tests/test_cdp_fetch.py) — no real browser exists in this sandbox.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
from collections.abc import Iterator
from time import monotonic
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame

from silkworm_spark.schemas import FETCH_RESULT_SCHEMA

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class CDPError(Exception):
    """CDP protocol / transport failure (reference HttpError role)."""


class MiniWebSocket:
    """Just-enough RFC-6455 client: masked text frames out, text frames
    (with continuation/ping/pong/close handling) in. Server→client
    frames are unmasked per the RFC; client→server frames are masked
    with ``os.urandom`` keys (the handshake nonce is random too — both
    are transport-level and never affect crawl determinism)."""

    def __init__(self, url: str, timeout: float = 30.0, max_size: int = 8_000_000):
        parts = urlsplit(url)
        if parts.scheme not in ("ws", "http"):
            raise CDPError(f"unsupported CDP endpoint scheme: {parts.scheme}")
        host = parts.hostname or "127.0.0.1"
        port = parts.port or 9222
        self.max_size = max_size
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)
        key = base64.b64encode(os.urandom(16)).decode()
        path = parts.path or "/"
        req = (
            f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        resp = self._read_until(b"\r\n\r\n")
        status = resp.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise CDPError(f"websocket handshake rejected: {status.decode(errors='replace')}")
        want = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        accept = ""
        for line in resp.split(b"\r\n"):
            if line.lower().startswith(b"sec-websocket-accept:"):
                accept = line.split(b":", 1)[1].strip().decode()
        if accept != want:
            raise CDPError("websocket handshake: bad Sec-WebSocket-Accept")

    def _read_until(self, delim: bytes) -> bytes:
        buf = b""
        while delim not in buf:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise CDPError("connection closed during handshake")
            buf += chunk
            if len(buf) > 65536:
                raise CDPError("oversized handshake response")
        return buf.split(delim, 1)[0]

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise CDPError("connection closed mid-frame")
            buf += chunk
        return buf

    def send_text(self, text: str) -> None:
        payload = text.encode()
        mask = os.urandom(4)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        n = len(payload)
        head = b"\x81"  # FIN + text
        if n < 126:
            head += struct.pack("!B", 0x80 | n)
        elif n < 1 << 16:
            head += struct.pack("!BH", 0x80 | 126, n)
        else:
            head += struct.pack("!BQ", 0x80 | 127, n)
        self.sock.sendall(head + mask + masked)

    def recv_text(self) -> str:
        """Next complete text message (reassembling continuations,
        answering pings, raising on close)."""
        message = b""
        opcode = None
        while True:
            b1, b2 = self._read_exact(2)
            fin, op = b1 & 0x80, b1 & 0x0F
            masked, ln = b2 & 0x80, b2 & 0x7F
            if ln == 126:
                (ln,) = struct.unpack("!H", self._read_exact(2))
            elif ln == 127:
                (ln,) = struct.unpack("!Q", self._read_exact(8))
            if ln > self.max_size:
                raise CDPError(f"frame exceeds max_size ({ln} > {self.max_size})")
            mask = self._read_exact(4) if masked else b""
            payload = self._read_exact(ln)
            if mask:
                payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
            if op == 0x8:  # close
                raise CDPError("websocket closed by server")
            if op == 0x9:  # ping → pong
                self.sock.sendall(b"\x8a" + struct.pack("!B", 0x80 | len(payload))
                                  + b"\x00\x00\x00\x00" + payload)
                continue
            if op == 0xA:  # pong
                continue
            if op in (0x1, 0x2, 0x0):
                if op != 0x0:
                    opcode = op
                message += payload
                if len(message) > self.max_size:
                    raise CDPError("message exceeds max_size")
                if fin:
                    if opcode == 0x2:
                        raise CDPError("unexpected binary CDP frame")
                    return message.decode()

    def close(self) -> None:
        try:
            self.sock.sendall(b"\x88\x80\x00\x00\x00\x00")
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


class CDPClient:
    """Synchronous CDP client over :class:`MiniWebSocket`.

    The reference client is asyncio with a background receive loop
    (cdp.py:103-159); inside a Spark python worker the session is
    single-tenant, so a synchronous request/reply loop that buffers
    interleaved events is the simpler equivalent — command replies are
    matched by ``id``, ``Page.loadEventFired`` events seen on the way
    set a flag (cdp.py:130-134).
    """

    def __init__(self, ws_endpoint: str = "ws://127.0.0.1:9222",
                 timeout: float = 30.0, html_max_bytes: int = 5_000_000):
        self.ws = MiniWebSocket(ws_endpoint, timeout=timeout,
                                max_size=max(html_max_bytes * 2, 1 << 20))
        self.timeout = timeout
        self._id = 0
        self._session_id: str | None = None
        self._target_id: str | None = None
        self._load_fired = False
        # createTarget → attachToTarget(flatten) → enable domains
        # (reference _create_target, cdp.py:199-225)
        tid = self.cmd("Target.createTarget", {"url": "about:blank"}).get("targetId")
        if not tid:
            raise CDPError("Failed to create CDP target")
        self._target_id = tid
        sid = self.cmd("Target.attachToTarget",
                       {"targetId": tid, "flatten": True}).get("sessionId")
        if not sid:
            raise CDPError("Failed to attach to CDP target")
        self._session_id = sid
        for domain in ("Page.enable", "Runtime.enable", "Network.enable"):
            self.cmd(domain)

    def cmd(self, method: str, params: dict | None = None) -> dict:
        self._id += 1
        msg = {"id": self._id, "method": method, "params": params or {}}
        if self._session_id:
            msg["sessionId"] = self._session_id
        self.ws.send_text(json.dumps(msg))
        deadline = monotonic() + self.timeout
        while True:
            if monotonic() > deadline:
                raise CDPError(f"CDP command {method} timed out")
            data = json.loads(self.ws.recv_text())
            if data.get("method") == "Page.loadEventFired":
                self._load_fired = True
                continue
            if data.get("id") == self._id:
                if "error" in data:
                    raise CDPError(
                        f"CDP error: {data['error'].get('message', 'Unknown CDP error')}"
                    )
                return data.get("result", {})
            # stale reply or unrelated event: drop (single-tenant session)

    def _wait_load(self, deadline: float) -> None:
        """Wait for Page.loadEventFired; PROCEED on timeout like the
        reference (cdp.py:255-262). select() gates each read so a
        timeout never fires mid-frame (which would desync the
        websocket framing for every later command)."""
        import select

        while not self._load_fired and monotonic() < deadline:
            ready, _, _ = select.select(
                [self.ws.sock], [], [], max(0.05, deadline - monotonic()))
            if not ready:
                break
            data = json.loads(self.ws.recv_text())
            if data.get("method") == "Page.loadEventFired":
                self._load_fired = True

    def fetch(self, url: str, timeout: float | None = None) -> dict:
        """Navigate, wait for load, extract outerHTML; returns a
        fetch-result dict (status fixed at 200 — CDP doesn't expose
        the HTTP status, cdp.py:330-339)."""
        tmo = timeout if timeout is not None else self.timeout
        deadline = monotonic() + tmo
        self._load_fired = False
        self.cmd("Page.navigate", {"url": url})
        self._wait_load(deadline)
        result = self.cmd("Runtime.evaluate", {
            "expression": "document.documentElement.outerHTML",
            "returnByValue": True,
        })
        html = (result.get("result") or {}).get("value", "")
        if not html:
            raise CDPError(f"Failed to retrieve HTML content from {url}")
        final_url = url
        try:
            nav = self.cmd("Page.getNavigationHistory")
            entries = nav.get("entries", [])
            idx = nav.get("currentIndex", 0)
            if entries and idx < len(entries):
                final_url = entries[idx].get("url", url)
        except CDPError:
            # Lightpanda-style backend: document.location fallback
            # (cdp.py:296-316)
            try:
                loc = self.cmd("Runtime.evaluate", {
                    "expression": "document.location.href",
                    "returnByValue": True,
                })
                value = (loc.get("result") or {}).get("value")
                if isinstance(value, str) and value:
                    final_url = value
            except CDPError:
                pass
        return dict(
            final_url=final_url, status=200,
            content_type="text/html; charset=utf-8",
            body=html.encode("utf-8"), redirect_times=0, error=None,
            resp_headers={"content-type": "text/html; charset=utf-8"},
        )

    def close(self) -> None:
        try:
            if self._target_id:
                self.cmd("Target.closeTarget", {"targetId": self._target_id})
        except CDPError:
            pass
        self.ws.close()


def cdp_fetch(
    batch: DataFrame,
    ws_endpoint: str = "ws://127.0.0.1:9222",
    timeout_s: float = 30.0,
    html_max_bytes: int = 5_000_000,
) -> DataFrame:
    """Browser-rendered fetch stage: one CDP page session per Arrow
    partition, rows navigated serially within it (a tab renders one
    page at a time); cross-partition fan-out supplies the concurrency
    the reference gets from its semaphore pool (cdp.py:52-53). Output
    contract matches ``live_fetch`` exactly, so the engine's
    retry/parse/metrics pipeline downstream is identical. Per-row error
    containment: a failed navigation yields an ``error`` row, a dead
    endpoint fails every row in the partition as rows, never as a task
    abort."""
    from silkworm_spark.operators.fetch import _CARRY

    carry = [f.name for f in batch.schema.fields
             if f.name in _CARRY or f.name in ("ua", "proxy")]
    out_schema = ", ".join(
        [f"{c} {batch.schema[c].dataType.simpleString()}" for c in carry]
        + [f"{f.name} {f.dataType.simpleString()}" for f in FETCH_RESULT_SCHEMA.fields
           if f.name != "url"]
    )

    def val(x):
        if x is None or (isinstance(x, float) and x != x):
            return None
        return x

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client: CDPClient | None = None
        err: str | None = None
        try:
            client = CDPClient(ws_endpoint, timeout=timeout_s,
                               html_max_bytes=html_max_bytes)
        except Exception as exc:  # dead endpoint → error rows below
            err = f"{type(exc).__name__}: {exc}"

        def fetch_one(row: dict) -> dict:
            if client is None:
                return dict(row, final_url=None, status=None, content_type=None,
                            body=None, redirect_times=0, error=err,
                            resp_headers=None)
            try:
                tmo = val(row.get("timeout")) or timeout_s
                return dict(row, **client.fetch(row["url"], timeout=tmo))
            except Exception as exc:
                return dict(row, final_url=None, status=None, content_type=None,
                            body=None, redirect_times=0,
                            error=f"{type(exc).__name__}: {exc}",
                            resp_headers=None)

        try:
            for pdf in batches:
                rows = pdf[carry].to_dict("records")
                yield pd.DataFrame([fetch_one(r) for r in rows],
                                   columns=carry + [
                                       f.name for f in FETCH_RESULT_SCHEMA.fields
                                       if f.name != "url"])
        finally:
            if client is not None:
                client.close()

    return batch.mapInPandas(gen, schema=out_schema)
