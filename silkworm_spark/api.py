"""One-off fetch API (reference api.py:11-38, 41-91).

``fetch_html(url)`` fetches a single URL and returns ``(text,
Document)`` for immediate CSS/XPath selection — the reference's
driver-side convenience, no SparkSession involved. ``fetch_html_cdp``
is the rendered-DOM variant: it drives a CDP-compatible browser
(Chrome/Chromium/Lightpanda) over its DevTools websocket and returns
the post-JavaScript HTML, composing the same ``CDPClient`` the crawl's
``cdp_fetch`` stage uses.
"""

from __future__ import annotations

import urllib.request

from silkworm_spark.functions.dom import Document
from silkworm_spark.functions.text import decode_body


def fetch_html(
    url: str,
    *,
    timeout: float | None = None,
    headers: dict[str, str] | None = None,
    max_size_bytes: int = 5_000_000,
) -> tuple[str, Document]:
    """Fetch one URL, return (decoded text, parsed Document).

    Mirrors reference api.fetch_html (api.py:11-38) on stdlib HTTP: the
    reference builds an rnet client per call and a scraper_rs Document
    from the text; here the charset cascade and DOM parser are the same
    ones the crawl's parse stage uses."""
    h = {"user-agent": "silkworm-spark/0.1"}
    for k, v in (headers or {}).items():
        h[str(k).lower()] = str(v)
    req = urllib.request.Request(url, headers=h)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
        content_type = resp.headers.get("content-type")
    text, _enc = decode_body(body, content_type)
    return text, Document(text, max_size_bytes=max_size_bytes)


def fetch_html_cdp(
    url: str,
    *,
    ws_endpoint: str = "ws://127.0.0.1:9222",
    timeout: float | None = None,
    max_size_bytes: int = 5_000_000,
) -> tuple[str, Document]:
    """Fetch one URL through a CDP browser, return (rendered text,
    parsed Document).

    Mirrors reference api.fetch_html_cdp (api.py:41-91): connect to the
    DevTools websocket, navigate, wait for the load event, read the
    rendered ``outerHTML``, close the target — but synchronously, via
    the same :class:`~silkworm_spark.operators.cdp.CDPClient` the
    distributed ``cdp_fetch`` stage runs inside Spark workers. The body
    goes through the same charset cascade as :func:`fetch_html` so both
    one-offs decode identically."""
    from silkworm_spark.operators.cdp import CDPClient

    client = CDPClient(
        ws_endpoint=ws_endpoint,
        timeout=timeout if timeout is not None else 30.0,
        html_max_bytes=max_size_bytes,
    )
    try:
        res = client.fetch(url, timeout=timeout)
    finally:
        client.close()
    text, _enc = decode_body(res["body"], res.get("content_type"))
    return text, Document(text, max_size_bytes=max_size_bytes)
