"""One-off fetch API (reference api.py:11-38).

``fetch_html(url)`` fetches a single URL and returns ``(text,
Document)`` for immediate CSS/XPath selection — the reference's
driver-side convenience, no SparkSession involved. The CDP variant
(api.py:42-60, rendered-DOM fetch via a browser websocket) is out of
scope v1: no browser runtime ships with a Spark cluster; SURVEY.md §2.1
declares the divergence.
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
