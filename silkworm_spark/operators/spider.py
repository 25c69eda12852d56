"""Reference-style spider surface: Request / Response / callback registry.

The reference spider API (request.py:13-31, response.py:99-130,
spiders.py) hands callbacks a Response with CSS/XPath selection and
lets them yield Requests and free-form JSON items. This module is that
surface re-expressed for the vectorized parse stage: callbacks
registered here run INSIDE mapInArrow batches, receive a
``SparkResponse`` facade over the fetched row, and may yield:

- ``Request(...)``           → a child frontier row (full request
                               surface: method/headers/params/meta/
                               data/timeout/priority/dont_filter)
- ``response.follow(href)``  → same, URL resolved against the page
- any JSON-serializable obj  → an item, JSON-encoded into the `items`
                               sink table (reference engine.py:200-268
                               routes non-Request yields to pipelines)

Legacy low-level callbacks (dicts with ``out_kind``) keep working —
the registry stores both styles behind one internal protocol.
"""

from __future__ import annotations

import json as _json
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Iterator

from silkworm_spark.functions.dom import Document, SelectorError
from silkworm_spark.functions.text import decode_body
from silkworm_spark.functions.urls import merge_params, url_join


@dataclass
class Request:
    """Mirror of the reference Request (request.py:13-31). ``callback``
    is a registry NAME (function pointers can't ride in rows); ``json``
    is serialized into ``data`` + a content-type header exactly like an
    HTTP client would (the reference forwards it to rnet which does the
    same)."""

    url: str
    method: str = "GET"
    headers: dict[str, str] = field(default_factory=dict)
    params: dict[str, str] = field(default_factory=dict)
    data: bytes | None = None
    json: Any = None
    meta: dict[str, str] = field(default_factory=dict)
    timeout: float | None = None
    callback: str | None = None
    dont_filter: bool = False
    priority: int = 0

    def replace(self, **kwargs: object) -> "Request":
        return replace(self, **kwargs)  # reference request.py:27-31

    def _body_and_headers(self) -> tuple[bytes | None, dict[str, str]]:
        if self.json is not None:
            h = dict(self.headers)
            h.setdefault("content-type", "application/json")
            return _json.dumps(self.json).encode("utf-8"), h
        return self.data, self.headers


class SparkResponse:
    """Response facade over one fetched row (reference response.py:99-130
    + HTMLResponse selectors 316-351). ``url`` is the params-merged
    request URL (the reference passes ``_build_url``'s output as
    Response.url, http.py:83,190-200)."""

    __slots__ = ("_row", "_text", "_doc", "doc_max_size_bytes")

    def __init__(self, row: dict, doc_max_size_bytes: int = 5_000_000):
        self._row = row
        self._text: str | None = None
        self._doc: Document | None = None
        self.doc_max_size_bytes = doc_max_size_bytes

    # --- request side ---
    @property
    def request_url(self) -> str:  # the raw (seen-set) URL
        return self._row["url"]

    @property
    def url(self) -> str:
        p = self._row.get("params")
        return merge_params(self._row["url"], p) if p else self._row["url"]

    @property
    def meta(self) -> dict:
        return self._row.get("meta") or {}

    @property
    def request_headers(self) -> dict:
        return self._row.get("headers") or {}

    @property
    def method(self) -> str:
        return self._row.get("method") or "GET"

    @property
    def callback(self) -> str:
        return self._row.get("callback") or "parse"

    @property
    def depth(self) -> int:
        return self._row.get("depth") or 0

    # --- response side ---
    @property
    def final_url(self) -> str:
        return self._row.get("final_url") or self.url

    @property
    def status(self) -> int | None:
        return self._row["status"]

    @property
    def body(self) -> bytes:
        return self._row.get("body") or b""

    @property
    def content_type(self) -> str | None:
        return self._row.get("content_type")

    @property
    def headers(self) -> dict[str, str]:
        """Normalized (lowercase-key) response headers, reference
        http.py:323-364. The offline fixture carries only the
        content-type; live fetch supplies the full map."""
        h = self._row.get("resp_headers")
        if h:
            return {str(k).strip().lower(): str(v).strip() for k, v in h.items()}
        ct = self._row.get("content_type")
        return {"content-type": ct} if ct else {}

    @property
    def text(self) -> str:
        if self._text is None:
            self._text, _enc = decode_body(self.body, self.content_type)
        return self._text

    # --- selection (reference response.py:335-351, sync) ---
    @property
    def doc(self) -> Document:
        if self._doc is None:
            try:
                self._doc = Document(self.text, max_size_bytes=self.doc_max_size_bytes)
            except SelectorError:
                raise
            except Exception as exc:
                raise SelectorError(f"document parse failed for {self.url}: {exc}")
        return self._doc

    def select(self, selector: str):
        return self.doc.select(selector)

    def select_first(self, selector: str):
        return self.doc.select_first(selector)

    css = select
    css_first = select_first

    def xpath(self, path: str):
        return self.doc.xpath(path)

    def xpath_first(self, path: str):
        return self.doc.xpath_first(path)

    # --- navigation (reference response.py:260-297) ---
    def follow(self, href: str, callback: str | None = None, **kwargs) -> Request:
        absolute = url_join(self.final_url, href) or href
        # callback inheritance: explicit wins, else the parent's
        # (reference response.py:271-284)
        return Request(url=absolute, callback=callback or self._row.get("callback"),
                       **kwargs)

    def follow_all(self, hrefs, callback: str | None = None, **kwargs) -> list[Request]:
        return [self.follow(h, callback=callback, **kwargs)
                for h in hrefs if h is not None]


SpiderCallback = Callable[[SparkResponse], "Iterator[Request | Any] | None"]


def adapt_spider_callback(fn: SpiderCallback) -> Callable[[dict], Iterator[dict]]:
    """Wrap a reference-style callback into the internal parse protocol
    (dicts with out_kind — see operators/parse.py). Yield normalization
    mirrors reference engine.py:200-268: Requests enqueue, everything
    else JSON-encodes into the items stream, None is skipped."""

    def adapter(row: dict) -> Iterator[dict]:
        resp = SparkResponse(row, doc_max_size_bytes=row.get("_html_max") or 5_000_000)
        out = fn(resp)
        if out is None:
            return
        k = 0
        for o in out:
            if o is None:
                continue
            if isinstance(o, Request):
                body, headers = o._body_and_headers()
                yield dict(
                    out_kind="request", child_url=o.url, child_index=k,
                    callback=o.callback, method=o.method if o.method != "GET" else None,
                    headers=headers or None, params=o.params or None,
                    meta=o.meta or None, data=body, timeout=o.timeout,
                    priority=o.priority or None, dont_filter=o.dont_filter or None,
                )
                k += 1
            else:
                yield dict(out_kind="json_item", item=_json.dumps(o, sort_keys=True))

    adapter.__name__ = getattr(fn, "__name__", "spider_callback")
    return adapter


def register_spider_callback(name: str) -> Callable[[SpiderCallback], SpiderCallback]:
    """Decorator: register a reference-style callback under ``name`` so
    frontier rows can dispatch to it by column value.

    Spider code lives on the driver; executors can't import it (the
    reference ships spider modules with the process, spark-submit
    ships only --py-files). Registering the callback's module for
    BY-VALUE cloudpickle serialization makes the parse stage's closure
    carry the callback's code to executors — the Spark-native way to
    ship user callbacks without repackaging."""
    import sys

    from silkworm_spark.operators.parse import CALLBACKS

    def deco(fn: SpiderCallback) -> SpiderCallback:
        mod = getattr(fn, "__module__", None)
        if mod and not mod.startswith("silkworm_spark"):
            import importlib

            # PySpark serializes plans with its VENDORED cloudpickle;
            # register on it (and the standalone one, for completeness)
            for pickler in ("pyspark.cloudpickle", "cloudpickle"):
                try:
                    importlib.import_module(pickler).register_pickle_by_value(
                        sys.modules[mod]
                    )
                except Exception:
                    pass  # fall back: module must be importable on executors
        CALLBACKS[name] = adapt_spider_callback(fn)
        return fn

    return deco
