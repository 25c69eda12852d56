"""The parse stage: spider callbacks as a vectorized pandas-UDF registry.

The reference dispatches a function pointer per request
(``resp.request.callback or spider.parse``, engine.py:183-190) and
normalizes the yielded mix of items and Requests (engine.py:200-268).
Function pointers can't live in DataFrame rows, so the rebuild makes
the callback a *name column* dispatched through ``CALLBACKS``; every
callback consumes decoded responses and emits rows of
``PARSE_OUT_SCHEMA`` — 'item' rows carry the interleaved span array,
'request' rows carry one child URL each (the explode pattern standing
in for the reference's yielded Requests).

The whole stage runs as one ``mapInPandas`` pass (Arrow batches, no
per-row Python UDFs); errors are contained per row into the ``error``
column, mirroring worker-survives-error (engine.py:138-152).
"""

from __future__ import annotations

import html as _html_mod
import re
from collections.abc import Iterator
from html.parser import HTMLParser
from typing import Callable

from pyspark.sql import DataFrame

from silkworm_spark.functions.text import decode_body, is_html
from silkworm_spark.functions.urls import url_join
from silkworm_spark.schemas import PARSE_OUT_SCHEMA

Span = dict  # {kind, text, media_ref, offset}

_WS = re.compile(r"\s+")


class _SpanExtractor(HTMLParser):
    """Emit (kind, text, media_ref) spans in document order:
    <p> → text, <a href> → link (anchor text + absolute target),
    <img src> → image, <video src> → video. Head/script/style skipped."""

    _SKIP = {"head", "script", "style", "title"}

    def __init__(self, base_url: str) -> None:
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self.spans: list[Span] = []
        self._skip_depth = 0
        self._mode: str | None = None  # 'p' | 'a'
        self._buf: list[str] = []
        self._href: str | None = None

    def _flush(self) -> None:
        if self._mode == "p":
            text = _WS.sub(" ", "".join(self._buf)).strip()
            if text:
                self.spans.append(dict(kind="text", text=text, media_ref=None))
        elif self._mode == "a":
            text = _WS.sub(" ", "".join(self._buf)).strip()
            ref = url_join(self.base_url, self._href) if self._href else None
            self.spans.append(dict(kind="link", text=text or None, media_ref=ref))
        self._mode, self._buf, self._href = None, [], None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in self._SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        a = dict(attrs)
        if tag == "p":
            self._flush()
            self._mode = "p"
        elif tag == "a":
            self._flush()
            self._mode = "a"
            self._href = a.get("href")
        elif tag == "img" and a.get("src"):
            self._flush()
            self.spans.append(dict(
                kind="image", text=None,
                media_ref=url_join(self.base_url, a["src"]),
            ))
        elif tag == "video" and a.get("src"):
            self._flush()
            self.spans.append(dict(
                kind="video", text=None,
                media_ref=url_join(self.base_url, a["src"]),
            ))

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in self._SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in ("p", "a"):
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and self._mode is not None:
            self._buf.append(data)


def extract_spans_ref(html_text: str, base_url: str) -> list[Span]:
    """html.parser-based extractor — the readable specification, kept
    as the differential oracle for the fast scanner below (~10-20x
    slower; the parse stage is the crawl's dominant executor cost)."""
    p = _SpanExtractor(base_url)
    p.feed(html_text)
    p.close()
    p._flush()
    spans = p.spans
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


# ---- fast scanner: one compiled-regex pass, same span semantics ----
#
# html.parser walks the document char-by-char in Python (~3 ms/page on
# the 6 KB fixture pages — 75-90% of round wall time in BENCH r1). The
# scanner below tokenizes with ONE compiled regex (C speed), feeding
# the identical mode machine. Differential-tested against
# extract_spans_ref on every fixture page class (tests/test_parse.py).

_TOKEN_RE = re.compile(
    r"""<!--.*?(?:-->|$)                 # comment
      | <!\[CDATA\[.*?(?:\]\]>|$)        # cdata block
      | <![^>]*>                         # doctype / declaration
      | <\?[^>]*>                        # processing instruction
      # complete nesting-free <p>/<a> elements as ONE token (the
      # dominant page shape): body may not contain '<', attr quotes may
      # not hold '<' — anything else falls through to the generic
      # start-tag branch below and the mode machine handles it
      | <[pP]((?:\s(?:"[^"<]*"|'[^'<]*'|[^><"'])*)?)>  # p attrs -> 1
        ([^<]*)</[pP]\s*>                #   p body   -> group 2
      | <[aA]((?:\s(?:"[^"<]*"|'[^'<]*'|[^><"'])*)?)>  # a attrs -> 3
        ([^<]*)</[aA]\s*>                #   a body   -> group 4
      | </([a-zA-Z][^\s>]*)\s*>          # end tag        -> group 5
      | <([a-zA-Z][^\s>/]*)              # start tag name -> group 6
        ((?:"[^"]*"|'[^']*'|[^>"'])*)    # attrs (quotes may hold '>') -> 7
        (/?)>                            # self-closing marker -> 8
    """,
    re.S | re.X,
)
_SKIP_TAGS = _SpanExtractor._SKIP
_CDATA_END = {
    "script": re.compile(r"</script", re.I),
    "style": re.compile(r"</style", re.I),
}


_HREF_RE = re.compile(r"""(?<![-\w])href\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", re.I)
_SRC_RE = re.compile(r"""(?<![-\w])src\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", re.I)


def _attr_val(attrs: str, pat: re.Pattern,
              fast_prefix: str | None = None) -> str | None:
    # fast path: the dominant single-attribute shape (exactly
    # ` href="…"` / ` src="…"`, double-quoted, no inner quote) — the
    # regex would produce the identical value; anything else falls
    # through to it. ``fast_prefix`` must name the same attribute the
    # pattern matches.
    if (fast_prefix is not None and attrs.startswith(fast_prefix)
            and attrs.endswith('"')):
        v = attrs[len(fast_prefix):-1]
        if '"' not in v:
            return _html_mod.unescape(v) if "&" in v else v
    m = pat.search(attrs)
    if not m:
        return None
    v = m.group(1)
    if v[:1] in "\"'":
        v = v[1:-1]
    return _html_mod.unescape(v) if "&" in v else v


def scan_span_cols(
    html_text: str, base_url: str
) -> tuple[list[str], list[str | None], list[str | None]]:
    """Columnar core of the fast scanner: three parallel lists
    ``(kinds, texts, media_refs)``, list index = span offset. Exact
    semantics of extract_spans_ref via a single-regex tokenizer:
    <p> → text, <a href> → link (anchor text + absolute target),
    <img/video src> → media. head/script/style/title content skipped;
    script/style bodies treated as CDATA (no tag parsing inside), same
    as html.parser. Columnar so the Arrow output stage can bulk-extend
    its value buffers without building a dict per span (the parse
    stage is the crawl's dominant executor cost)."""
    kinds: list[str] = []
    texts: list[str | None] = []
    refs: list[str | None] = []
    mode: str | None = None
    buf: list[str] = []
    href: str | None = None
    skip_depth = 0
    pos = 0
    n = len(html_text)

    def flush() -> None:
        nonlocal mode, buf, href
        if mode == "p":
            # " ".join(split()) ≡ _WS.sub(" ", s).strip() (same Unicode
            # whitespace set), one C pass instead of regex sub + strip
            text = " ".join("".join(buf).split())
            if text:
                kinds.append("text")
                texts.append(text)
                refs.append(None)
        elif mode == "a":
            text = " ".join("".join(buf).split())
            kinds.append("link")
            texts.append(text or None)
            refs.append(url_join(base_url, href) if href else None)
        mode, buf, href = None, [], None

    while pos < n:
        m = _TOKEN_RE.search(html_text, pos)
        start = m.start() if m else n
        if start > pos and skip_depth == 0 and mode is not None:
            data = html_text[pos:start]
            buf.append(_html_mod.unescape(data) if "&" in data else data)
        if m is None:
            break
        pos = m.end()
        # branch on lastindex instead of unpacking all 8 groups per
        # token: 2 = complete <p> (group 2 = body), 4 = complete <a>
        # (3 = attrs, 4 = body), 5 = end tag, 8 = generic start tag
        # (6 = name, 7 = attrs, 8 = self-close marker — group 8 always
        # participates), None = comment/doctype/PI
        li = m.lastindex
        if li == 2:  # complete <p>…</p> in one token
            # generic equivalent: starttag flushes the pending mode
            # (or is ignored under skip), endtag flush emits — inside a
            # skip region the net effect is the single flush
            p_text = m.group(2)
            if mode is not None:
                flush()
            if skip_depth == 0:
                if "&" in p_text:
                    p_text = _html_mod.unescape(p_text)
                text = " ".join(p_text.split())
                if text:
                    kinds.append("text")
                    texts.append(text)
                    refs.append(None)
            continue
        if li == 4:  # complete <a …>…</a> in one token
            if mode is not None:
                flush()
            if skip_depth == 0:
                a_attrs, a_text = m.group(3), m.group(4)
                if "&" in a_text:
                    a_text = _html_mod.unescape(a_text)
                text = " ".join(a_text.split())
                h = _attr_val(a_attrs, _HREF_RE, ' href="') if a_attrs else None
                kinds.append("link")
                texts.append(text or None)
                refs.append(url_join(base_url, h) if h else None)
            continue
        if li == 5:  # end tag
            t = m.group(5).lower()
            if t in _SKIP_TAGS:
                skip_depth = max(0, skip_depth - 1)
            elif t in ("p", "a"):
                flush()
            continue
        if li is None:
            continue  # comment / doctype / PI
        tag, attrs, selfclose = m.group(6), m.group(7), m.group(8)
        t = tag.lower()
        if t in _SKIP_TAGS:
            skip_depth += 1
            if not selfclose:
                cd = _CDATA_END.get(t)
                if cd is not None:  # raw content until the closing tag
                    e = cd.search(html_text, pos)
                    pos = e.start() if e else n
            continue
        if skip_depth:
            continue
        if t == "p":
            flush()
            mode = "p"
        elif t == "a":
            flush()
            mode = "a"
            href = _attr_val(attrs, _HREF_RE, ' href="')
        elif t == "img":
            src = _attr_val(attrs, _SRC_RE, ' src="')
            if src:
                flush()
                kinds.append("image")
                texts.append(None)
                refs.append(url_join(base_url, src))
        elif t == "video":
            src = _attr_val(attrs, _SRC_RE, ' src="')
            if src:
                flush()
                kinds.append("video")
                texts.append(None)
                refs.append(url_join(base_url, src))
    flush()
    return kinds, texts, refs


def extract_spans(html_text: str, base_url: str) -> list[Span]:
    """Row-form wrapper over scan_span_cols — same spans as
    extract_spans_ref (differential-tested in tests/test_parse.py)."""
    kinds, texts, refs = scan_span_cols(html_text, base_url)
    return [
        dict(kind=k, text=t, media_ref=r, offset=i)
        for i, (k, t, r) in enumerate(zip(kinds, texts, refs))
    ]


def parse_default(row: dict) -> Iterator[dict]:
    """Built-in ``parse`` callback: on a 200 HTML response emit the
    document item (span array) plus one child request per link span,
    in document order (yield order — reference engine.py:200-210)."""
    if row["status"] != 200 or not is_html(row["body"], row["content_type"]):
        return
    text, _enc = decode_body(row["body"], row["content_type"])
    spans = extract_spans(text, row["final_url"] or row["url"])
    yield dict(out_kind="item", spans=spans, child_url=None, child_index=None)
    k = 0
    for s in spans:
        if s["kind"] == "link" and s["media_ref"]:
            yield dict(out_kind="request", spans=None, child_url=s["media_ref"], child_index=k)
            k += 1


_LOC_RE = re.compile(r"<loc>\s*([^<\s]+)\s*</loc>")


def parse_sitemap(row: dict) -> Iterator[dict]:
    """Sitemap XML → child requests per <loc>: sub-sitemaps (.xml)
    recurse into this callback, page URLs go to the default parser
    (reference examples/sitemap_spider.py:120-214)."""
    if row["status"] != 200:
        return
    text, _enc = decode_body(row["body"], row["content_type"])
    for k, m in enumerate(_LOC_RE.finditer(text)):
        loc = m.group(1)
        cb = "parse_sitemap" if loc.rstrip("/").endswith(".xml") else "parse"
        yield dict(out_kind="request", spans=None, child_url=loc, child_index=k, callback=cb)


def parse_noop(row: dict) -> Iterator[dict]:
    """SkipNonHTMLMiddleware's no-op swap (middlewares.py:325)."""
    return iter(())


CALLBACKS: dict[str, Callable[[dict], Iterator[dict]]] = {
    "parse": parse_default,
    "parse_sitemap": parse_sitemap,
    "noop": parse_noop,
}


def run_parse_stage(fetched: DataFrame) -> DataFrame:
    """fetched (frontier cols + fetch-result cols) → PARSE_OUT rows,
    one per document.

    One mapInArrow pass: child URLs are canonicalized/host-extracted
    inside the same vectorized batch and packed into a ``children``
    array (exploded JVM-side) — the Arrow boundary moves 1 row per
    document instead of 1 per link. Parent metadata rides along so
    downstream routing is pure projection. Callback errors land in the
    ``error`` column (worker-survives-error, engine.py:138-152).

    The output batch is built COLUMNAR: flat value lists + list
    offsets → pyarrow ``StructArray``/``ListArray`` directly. The
    pandas path (one python dict per span, converted object-by-object
    by pyarrow) spent comparable CPU serializing the output as parsing
    the page; flat-list construction is a C-speed bulk conversion.
    Span/children arrays of non-item rows are empty lists (the engine
    filters ``out_kind == 'item'`` / ``size(children) > 0``)."""

    from silkworm_spark.functions.urls import (
        _CANON_FAST, canonicalize_url, host_of,
    )

    _canon_match = _CANON_FAST.match
    have = set(fetched.columns)
    req_cols = [c for c in
                ("method", "headers", "params", "meta", "data", "timeout",
                 "resp_headers")
                if c in have]

    def gen(batches):
        import pyarrow as pa

        map_t = pa.map_(pa.string(), pa.string())
        span_t = pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]
        )
        child_t = pa.struct(
            [("url", pa.string()), ("host", pa.string()),
             ("idx", pa.int32()), ("cb", pa.string()),
             ("method", pa.string()), ("headers", map_t), ("params", map_t),
             ("meta", map_t), ("data", pa.binary()), ("timeout", pa.float64()),
             ("priority", pa.int32()), ("dont_filter", pa.bool_())]
        )

        def as_dict(v):  # pyarrow MapArray.to_pylist yields (k, v) tuples
            return dict(v) if isinstance(v, list) else v

        for b in batches:
            urls = b.column("url").to_pylist()
            finals = b.column("final_url").to_pylist()
            statuses = b.column("status").to_pylist()
            cts = b.column("content_type").to_pylist()
            bodies = b.column("body").to_pylist()
            cbs = b.column("callback").to_pylist()
            seqs = b.column("seq").to_pylist()
            depths = b.column("depth").to_pylist()
            # all-null request-surface columns (the common GET-no-extras
            # crawl) skip materialization entirely — null_count is O(1)
            extras = {
                c: (None if b.column(c).null_count == len(b.column(c))
                    else b.column(c).to_pylist())
                for c in req_cols
            }

            o_url, o_kind, o_doc, o_seq, o_depth, o_status, o_cb, o_err = \
                [], [], [], [], [], [], [], []
            s_off, s_kind, s_text, s_ref, s_idx = [0], [], [], [], []
            c_off = [0]
            c_cols: dict[str, list] = {f.name: [] for f in child_t}
            i_off, i_val = [0], []

            def rollback():
                del s_kind[s_off[-1]:], s_text[s_off[-1]:], \
                    s_ref[s_off[-1]:], s_idx[s_off[-1]:]
                for lst in c_cols.values():
                    del lst[c_off[-1]:]
                del i_val[i_off[-1]:]

            # hot-loop local bindings for the parse_default fast path
            cc_url, cc_host, cc_idx = c_cols["url"], c_cols["host"], c_cols["idx"]
            cc_rest = [c_cols[k] for k in
                       ("cb", "method", "headers", "params", "meta",
                        "data", "timeout", "priority", "dont_filter")]

            for i in range(len(urls)):
                cb = CALLBACKS.get(cbs[i] or "parse", parse_default)
                kind, doc_id, err = "none", None, None
                n_spans = n_children = n_items = 0
                if cb is parse_default:
                    # inlined columnar parse_default: no row dict, no
                    # generator protocol, no per-span dicts — the span
                    # columns are bulk-extended straight from the
                    # scanner's parallel lists (same semantics, pinned
                    # by test_parse_stage_fast_path_matches_generic)
                    try:
                        body, ct = bodies[i], cts[i]
                        if statuses[i] == 200 and is_html(body, ct):
                            text, _enc = decode_body(body, ct)
                            base = finals[i] or urls[i]
                            kinds, txts, refs = scan_span_cols(text, base)
                            kind = "item"
                            doc_id = canonicalize_url(base)
                            n_spans = len(kinds)
                            s_kind.extend(kinds)
                            s_text.extend(txts)
                            s_ref.extend(refs)
                            s_idx.extend(range(n_spans))
                            for j in range(n_spans):
                                if kinds[j] == "link":
                                    r = refs[j]
                                    if r:
                                        # one regex match yields BOTH
                                        # the canonical form and the
                                        # host for fast-path URLs
                                        # (canonicalize_url + host_of
                                        # would each re-match)
                                        cm = _canon_match(r)
                                        if cm:
                                            cu = r if cm.group(3) else r + "/"
                                            ch = cm.group(2)
                                        else:
                                            cu = canonicalize_url(r)
                                            ch = host_of(cu)
                                        cc_url.append(cu)
                                        cc_host.append(ch)
                                        cc_idx.append(n_children)
                                        n_children += 1
                            if n_children:
                                for lst in cc_rest:
                                    lst.extend([None] * n_children)
                    except Exception as exc:  # contain (engine.py:138-152)
                        rollback()
                        kind, doc_id, err = \
                            "error", None, f"{type(exc).__name__}: {exc}"
                        n_spans = n_children = n_items = 0
                else:
                    row = dict(
                        url=urls[i], final_url=finals[i], status=statuses[i],
                        content_type=cts[i], body=bodies[i], callback=cbs[i],
                        seq=seqs[i], depth=depths[i],
                    )
                    for c in req_cols:
                        vs = extras[c]
                        v = vs[i] if vs is not None else None
                        row[c] = as_dict(v) if c in (
                            "headers", "params", "meta", "resp_headers") else v
                    try:
                        for o in cb(row):
                            ok = o["out_kind"]
                            if ok == "item":
                                kind = "item"
                                doc_id = canonicalize_url(row["final_url"] or row["url"])
                                for s in o["spans"]:
                                    s_kind.append(s["kind"])
                                    s_text.append(s["text"])
                                    s_ref.append(s["media_ref"])
                                    s_idx.append(s["offset"])
                                    n_spans += 1
                            elif ok == "request" and o["child_url"]:
                                cu = canonicalize_url(o["child_url"])
                                c_cols["url"].append(cu)
                                c_cols["host"].append(host_of(cu))
                                c_cols["idx"].append(o["child_index"])
                                c_cols["cb"].append(o.get("callback"))  # NULL ⇒ inherit
                                c_cols["method"].append(o.get("method"))
                                c_cols["headers"].append(o.get("headers"))
                                c_cols["params"].append(o.get("params"))
                                c_cols["meta"].append(o.get("meta"))
                                c_cols["data"].append(o.get("data"))
                                c_cols["timeout"].append(o.get("timeout"))
                                c_cols["priority"].append(o.get("priority"))
                                c_cols["dont_filter"].append(o.get("dont_filter"))
                                n_children += 1
                            elif ok == "json_item":
                                i_val.append(o["item"])
                                n_items += 1
                    except Exception as exc:  # contain per row (engine.py:138-152)
                        rollback()
                        kind, doc_id, err = \
                            "error", None, f"{type(exc).__name__}: {exc}"
                        n_spans = n_children = n_items = 0
                if kind == "none" and n_children == 0 and n_items == 0:
                    rollback()
                    continue
                s_off.append(s_off[-1] + n_spans)
                c_off.append(c_off[-1] + n_children)
                i_off.append(i_off[-1] + n_items)
                o_url.append(urls[i]); o_kind.append(kind)
                o_doc.append(doc_id); o_seq.append(seqs[i])
                o_depth.append(depths[i]); o_status.append(statuses[i])
                o_cb.append(cbs[i]); o_err.append(err)

            spans_arr = pa.ListArray.from_arrays(
                pa.array(s_off, pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(s_kind, pa.string()), pa.array(s_text, pa.string()),
                     pa.array(s_ref, pa.string()), pa.array(s_idx, pa.int32())],
                    fields=list(span_t),
                ),
            )
            def col_arr(vals, typ):
                # links rarely override the request surface: an
                # all-None column becomes a null bitmap, no conversion
                if not any(v is not None for v in vals):
                    return pa.nulls(len(vals), typ)
                return pa.array(vals, typ)

            children_arr = pa.ListArray.from_arrays(
                pa.array(c_off, pa.int32()),
                pa.StructArray.from_arrays(
                    [col_arr(c_cols[f.name], f.type) for f in child_t],
                    fields=list(child_t),
                ),
            )
            items_arr = pa.ListArray.from_arrays(
                pa.array(i_off, pa.int32()), pa.array(i_val, pa.string())
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_url, pa.string()), pa.array(o_kind, pa.string()),
                 spans_arr, pa.array(o_doc, pa.string()), children_arr,
                 items_arr,
                 pa.array(o_seq, pa.int64()), pa.array(o_depth, pa.int32()),
                 pa.array(o_status, pa.int32()), pa.array(o_cb, pa.string()),
                 pa.array(o_err, pa.string())],
                names=[f.name for f in PARSE_OUT_SCHEMA.fields],
            )

    return fetched.mapInArrow(gen, schema=PARSE_OUT_SCHEMA)
