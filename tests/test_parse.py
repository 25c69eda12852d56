"""Span extraction: generated HTML must round-trip to the generator's
ground-truth spans (FIXTURES.md §2 spans_expected oracle)."""

from silkworm_spark.functions.text import decode_body
from silkworm_spark.operators.parse import extract_spans, parse_default


def _strip(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_extract_spans_roundtrip_small_web(small_web):
    checked = 0
    for page in small_web["web"]:
        if page["status"] != 200 or not page["spans_expected"]:
            continue
        if not (page["content_type"] or "").startswith("text/html"):
            continue
        text, _ = decode_body(page["body"], page["content_type"])
        got = extract_spans(text, page["url"])
        assert _strip(got) == _strip(page["spans_expected"]), page["url"]
        checked += 1
    assert checked > 50


def test_extract_spans_relative_links_resolved():
    html = '<html><body><a href="/x">go</a><img src="img.png"></body></html>'
    spans = extract_spans(html, "http://h.com/dir/page")
    assert spans[0] == dict(kind="link", text="go", media_ref="http://h.com/x", offset=0)
    assert spans[1] == dict(kind="image", text=None, media_ref="http://h.com/dir/img.png", offset=1)


def test_extract_spans_skips_head_script():
    html = "<html><head><title>T</title><script>var x=1;</script></head><body><p>body text</p></body></html>"
    spans = extract_spans(html, "http://h.com/")
    assert _strip(spans) == [("text", "body text", None, 0)]


def test_fast_scanner_matches_htmlparser_reference(small_web):
    """The regex scanner (hot path) must agree with the html.parser
    reference extractor on every fixture page AND on adversarial
    snippets (comments, CDATA-ish script bodies, charrefs, quoting)."""
    from silkworm_spark.operators.parse import extract_spans_ref

    for page in small_web["web"]:
        if not (page["content_type"] or "").startswith("text/html"):
            continue
        text, _ = decode_body(page["body"], page["content_type"])
        assert _strip(extract_spans(text, page["url"])) == _strip(
            extract_spans_ref(text, page["url"])
        ), page["url"]

    tricky = [
        '<p>a<!-- <p>ghost</p> -->b</p>',
        "<script>var s = '<p>not a para</p><a href=\"/no\">x</a>';</script><p>real</p>",
        '<style>p:before { content: "</a>"; }</style><a href="/y">y</a>',
        '<p>x &amp; y &#8212; z</p>',
        '<a href="/q?a=1&amp;b=2">amp</a>',
        "<a href='/single'>s</a><a href=unquoted>u</a><a href>none</a>",
        '<P>UPPER</P><A HREF="/up">U</A>',
        '<img src="i.png" alt="a>b"><video src="v.mp4"></video>',
        '<p>open only',
        '<a href="/x">outer<a href="/y">inner</a>',
        '<p></p><p>  </p><p>kept</p>',
        '<!doctype html><?xml version="1.0"?><p>after decls</p>',
        'text outside any mode<p>in</p>trailing',
        '<img src>valueless<img src="ok.png">',
        '<p>a<br/>b</p><p/>selfclosed p',
    ]
    for html in tricky:
        got = _strip(extract_spans(html, "http://h.com/base/"))
        want = _strip(extract_spans_ref(html, "http://h.com/base/"))
        assert got == want, html


def test_parse_default_emits_item_then_requests():
    body = b'<html><body><p>t</p><a href="/a">A</a><a href="/b">B</a></body></html>'
    row = dict(url="http://h.com/p", final_url="http://h.com/p", status=200,
               content_type="text/html", body=body, callback="parse")
    out = list(parse_default(row))
    assert out[0]["out_kind"] == "item"
    assert [o["child_url"] for o in out[1:]] == ["http://h.com/a", "http://h.com/b"]
    assert [o["child_index"] for o in out[1:]] == [0, 1]


def test_parse_default_skips_non_html_and_errors():
    row = dict(url="u", final_url="u", status=200, content_type="application/json",
               body=b'{"a":1}', callback="parse")
    assert list(parse_default(row)) == []
    row404 = dict(url="u", final_url="u", status=404, content_type="text/html",
                  body=b"<html></html>", callback="parse")
    assert list(parse_default(row404)) == []


def test_parse_sitemap():
    from silkworm_spark.operators.parse import parse_sitemap

    xml = b"<urlset><url><loc>http://a.com/1</loc></url><url><loc>http://a.com/2</loc></url></urlset>"
    row = dict(url="http://a.com/sitemap.xml", final_url=None, status=200,
               content_type="application/xml", body=xml, callback="parse_sitemap")
    out = list(parse_sitemap(row))
    assert [o["child_url"] for o in out] == ["http://a.com/1", "http://a.com/2"]


def test_parse_stage_fast_path_matches_generic(small_web):
    """run_parse_stage inlines parse_default columnar when the callback
    resolves to it (no row dicts, no generator protocol). The inlined
    path must be batch-for-batch identical to the generic dispatch
    machinery running the same callback under an alias name."""
    import pyarrow as pa

    from silkworm_spark.operators import parse as P

    pages = [p for p in small_web["web"]][:300]
    # adversarial extras: decode error containment + entity/nesting shapes
    pages.append(dict(url="http://h.com/bad", host="h.com", status=200,
                      content_type="text/html", redirect_to=None,
                      body=b"<p>a<b>nested</b></p><a href='/x'>l<i>i</i></a>"))
    pages.append(dict(url="http://h.com/amp", host="h.com", status=200,
                      content_type="text/html",  redirect_to=None,
                      body=b'<p>x &amp; y</p><a href="/q?a=1&amp;b=2">z</a>'))

    def batch(cb):
        n = len(pages)
        return pa.RecordBatch.from_pydict(dict(
            url=[p["url"] for p in pages],
            final_url=[p["url"] for p in pages],
            status=pa.array([p["status"] for p in pages], pa.int32()),
            content_type=[p["content_type"] for p in pages],
            body=pa.array([p["body"] for p in pages], pa.binary()),
            callback=pa.array([cb] * n, pa.string()),
            seq=pa.array(list(range(n)), pa.int64()),
            depth=pa.array([1] * n, pa.int32()),
        ))

    class FakeDF:
        columns = ["url", "final_url", "status", "content_type", "body",
                   "callback", "seq", "depth"]

        def mapInArrow(self, fn, schema):
            return fn

    gen = P.run_parse_stage(FakeDF())
    # alias name forces the generic dict/generator dispatch of the SAME fn
    P.CALLBACKS["parse_generic_alias"] = P.parse_default
    try:
        fast = pa.Table.from_batches(list(gen([batch(None)])))
        slow = pa.Table.from_batches(list(gen([batch("parse_generic_alias")])))
    finally:
        del P.CALLBACKS["parse_generic_alias"]
    # callback column differs by construction; everything else must not
    assert fast.drop_columns(["callback"]).equals(slow.drop_columns(["callback"]))
    assert fast.num_rows > 100
