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
