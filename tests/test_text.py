"""Charset cascade + HTML detection (reference response.py:120-269,
http.py:177-195; golden cases mirror tests/test_response_encoding.py)."""

import codecs

from silkworm_spark.functions.text import decode_body, detect_encoding, is_html


def test_bom_wins():
    body = codecs.BOM_UTF16_LE + "hi".encode("utf-16-le")
    assert detect_encoding(body, "text/html; charset=ascii") == "utf-16-le"


def test_header_charset():
    body = "привет".encode("windows-1251")
    assert detect_encoding(body, "text/html; charset=windows-1251") == "windows-1251"
    text, enc = decode_body(body, "text/html; charset=windows-1251")
    assert text == "привет" and enc == "windows-1251"


def test_meta_charset():
    body = '<html><head><meta charset="iso-8859-1"></head><body>caf\xe9</body></html>'.encode("iso-8859-1")
    assert detect_encoding(body, "text/html") == "iso-8859-1"
    text, _ = decode_body(body, "text/html")
    assert "café" in text


def test_xml_decl_charset():
    body = '<?xml version="1.0" encoding="ISO-8859-1"?><r>x</r>'.encode("iso-8859-1")
    assert detect_encoding(body, None) == "iso-8859-1"


def test_fallback_utf8_then_1252():
    assert detect_encoding("héllo".encode("utf-8"), None) == "utf-8"
    assert detect_encoding(b"h\xe9llo", None) == "windows-1252"


def test_invalid_header_charset_falls_through():
    assert detect_encoding(b"hello", "text/html; charset=bogus-enc") == "utf-8"


def test_is_html_content_type():
    assert is_html(b"x", "text/html")
    assert is_html(b"x", "application/xhtml+xml")
    assert not is_html(b'{"a":1}', "application/json")


def test_is_html_sniff():
    # reference http.py:177-195: sniff first 2048 bytes
    assert is_html(b"  <!DOCTYPE html><html>", "application/octet-stream")
    assert is_html(b"<HTML><body>", None)
    assert is_html(b"plain text", "text/plain")  # text/* without NUL
    assert not is_html(b"\x00binary", "text/plain")  # NUL byte
    assert not is_html(b"\x89PNG\r\n", "image/png")


def test_is_html_col_matches_python(spark):
    from pyspark.sql import functions as F

    from silkworm_spark.functions.text import is_html_col

    rows = [
        (b"<html><body>x</body></html>", "text/html"),
        (b'{"a":1}', "application/json"),
        (b"<!doctype html>", None),
        (b"plain", "text/plain"),
        (b"\x00bin", "text/plain"),
        (b"\x89PNG", "image/png"),
    ]
    df = spark.createDataFrame(rows, "body binary, content_type string")
    got = [r["h"] for r in df.select(is_html_col("body", "content_type").alias("h")).collect()]
    want = [is_html(b, ct) for b, ct in rows]
    assert got == want
