"""URL function unit tests (reference parity: http.py:396-406,
response.py:132-133, tests/test_silkworm_core.py:60-99,154-164)."""

from silkworm_spark.functions.urls import (
    canonicalize_url,
    host_of,
    merge_params,
    url_join,
)


def test_canonicalize_lowercases_scheme_host():
    assert canonicalize_url("HTTP://Example.COM/Path") == "http://example.com/Path"


def test_canonicalize_strips_default_port_and_fragment():
    assert canonicalize_url("http://a.com:80/x#frag") == "http://a.com/x"
    assert canonicalize_url("https://a.com:443/x") == "https://a.com/x"
    assert canonicalize_url("http://a.com:8080/x") == "http://a.com:8080/x"


def test_canonicalize_empty_path():
    assert canonicalize_url("http://a.com") == "http://a.com/"


def test_canonicalize_preserves_query():
    assert canonicalize_url("http://a.com/p?b=2&a=1") == "http://a.com/p?b=2&a=1"


def test_url_join_relative():
    # reference response.py:132-133 urljoin semantics
    assert url_join("http://a.com/dir/page", "other") == "http://a.com/dir/other"
    assert url_join("http://a.com/dir/page", "/root") == "http://a.com/root"
    assert url_join("http://a.com/x", "http://b.com/y") == "http://b.com/y"
    assert url_join("http://a.com/x", None) is None


def test_merge_params_overrides_existing():
    # reference http.py:396-406: existing keys overridden
    out = merge_params("http://a.com/p?x=1&y=2", {"y": "9", "z": "3"})
    assert "x=1" in out and "y=9" in out and "z=3" in out and "y=2" not in out


def test_merge_params_noop():
    assert merge_params("http://a.com/p?x=1", None) == "http://a.com/p?x=1"


def test_host_of():
    assert host_of("http://Sub.Example.com:8080/p") == "sub.example.com"
