"""Property-based tests (hypothesis) for the pure scalar hot paths —
the functions every engine row passes through must hold their
invariants on arbitrary inputs, not just the fixtures.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings

# derandomized: the exploratory value of random search was banked while
# writing these (two falsifying examples tightened the specs); in the
# correctness gate the suite must be deterministic run to run
settings.register_profile("silkworm", settings(derandomize=True))
settings.load_profile("silkworm")
from hypothesis import strategies as st

from silkworm_spark.functions import media as M
from silkworm_spark.functions.urls import canonicalize_url, host_of, merge_params

_hostname = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9\-]{0,20}(\.[a-zA-Z]{2,6}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[a-zA-Z0-9._~\-]{0,12}){0,4}", fullmatch=True)
_query = st.from_regex(r"([a-z]{1,5}=[a-zA-Z0-9]{0,8}(&[a-z]{1,5}=[a-zA-Z0-9]{0,8}){0,3})?", fullmatch=True)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_hostname)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    q = draw(_query)
    frag = draw(st.sampled_from(["", "#x", "#sec-2"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else "") + frag


@given(_urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_and_normalized(url):
    c = canonicalize_url(url)
    # idempotent — the seen-set key must be stable under re-canonicalization
    assert canonicalize_url(c) == c
    # no fragment survives; scheme+host lowercased; path never empty
    assert "#" not in c
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    netloc = rest.split("/", 1)[0]
    assert netloc.split(":")[0] == netloc.split(":")[0].lower()
    assert "/" in rest or not rest  # path present
    # default ports dropped, explicit non-defaults kept
    if ":80" in url and scheme == "http":
        assert not netloc.endswith(":80")
    # host extraction agrees with the canonical form (politeness keys
    # per HOSTNAME — an explicit port does not split the budget)
    assert host_of(c) == netloc.split(":")[0]


@given(_urls(), st.dictionaries(st.from_regex(r"[a-z]{1,6}", fullmatch=True),
                                st.from_regex(r"[a-zA-Z0-9]{0,8}", fullmatch=True),
                                max_size=3))
@settings(max_examples=200, deadline=None)
def test_merge_params_preserves_existing_and_appends(url, params):
    url = canonicalize_url(url)
    merged = merge_params(url, params)
    if not params:
        assert merged == url
        return
    from urllib.parse import parse_qs, urlsplit

    got = parse_qs(urlsplit(merged).query, keep_blank_values=True)
    for k, v in params.items():
        assert v in got.get(k, []) or got.get(k) == [v]
    # reference merge semantics (http.py:396-406): existing query keys
    # collapse via dict(parse_qsl(...)) — LAST value per key wins —
    # then params override colliding keys
    from urllib.parse import parse_qsl

    collapsed = dict(parse_qsl(urlsplit(url).query, keep_blank_values=True))
    for k, v in collapsed.items():
        if k in params:
            continue
        assert got.get(k) == [v], (k, v, got.get(k))


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2 ** 32 - 1),
)
@settings(max_examples=80, deadline=None)
def test_png_roundtrip_random(h, w, channels, seed):
    rng = np.random.RandomState(seed % (2 ** 31))
    px = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
    assert np.array_equal(M.png_decode(M.png_encode(px)), px)


@given(st.binary(min_size=0, max_size=600))
@settings(max_examples=150, deadline=None)
def test_gif_lzw_roundtrip_random(data):
    """Every byte string must survive our minimal LZW through an
    independent from-spec decoder (table-growing, width-increasing)."""
    stream = M._lzw_9bit(data)
    acc = nbits = pos = 0
    width, table, out, prev, nxt = 9, None, bytearray(), None, 258
    while True:
        while nbits < width:
            acc |= stream[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == 256:
            table = {i: bytes([i]) for i in range(256)}
            nxt, width, prev = 258, 9, None
            continue
        if code == 257:
            break
        entry = table[code] if code in table else table[prev] + table[prev][:1]
        out += entry
        if prev is not None:
            table[nxt] = table[prev] + entry[:1]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = code
    assert bytes(out) == data


@given(st.integers(min_value=0, max_value=500), st.integers(min_value=0, max_value=32))
@settings(max_examples=200, deadline=None)
def test_sample_frames_invariants(n, k):
    s = M.sample_frames(n, k)
    assert len(s) == min(k, n) if (n > 0 and k > 0) else s == []
    assert all(0 <= i < n for i in s)
    assert s == sorted(set(s))  # strictly increasing, no dup frames
