"""Declared StructType schemas for every engine table.

The reference is schema-dynamic (free-form JSON items, dataclass
Request/Response — reference request.py:13-31, response.py:99-118,
_types.py:5-6); the rebuild inverts that: fixed schemas, because Arrow
UDF signatures and checkpointed tables require them (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# One span of an interleaved text+media document (BASELINE.json input_hint).
SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # 'text' | 'image' | 'video' | 'link'
        T.StructField("text", T.StringType()),  # NULL for pure-media spans
        T.StructField("media_ref", T.StringType()),  # NULL for pure-text spans
        T.StructField("offset", T.IntegerType()),  # dense 0..n-1 per doc
    ]
)

# The north-rule corpus table: output of the crawl, input of the oracle.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # canonical URL
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("status", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("seq", T.LongType()),  # dequeue order of the fetch
        T.StructField("round", T.IntegerType()),
    ]
)

# One row of the frontier = one reference Request (reference request.py:13-31).
# callback (a function pointer in the reference) is a *name column* dispatched
# through the parse registry; the FIFO dequeue position is the data column
# `seq` (execution order is never an execution property here — SURVEY.md §3.4).
# The tail fields mirror the rest of the reference Request surface
# (request.py:14-25): method/headers/params/meta/data/timeout. They are
# nullable (NULL method ⇒ GET) so the common GET-no-extras row costs
# nothing in parquet; `params` merge into the URL at FETCH time, never
# at enqueue — the URL-seen key is the raw request URL, exactly like
# the reference (engine.py:99-106 keys req.url; http.py:396-406 merges
# in _build_url).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("parent_seq", T.LongType(), False),  # -1 for seeds
        T.StructField("child_index", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # global FIFO enqueue order
        T.StructField("callback", T.StringType(), False),  # parse registry key
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("dont_filter", T.BooleanType(), False),
        T.StructField("retry_times", T.IntegerType(), False),
        T.StructField("not_before", T.DoubleType(), False),  # virtual seconds
        T.StructField("round_added", T.IntegerType(), False),
        T.StructField("method", T.StringType()),  # NULL ⇒ GET
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("params", T.MapType(T.StringType(), T.StringType())),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.BinaryType()),  # request body (POST/PUT)
        T.StructField("timeout", T.DoubleType()),  # per-request override
    ]
)

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]

# request-surface fields riding along with defaults when absent
REQUEST_EXTRA_COLS = ["method", "headers", "params", "meta", "data", "timeout"]

# Authoritative URL-seen set (reference engine.py:60,99-106: exact,
# keyed on URL string only; insert at ENQUEUE time).
SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("round_added", T.IntegerType(), False),
    ]
)

# Per-round fetch results (reference Response, response.py:99-118, plus
# fetch-loop outputs final_url/redirect_times/error from http.py:67-203).
FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("final_url", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("redirect_times", T.IntegerType()),
        T.StructField("error", T.StringType()),
        # normalized (lowercase-key) response headers, reference
        # http.py:323-364; NULL in offline mode (the fixture carries
        # only content_type)
        T.StructField("resp_headers", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Synthetic offline web fixture (FIXTURES.md §2) — the deterministic
# stand-in for live HTTP in tests and benchmarks.
WEB_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("content_type", T.StringType()),
        T.StructField("redirect_to", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("out_links", T.ArrayType(T.StringType())),
        T.StructField("spans_expected", T.ArrayType(SPAN_TYPE)),
        T.StructField("attempts_until_ok", T.IntegerType(), False),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

# Per-host politeness & budget rules (north-rule addition; no reference
# equivalent — closest is the global DelayMiddleware, middlewares.py:164-263).
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_ms", T.LongType()),
        T.StructField("fetch_budget", T.IntegerType()),
    ]
)

# Mirrors the reference stats dict (engine.py:72-77,304-316) with
# per-partition lineage required by the north rule.
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("requests_sent", T.LongType(), False),
        T.StructField("responses_received", T.LongType(), False),
        T.StructField("items_scraped", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("retries", T.LongType(), False),
        T.StructField("robots_denied", T.LongType(), False),
        # retry-exhausted responses (delivered to the callback per
        # reference middlewares.py:134-135, and counted here so they
        # never vanish silently) and bodies dropped by the parse size
        # cap (observable loss, reference response.py:314-328)
        T.StructField("gave_up", T.LongType(), False),
        T.StructField("dropped_oversize", T.LongType(), False),
        T.StructField("elapsed_ms", T.DoubleType(), False),
    ]
)

# Per-host crawl state: robots fetch-budget consumed + politeness clock.
HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("next_free", T.DoubleType(), False),  # virtual seconds
    ]
)

# Parse output: ONE row per fetched document (not per yielded value).
# Child requests are packed into an array and exploded JVM-side — the
# Arrow boundary carries 1 row/doc instead of 1 row/link (~40× fewer
# rows through Python). Parent metadata (seq/depth/status/callback)
# rides along so item/request routing downstream is pure projection —
# no join back against the fetch results.
CHILD_TYPE = T.StructType(
    [
        T.StructField("url", T.StringType()),  # canonical
        T.StructField("host", T.StringType()),
        T.StructField("idx", T.IntegerType()),  # yield order within parent
        T.StructField("cb", T.StringType()),  # explicit callback; NULL = inherit
        # response.follow(**kwargs) overrides (reference
        # response.py:271-284 forwards them into the child Request);
        # NULLs mean "default", NOT "inherit" — a reference Request's
        # method/headers/... never inherit from the parent response
        T.StructField("method", T.StringType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("params", T.MapType(T.StringType(), T.StringType())),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.BinaryType()),
        T.StructField("timeout", T.DoubleType()),
        T.StructField("priority", T.IntegerType()),  # NULL ⇒ 0
        T.StructField("dont_filter", T.BooleanType()),  # NULL ⇒ false
    ]
)

PARSE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("out_kind", T.StringType(), False),  # 'item' | 'none' | 'error'
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("doc_id", T.StringType()),  # canonical final_url (items)
        T.StructField("children", T.ArrayType(CHILD_TYPE)),
        # free-form JSON items yielded by spider callbacks (reference
        # engine.py:200-268 routes non-Request yields to the item
        # pipelines; arbitrary dicts can't be a fixed Spark type, so
        # they travel JSON-encoded, one string per yielded item)
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("seq", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("callback", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

# Sink table for free-form JSON items (reference item pipelines input,
# pipelines.py:388+ — every connector consumes exactly this stream).
ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # fetch order of the parent
        T.StructField("url", T.StringType(), False),  # source page
        T.StructField("item_index", T.IntegerType(), False),  # yield order
        T.StructField("item", T.StringType(), False),  # JSON-encoded
    ]
)
