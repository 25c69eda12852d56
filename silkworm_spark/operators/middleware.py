"""Request/response middlewares as column expressions.

The reference runs middleware objects per request/response
(middlewares.py:18-27); every built-in one is a pure per-row transform,
so here each becomes a deterministic column expression (whole-stage
codegen, zero Python) applied to the dequeued batch before the fetch.
Reference's random choices become hash-derived picks — same
distribution, reproducible (a requirement the reference can't meet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from silkworm_spark.functions.text import is_html_col

DEFAULT_UA = "silkworm/0.1"  # reference middlewares.py:30-49 fallback


def user_agent_col(user_agents: list[str] | None, url_col: str = "url", seq_col: str = "seq") -> Column:
    """UserAgentMiddleware (middlewares.py:30-49): pick a UA per
    request — hash-derived instead of random.choice."""
    if not user_agents:
        return F.lit(DEFAULT_UA)
    arr = F.array(*[F.lit(u) for u in user_agents])
    idx = F.pmod(F.xxhash64(F.col(url_col), F.col(seq_col)), F.lit(len(user_agents))) + 1
    return F.element_at(arr, idx.cast("int"))


def proxy_col(proxies: list[str] | None, seq_col: str = "seq", strategy: str = "round_robin") -> Column:
    """ProxyMiddleware (middlewares.py:52-96): round-robin by enqueue
    seq (the distributed analog of the `_idx` counter) or hash-pick."""
    if not proxies:
        return F.lit(None).cast("string")
    arr = F.array(*[F.lit(p) for p in proxies])
    if strategy == "round_robin":
        idx = F.pmod(F.col(seq_col), F.lit(len(proxies))) + 1
    else:  # deterministic 'random'
        idx = F.pmod(F.xxhash64(F.col(seq_col)), F.lit(len(proxies))) + 1
    return F.element_at(arr, idx.cast("int"))


def skip_non_html(fetched: DataFrame, allow_non_html_col: str | None = None) -> DataFrame:
    """SkipNonHTMLMiddleware (middlewares.py:266-326): swap the callback
    to 'noop' for non-HTML responses (content-type token or body sniff,
    same cascade as http.py:177-195), unless allow_non_html."""
    cond = ~is_html_col("body", "content_type")
    if allow_non_html_col is not None:
        cond = cond & ~F.coalesce(F.col(allow_non_html_col), F.lit(False))
    return fetched.withColumn(
        "callback", F.when(cond, F.lit("noop")).otherwise(F.col("callback"))
    )


def request_delay_col(
    delay: float = 0.0,
    delay_range: tuple[float, float] | None = None,
    url_col: str = "url",
) -> Column:
    """DelayMiddleware (middlewares.py:164-263): per-request pacing in
    addition to per-host politeness. The reference sleeps before each
    send; the distributed analog adds the delay to the request's
    ``not_before`` clock, so the scheduler simply won't dequeue it
    earlier. ``delay_range`` is the random strategy, hash-derived so
    identical crawls pace identically (random.uniform can't replay)."""
    if delay_range is not None:
        lo, hi = delay_range
        frac = F.pmod(F.xxhash64(F.col(url_col)), F.lit(10_000)) / 10_000.0
        return F.lit(float(lo)) + frac * F.lit(float(hi - lo))
    return F.lit(float(delay))


def backoff_col(retry_times_col: str = "retry_times", base: float = 0.5) -> Column:
    """RetryMiddleware backoff base·2^(n-1) (middlewares.py:141)."""
    return F.lit(base) * F.pow(F.lit(2.0), (F.col(retry_times_col) - 1).cast("double"))


def apply_request_middlewares(
    batch: DataFrame,
    user_agents: list[str] | None = None,
    proxies: list[str] | None = None,
) -> DataFrame:
    """Compose the request-side middlewares in reference order
    (engine.py:94-97): UA then proxy, as added columns consumed by the
    live fetch UDF."""
    return batch.withColumn("ua", user_agent_col(user_agents)).withColumn(
        "proxy", proxy_col(proxies)
    )
