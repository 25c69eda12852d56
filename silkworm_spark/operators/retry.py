"""Retry split: failed responses back into the next-round frontier.

Mirrors RetryMiddleware (reference middlewares.py:99-153):
- retryable statuses {500, 502, 503, 504, 522, 524, 408, 429};
- give up once ``retry_times`` reaches ``max_times`` (default 3);
- the retry request carries ``dont_filter=True`` (bypasses the seen
  filter — middlewares.py:137-139) and ``retry_times + 1``;
- exponential backoff ``base * 2^(n-1)`` seconds becomes a
  ``not_before`` column on the virtual clock instead of an await —
  the row simply isn't eligible until then (nothing sleeps).

Network errors (NULL status) are *not* retried, matching the
reference, where the middleware only sees Responses and fetch
exceptions are counted and dropped (engine.py:131-137).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from silkworm_spark.schemas import FRONTIER_COLS as _FRONTIER_COLS

RETRY_HTTP_CODES = [500, 502, 503, 504, 522, 524, 408, 429]


def split_retries(
    fetched: DataFrame,
    vtime: float,
    max_times: int = 3,
    backoff_base: float = 0.5,
    retry_codes: list[int] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """fetched → (ok, retry_candidates, gave_up).

    ``retry_candidates`` rows are frontier-shaped (minus final ``seq``,
    assigned with the round's other enqueues): ``parent_seq`` = the
    failed request's dequeue position, ``child_index`` = 0, so a retry
    occupies exactly the FIFO slot the reference's tail re-enqueue
    gives it (engine.py:173-178).
    """
    codes = retry_codes or RETRY_HTTP_CODES
    is_retryable = F.col("status").isin(codes)
    retryable = fetched.filter(is_retryable & (F.col("retry_times") < max_times))
    gave_up = fetched.filter(is_retryable & (F.col("retry_times") >= max_times))
    ok = fetched.filter(~F.coalesce(is_retryable, F.lit(False)))

    new_times = F.col("retry_times") + 1
    delay = F.lit(backoff_base) * F.pow(F.lit(2.0), (new_times - 1).cast("double"))
    retry_rows = retryable.select(
        "url", "url_hash", "host", "depth",
        F.col("seq").alias("parent_seq"),
        F.lit(0).alias("child_index"),
        F.lit(-1).cast("long").alias("seq"),  # assigned later
        "callback", "priority",
        F.lit(True).alias("dont_filter"),
        new_times.cast("int").alias("retry_times"),
        (F.lit(float(vtime)) + delay).alias("not_before"),
        "round_added",
        # the retry re-enqueues the SAME Request (middlewares.py:137:
        # request.replace(dont_filter=True)) — full surface preserved
        "method", "headers", "params", "meta", "data", "timeout",
    ).select(*_FRONTIER_COLS)
    return ok, retry_rows, gave_up
