"""silkworm_spark — a PySpark-native distributed crawl engine.

A brand-new rebuild of the capabilities of BitingSnakes/silkworm
(an async single-process Spider/Request/Response crawl framework,
reference at /root/reference) as a distributed URL-frontier + fetch
scheduler on Spark DataFrames:

- the in-memory ``asyncio.Queue`` frontier (reference engine.py:52-59)
  becomes a checkpointed ``frontier`` table dequeued in per-round,
  per-host-budgeted batches;
- the in-memory URL-seen set (reference engine.py:99-106) becomes a
  bloom-prefiltered anti-join against a partitioned ``seen`` table;
- middlewares (reference middlewares.py) become column expressions;
- spider callbacks become a vectorized pandas-UDF parse registry
  emitting interleaved (kind, text, media_ref, offset) span arrays;
- the ``while queue not empty`` event loop (reference engine.py:339-368)
  becomes an iterative DataFrame job with atomic per-round checkpoints.

Everything here derives from public knowledge only: the PySpark API and
the observable behavior of the reference repo.
"""

__version__ = "0.1.0"

from silkworm_spark.session import get_spark  # noqa: F401
