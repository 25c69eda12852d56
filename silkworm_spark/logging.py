"""Logging configuration surface (reference ``logging.py``, 111 LoC).

The reference wraps the ``logly`` logger: one lazily-configured shared
logger, ``SILKWORM_LOG_LEVEL`` env override with level aliases
(WARN→WARNING, ERR→ERROR, FATAL→FAIL) and logly's extended level set
(TRACE/SUCCESS/FAIL), ``get_logger(**context)`` returning a
context-bound logger, and ``complete_logs()`` flushing buffers
(logging.py:34-111).

Rebuilt on stdlib ``logging`` — no logly here, and a Spark engine
should feed the driver's log config anyway: driver-side messages go
through a standard handler (so `spark-submit` log4j redirection and
container log collection see them), per-crawl METRICS stay in the
checkpoint's metrics table (the queryable replacement for the
reference's stats logger), and executor-side code should not log at
all (Python-worker stderr is per-task noise; emit columns instead).

Level mapping: the extra logly levels become stdlib custom levels
(TRACE=5, SUCCESS=25, FAIL=55) registered once at import.
"""

from __future__ import annotations

import logging
import os
import sys

# logly's level set (reference logging.py:34-48), mapped onto stdlib
# numeric levels; aliases normalized exactly like the reference
_LEVELS: dict[str, int] = {
    "TRACE": 5,
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "SUCCESS": 25,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
    "CRITICAL": logging.CRITICAL,
    "FAIL": 55,
}
_ALIASES = {"WARN": "WARNING", "ERR": "ERROR", "FATAL": "FAIL"}

for _name, _num in _LEVELS.items():
    if logging.getLevelName(_num) != _name:
        logging.addLevelName(_num, _name)

_configured = False
_handler: logging.Handler | None = None


def _normalized_level(raw_level: str) -> str:
    """WARN→WARNING etc.; unknown levels fall back to INFO
    (reference logging.py:52-60)."""
    level = raw_level.upper()
    level = _ALIASES.get(level, level)
    return level if level in _LEVELS else "INFO"


class _ContextAdapter(logging.LoggerAdapter):
    """``bind(**context)`` semantics: bound fields render as trailing
    ``key=value`` pairs, call-site ``**context`` kwargs merge on top
    (reference logging.py:97-103 / logly bind)."""

    def bind(self, **context: object) -> "_ContextAdapter":
        merged = {**self.extra, **context}
        return _ContextAdapter(self.logger, merged)

    def process(self, msg, kwargs):
        ctx = {**self.extra, **kwargs.pop("context", {})}
        # logly-style: arbitrary keyword fields on the log call
        for k in list(kwargs):
            if k not in ("exc_info", "stack_info", "stacklevel"):
                ctx[k] = kwargs.pop(k)
        if ctx:
            msg = f"{msg} " + " ".join(f"{k}={v}" for k, v in ctx.items())
        return msg, kwargs

    # logly's extra levels as methods
    def trace(self, msg, **kw):
        self.log(_LEVELS["TRACE"], msg, **kw)

    def success(self, msg, **kw):
        self.log(_LEVELS["SUCCESS"], msg, **kw)

    def fail(self, msg, **kw):
        self.log(_LEVELS["FAIL"], msg, **kw)

    def complete(self) -> None:
        complete_logs()


def _configure_if_needed() -> logging.Logger:
    """One-time setup from ``SILKWORM_LOG_LEVEL`` (reference
    logging.py:74-94): stderr handler, time + module shown."""
    global _configured, _handler
    base = logging.getLogger("silkworm_spark")
    if _configured:
        return base
    level = _normalized_level(os.getenv("SILKWORM_LOG_LEVEL", "INFO"))
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    base.addHandler(_handler)
    base.setLevel(_LEVELS[level])
    base.propagate = False
    _configured = True
    return base


def get_logger(**context: object) -> _ContextAdapter:
    """Shared configured logger, optionally with bound context fields
    (reference logging.py:97-103)."""
    return _ContextAdapter(_configure_if_needed(), dict(context))


def complete_logs() -> None:
    """Flush buffered handlers if configured (reference
    logging.py:106-111)."""
    if _configured and _handler is not None:
        _handler.flush()
