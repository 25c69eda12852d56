"""Logging configuration surface (reference logging.py, rebuilt on
stdlib logging)."""

from __future__ import annotations

import logging

from silkworm_spark.logging import (
    _LEVELS,
    _normalized_level,
    complete_logs,
    get_logger,
)


def test_level_normalization_and_aliases():
    assert _normalized_level("warn") == "WARNING"
    assert _normalized_level("ERR") == "ERROR"
    assert _normalized_level("fatal") == "FAIL"
    assert _normalized_level("success") == "SUCCESS"
    assert _normalized_level("bogus") == "INFO"   # unknown -> INFO
    assert _LEVELS["TRACE"] < logging.DEBUG < _LEVELS["SUCCESS"] < _LEVELS["FAIL"]


def test_bound_context_and_kw_fields(caplog):
    log = get_logger(spider="quotes", run=7)
    base = logging.getLogger("silkworm_spark")
    base.addHandler(caplog.handler)  # propagate=False: attach directly
    try:
        with caplog.at_level(logging.INFO, logger="silkworm_spark"):
            log.info("crawl started", pages=42)
            log.bind(host="example.com").warning("slow host")
    finally:
        base.removeHandler(caplog.handler)
    msgs = [r.getMessage() for r in caplog.records]
    assert msgs[0] == "crawl started spider=quotes run=7 pages=42"
    assert msgs[1] == "slow host spider=quotes run=7 host=example.com"
    assert caplog.records[1].levelname == "WARNING"


def test_extra_levels_and_complete(caplog):
    log = get_logger()
    base = logging.getLogger("silkworm_spark")
    base.addHandler(caplog.handler)
    try:
        with caplog.at_level(_LEVELS["TRACE"], logger="silkworm_spark"):
            log.success("done", items=3)
            log.fail("gave up")
    finally:
        base.removeHandler(caplog.handler)
    assert caplog.records[0].levelname == "SUCCESS"
    assert caplog.records[1].levelname == "FAIL"
    complete_logs()  # flush is a no-op that must not raise
    log.complete()
