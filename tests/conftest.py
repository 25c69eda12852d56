from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from silkworm_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="silkworm-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_web():
    """Deterministic fixture web shared across tests (seed=42)."""
    from silkworm_spark.sources.webgen import build_robots, build_seeds, gen_web_rows

    n_pages, n_hosts = 220, 12
    return dict(
        n_pages=n_pages,
        n_hosts=n_hosts,
        web=gen_web_rows(n_pages, n_hosts, seed=42),
        seeds=build_seeds(5, n_pages, n_hosts, seed=42),
        robots=build_robots(n_hosts, seed=42),
    )
