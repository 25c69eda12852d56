"""Unit tests for bench.py's storm-retry policy.

The bench keeps sampling small/big leg pairs while no pair's window is
clean (both legs slot-granted and every concurrently-sampled box
ceiling calm). The retry budget is time-based, not count-based — the
2026-08-19 08:49 run (BASELINE.md, third round-5 run) burned a fixed
two-extra-pair budget inside an hour-long bandwidth storm; the policy
under test replaces it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import storm_retry_fits


def test_retry_fits_within_budget():
    # mean pair time 870 s (the 08:49 run's measured mean): a 5th pair
    # still fits a 4800 s budget, a 6th does not
    assert storm_retry_fits(870.0, 1, 4800)
    assert storm_retry_fits(3480.0, 4, 4800)
    assert not storm_retry_fits(4350.0, 5, 4800)


def test_retry_hard_cap_eight_pairs():
    assert not storm_retry_fits(10.0, 8, 1e12)
    assert not storm_retry_fits(10.0, 9, 1e12)


def test_retry_predicts_next_pair_cost():
    # one pair took 3000 s: a second would land at 6000 s > 4800 — stop
    assert not storm_retry_fits(3000.0, 1, 4800)
    # fast pairs (quick box): plenty of retries fit
    assert storm_retry_fits(600.0, 2, 4800)


def test_retry_exact_boundary_inclusive():
    # prediction exactly at the budget still runs (<=, not <)
    assert storm_retry_fits(2400.0, 1, 4800)
    assert not storm_retry_fits(2400.1, 1, 4800)
