"""Spark-free invariants of tools/ab_adjudicate.py's verdict logic.

The adjudication rule exists because of a measured hazard (BENCH_AB_r09):
single full-pass captures carry ±15% autocorrelated host drift, so a
'regression' is only code when the two sides' controlled draw ranges are
DISJOINT with margin. These pin that rule and the cached-query comparable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import ab_adjudicate as AB


def test_overlapping_ranges_are_host_noise():
    # the r10 reality: mins differ ~15% but ranges overlap -> no code verdict
    v = AB.per_query_verdict([1.56, 1.69, 1.80], [1.34, 1.61, 2.56])
    assert v["verdict"] == "host-noise/parity"


def test_disjoint_ranges_with_margin_is_code_regression():
    # new side's BEST (3.0) exceeds old side's WORST (2.0) by >20%
    v = AB.per_query_verdict([3.0, 3.2, 3.5], [1.8, 1.9, 2.0])
    assert v["verdict"] == "code-regression"
    assert v["new_over_old_min_ratio"] > 1.5


def test_disjoint_ranges_other_way_is_code_improvement():
    v = AB.per_query_verdict([1.0, 1.1], [1.5, 1.6, 1.7])
    assert v["verdict"] == "code-improvement"


def test_disjoint_but_inside_margin_is_still_noise():
    # disjoint ranges but only 10% apart: inside the 20% margin -> noise
    v = AB.per_query_verdict([1.10, 1.12], [0.99, 1.0])
    assert v["verdict"] == "host-noise/parity"


def test_cached_queries_compare_first_draws_only():
    # a session-cached query's later draws depend on each tree's decoy
    # eviction details; only draw 0 is comparable across trees
    assert AB.comparable({"build_inclusive": True, "draws": [6.5, 0.1, 0.1]}) == 6.5
    assert AB.comparable({"build_inclusive": False, "draws": [2.0, 1.5, 1.8]}) == 1.5
