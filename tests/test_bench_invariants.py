"""Spark-free invariants of bench.py's measurement sets.

These mirror the runtime asserts in bench.main() so a rename or a
set-membership drift fails in pytest immediately, not on the next bench run:
- every SESSION_CACHED query exists in the registry (a renamed query would
  silently re-enter the re-draw pass and record warm-cache near-zeros);
- SESSION_CACHED is disjoint from HEADLINE (best-of-3 on a cached query
  would time warm checkpoint reads after the first draw);
- every calibration query exists (the pinned v2 protocol sums exactly the
  3-query reference).
"""

from __future__ import annotations

import bench
from weather_data_pipeline_spark.plans.queries import REGISTRY


def test_session_cached_subset_of_registry():
    assert bench.SESSION_CACHED <= set(REGISTRY)


def test_session_cached_disjoint_from_headline():
    assert not (bench.SESSION_CACHED & set(bench.HEADLINE))


def test_calibration_queries_registered():
    assert all(n in REGISTRY for n in bench.CALIBRATION_QUERIES)
