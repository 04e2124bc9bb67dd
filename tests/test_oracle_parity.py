"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is a local mirror of the driver's sf0.01 correctness gate
(CORRECTNESS_r{N}.json): same parquet inputs, same SQL oracle, order-
insensitive value comparison after sorting columns by name.
"""

from __future__ import annotations

import pytest

from weather_data_pipeline_spark.plans.queries import REGISTRY

from .conftest import assert_frames_match

ORACLED = sorted(n for n, q in REGISTRY.items() if q.sql is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_duckdb(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    got = q.spark(spark, sf_dir)
    want = duck.execute(q.sql).df()
    assert_frames_match(got, want, name)
    # every registered query must leave the session's SQL cache empty —
    # a cache()/persist() without a paired unpersist accumulates executor
    # memory across calls in a long-lived session (VERDICT r01 #4)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        f"{name} left cached plans behind"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


def test_registry_contract():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20
