"""Session-level Python worker-pool prewarm (VERDICT r09 #3).

The pool cold start — fork + numpy/pandas import across up to 32 workers —
was root-caused (SIM_PROBE.json) as the only source of the historical 3-18 s
Pandas-UDF first-draw outliers. get_spark now runs the prewarm by default for
local masters so ANY consumer's first wide python-task query starts from
steady state, not just the bench. The fresh-process first-draw evidence is
PREWARM_PROBE.json (captured via get_spark only, no bench warmups).
"""

from __future__ import annotations

import os

import pytest

from weather_data_pipeline_spark import session as S


@pytest.mark.skipif(
    bool(os.environ.get("SPARK_GRAFT_NO_PREWARM")),
    reason="prewarm disabled by env for this run",
)
def test_get_spark_prewarms_local_session_once(spark):
    # the session fixture built `spark` through get_spark with the default
    # env, so the pool prewarm must already have run for this application
    assert spark.sparkContext.applicationId in S._PREWARMED
    # once per session: a second explicit call is a no-op
    assert S.prewarm_python_workers(spark) is False
