"""Capture .explain("formatted") for named queries into plans/<round>/<query>_<tag>.txt (round from $SPARK_GRAFT_PLAN_ROUND, default r12).

Usage: python tools/plan_capture.py <tag> <query-name> [<query-name> ...]
Tag is e.g. "before" or "after". Uses sf0.1 (the bench scale) so AQE-visible
sizes and the plan shape match what the bench actually runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"))


def main(tag: str, names: list[str]) -> int:
    from weather_data_pipeline_spark.plans.queries import REGISTRY
    from weather_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    rc = 0
    for name in names:
        if name not in REGISTRY:
            print(f"{name}: NOT REGISTERED"); rc = 1; continue
        try:
            df = REGISTRY[name].spark(spark, SF)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}"); rc = 1; continue
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2:]))
