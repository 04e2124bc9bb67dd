"""Per-stage profile of one registered query (guide §1/§7: measure first).

Runs the named query in an isolated session with the UI enabled, times a
cold draw + N warm draws with the SAME action the bench uses (.count()),
then dumps the completed stages from the UI REST API — duration, task
count, input/shuffle bytes — so the expensive stage is identifiable
without guessing. Optionally times the noop-sink action too (guide §1.4)
to expose column-pruning gaps that .count() hides.

Usage: python tools/profile_query.py <query> [n_warm] [--noop]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    n_warm = int(args[1]) if len(args) > 1 else 2
    use_noop = "--noop" in sys.argv

    from weather_data_pipeline_spark.plans.queries import REGISTRY
    from weather_data_pipeline_spark.session import get_spark

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def run_once(tag: str) -> float:
        sc.setJobDescription(f"{name}:{tag}")
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, SF)
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        for t in spark.catalog.listTables():
            if t.name.startswith(("stream_out_", "stateful_out_")):
                spark.catalog.dropTempView(t.name)
        return dt

    draws = [run_once("cold")] + [run_once(f"warm{i}") for i in range(n_warm)]
    print(f"{name}: draws={[round(d, 3) for d in draws]}")

    ui = sc.uiWebUrl
    app = sc.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE") as r:
        stages = json.loads(r.read())
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"{'stageId':>7} {'wall_ms':>8} {'runT_ms':>8} {'tasks':>5} "
          f"{'in_MB':>7} {'shR_MB':>7} {'shW_MB':>7}  name")
    for s in stages[:25]:
        sub = time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        comp = time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        wall = (time.mktime(comp) - time.mktime(sub)) * 1000
        print(
            f"{s['stageId']:>7} {wall:>8.0f} {s['executorRunTime']:>8} "
            f"{s['numCompleteTasks']:>5} {s['inputBytes'] / 1e6:>7.1f} "
            f"{s['shuffleReadBytes'] / 1e6:>7.1f} {s['shuffleWriteBytes'] / 1e6:>7.1f}  "
            f"{s['name'][:70]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
