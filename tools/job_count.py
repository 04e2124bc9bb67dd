"""Job-count + wall profile of registered queries (VERDICT r11 #1: the
per-query constant floor is partly EAGER DRIVER ACTIONS in operator paths —
every extra Spark job is ~30-100 ms of scheduling latency at sf0.1 even when
the work is trivial).

For each named query: one warm-up draw, then N measured warm draws recording
wall seconds and the number of Spark JOBS the draw scheduled (via the
status-tracker job-id watermark — construction-time eager jobs included,
which is the point). Prints one line per query plus a sortable summary.

Usage: python tools/job_count.py <query> [query ...] [--warm N]
       python tools/job_count.py --floor   # pinned representative floor set
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# representative sub-second queries spanning the operator families (the
# constant-floor set the r11 verdict asked to profile)
FLOOR_SET = [
    "lag_events",
    "global_stats_events",
    "group_summary_events",
    "token_stats_documents",
    "quality_score_documents",
    "exact_dedup_stats_documents",
    "hash_split_documents",
    "chunk_documents",
    "int8_quantize_embeddings",
    "rolling_std_events",
    "salted_agg_events",
    "asof_join_events",
    "zscore_anomaly_events",
    "value_counts_event_type",
    "label_encode_event_type",
]


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_warm = 3
    if "--warm" in sys.argv:
        n_warm = int(sys.argv[sys.argv.index("--warm") + 1])
    if "--floor" in sys.argv:
        names = FLOOR_SET + names

    from weather_data_pipeline_spark.plans.queries import REGISTRY
    from weather_data_pipeline_spark.session import get_spark

    spark = get_spark("job-count")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def job_watermark() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids, default=-1)

    # generic warmup so the first measured query isn't paying JVM warmth
    spark.read.parquet(f"{SF}/lineitem.parquet").groupBy("l_returnflag").count().count()

    rows = []
    for name in names:
        if name not in REGISTRY:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        REGISTRY[name].spark(spark, SF).count()  # warm-up draw
        walls, jobs = [], []
        for _ in range(n_warm):
            j0 = job_watermark()
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, SF).count()
            walls.append(time.perf_counter() - t0)
            # all jobs in this session run in the default group; ids are
            # monotonically increasing, so the delta is this draw's jobs
            jobs.append(job_watermark() - j0)
        for t in spark.catalog.listTables():
            if t.name.startswith(("stream_out_", "stateful_out_")):
                spark.catalog.dropTempView(t.name)
        rows.append((min(walls), max(jobs), name))
        print(
            f"{name}: wall_min={min(walls):.3f} walls={[round(w, 3) for w in walls]} "
            f"jobs={jobs}",
            flush=True,
        )
    print("\n-- sorted by jobs --")
    for wall, nj, name in sorted(rows, key=lambda r: -r[1]):
        print(f"jobs={nj:3d} wall={wall:7.3f}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
