#!/usr/bin/env python3
"""Warm best-of-N timing of one (or more) registry queries in a fresh
process — the adjudication tool for round-over-round regressions
(VERDICT r06/r07: "probably ambient" needs a controlled A/B, not vibes).

Run it from TWO checkouts (git worktree of the old round's tree vs HEAD)
on an idle box, alternating A/B/A/B so page-cache and thermal state can't
systematically favor one side:

    python tools/ab_query.py training_corpus_manifest --repeats 5

Prints one JSON line per query: every draw, the min, and load metadata.
PYTHONPATH decides which tree's package is measured, so invoke as
`PYTHONPATH=/path/to/tree python /path/to/tree/tools/ab_query.py ...`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from weather_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark("wdp-ab")
    # same JVM/codegen warmup as bench.py so draw 1 isn't compilation cost
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()
    warm = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().count()

    from bench import SESSION_CACHED

    DECOY_SF = "/root/testdata/sf0.001"
    for name in args.queries:
        q = REGISTRY[name]
        cached = name in SESSION_CACHED
        draws = []
        for r in range(args.repeats):
            if cached and r > 0:
                # session-cached query: a repeat at the same sf_dir reads
                # the warm materialized frame and would time checkpoint
                # reads. An UNTIMED decoy draw at a different sf_dir makes
                # the one-entry cache evict this thread's previous key
                # through its own lease/evict path (checkpoint blocks
                # freed), so the next timed draw is build-inclusive.
                q.spark(spark, DECOY_SF).count()
            t0 = time.perf_counter()
            q.spark(spark, args.sf_dir).count()
            draws.append(round(time.perf_counter() - t0, 4))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": args.sf_dir,
                    "draws": draws,
                    "min": min(draws),
                    "build_inclusive": cached,
                    "loadavg": round(os.getloadavg()[0], 2),
                    "tree": os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
