#!/usr/bin/env python3
"""Correlate per-query wall times with JVM GC pauses (VERDICT r07 next #4:
settle the `cosine_near_dup_embeddings` bimodality — outlier draws of
3-15 s appear only inside full registry passes, never in targeted replays,
so the transient is ambient to the pass; the standing hypothesis is a
major-GC pause triggered by allocation pressure from surrounding queries).

Runs the registry once in bench.py's full-pass family order with
SPARK_GRAFT_GC_LOG enabled, recording (query, start_uptime, wall); then
parses the unified GC log for pauses and reports, per query, the GC pause
time that landed inside its window. A slow draw whose window contains a
comparable pause confirms the hypothesis; a slow draw with near-zero GC
inside it retires it.

    SPARK_GRAFT_GC_LOG=/tmp/gc_probe.log python tools/gc_probe.py \
        --watch cosine_near_dup_embeddings --out GC_PROBE.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# GC pause lines in -Xlog:gc*:...:time,uptime look like:
#   [2026-08-15T18:00:00.123+0000][12.345s] GC(7) Pause Young (Normal) ... 34.5ms
_PAUSE_RE = re.compile(
    r"\[(?P<uptime>\d+\.\d+)s\]\s+GC\(\d+\)\s+Pause\s+(?P<kind>[^)]*\))"
    r".*?\s(?P<ms>\d+\.\d+)ms\s*$"
)


def parse_gc_pauses(path: str) -> list[dict]:
    pauses = []
    with open(path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            m = _PAUSE_RE.search(line)
            if m:
                pauses.append(
                    {
                        "uptime": float(m.group("uptime")),
                        "kind": m.group("kind").strip(),
                        "ms": float(m.group("ms")),
                    }
                )
    return pauses


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", nargs="*", default=["cosine_near_dup_embeddings"])
    ap.add_argument("--out", default="GC_PROBE.json")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    gc_log = os.environ.get("SPARK_GRAFT_GC_LOG")
    if not gc_log:
        print("set SPARK_GRAFT_GC_LOG=<path> first", file=sys.stderr)
        sys.exit(2)
    if os.path.exists(gc_log):
        os.remove(gc_log)

    import bench  # reuse the full-pass ordering and family classifier
    from weather_data_pipeline_spark.plans.queries import REGISTRY
    from weather_data_pipeline_spark.session import get_spark

    spark = get_spark("wdp-gc-probe")
    t_jvm0 = time.perf_counter()  # ~JVM start; uptime offset refined below
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    # anchor python perf_counter to JVM uptime via the log's newest entry
    def jvm_uptime() -> float:
        last = 0.0
        try:
            with open(gc_log, encoding="utf-8", errors="replace") as fh:
                for line in fh:
                    m = re.search(r"\[(\d+\.\d+)s\]", line)
                    if m:
                        last = float(m.group(1))
        except FileNotFoundError:
            pass
        return last

    # run in bench.py's full order: cheap families first, ML last
    order = sorted(
        REGISTRY,
        key=lambda n: (
            bench.family(n) == "ml_train",
            bench.family(n),
            n,
        ),
    )
    # calibrate offset: uptime_now ≈ perf_now - t0  =>  t0 = perf_now - uptime
    spark.sparkContext.parallelize(range(10_000_000), 8).sum()  # force some GC log lines
    time.sleep(0.2)
    t0 = time.perf_counter() - jvm_uptime()

    windows = []
    for name in order:
        s = time.perf_counter() - t0
        w0 = time.perf_counter()
        try:
            REGISTRY[name].spark(spark, args.sf_dir).count()
            err = None
        except Exception as exc:  # keep the pass going; record the failure
            err = f"{type(exc).__name__}: {exc}"[:200]
        wall = time.perf_counter() - w0
        windows.append(
            {"query": name, "start_uptime": round(s, 3),
             "wall": round(wall, 4), "err": err}
        )
        print(f"{name}: {wall:.3f}s", flush=True)

    pauses = parse_gc_pauses(gc_log)
    total_pause = round(sum(p["ms"] for p in pauses) / 1000.0, 3)
    for w in windows:
        inside = [
            p
            for p in pauses
            if w["start_uptime"] <= p["uptime"] <= w["start_uptime"] + w["wall"]
        ]
        w["gc_pause_sec"] = round(sum(p["ms"] for p in inside) / 1000.0, 4)
        w["gc_max_pause_sec"] = round(
            max((p["ms"] for p in inside), default=0.0) / 1000.0, 4
        )
        w["gc_n_pauses"] = len(inside)

    watched = [w for w in windows if w["query"] in set(args.watch)]
    out = {
        "metric": "gc_correlation",
        "sf_dir": args.sf_dir,
        "gc_log": gc_log,
        "total_gc_pause_sec": total_pause,
        "n_gc_pauses": len(pauses),
        "watched": watched,
        "top_gc_windows": sorted(
            windows, key=lambda w: -w["gc_pause_sec"]
        )[:10],
        "top_wall": sorted(windows, key=lambda w: -w["wall"])[:10],
        "load": {"ncpus": os.cpu_count(), "loadavg_end": list(os.getloadavg())},
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"watched": watched, "total_gc_pause_sec": total_pause}))


if __name__ == "__main__":
    main()
