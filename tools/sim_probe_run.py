"""Catch-and-decompose harness for the cosine_near_dup off-JVM stall
(VERDICT r08 next #2): run N draws of an exact-similarity query with the
per-grid-cell probe enabled (`SPARK_GRAFT_SIM_PROBE`, operators/similarity.py)
and decompose any outlier draw into where the time went:

- per-cell wall (the numpy unpack + chunked matmul + mask) summed over the
  draw window, vs the draw's total wall — the gap is everything OUTSIDE the
  cells: Arrow deserialization of the block structs, Python-worker startup,
  shuffle fetch, scheduling;
- per-worker major-fault and RSS deltas across the window (getrusage) — a
  stall that is allocation/page-cache-shaped shows faults moving with it.

The probe flag must be in the environment BEFORE Spark starts (Python
workers inherit it through the executor): this tool re-execs itself with it
set when missing.

Usage:
    python tools/sim_probe_run.py [--query cosine_near_dup_embeddings]
        [--draws 20] [--sf-dir /root/testdata/sf0.1] [--out SIM_PROBE.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

if not os.environ.get("SPARK_GRAFT_SIM_PROBE"):
    os.environ["SPARK_GRAFT_SIM_PROBE"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_GLOB = "/tmp/wdp_sim_probe-*.jsonl"


def _read_probe_lines() -> list[dict]:
    lines: list[dict] = []
    for path in glob.glob(PROBE_GLOB):
        pid = int(path.rsplit("-", 1)[-1].split(".")[0])
        with open(path) as fh:
            for ln in fh:
                try:
                    d = json.loads(ln)
                    d["pid"] = pid
                    lines.append(d)
                except Exception:
                    pass
    return lines


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", default="cosine_near_dup_embeddings")
    ap.add_argument("--draws", type=int, default=20)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="SIM_PROBE.json")
    args = ap.parse_args()

    for path in glob.glob(PROBE_GLOB):
        os.unlink(path)

    from weather_data_pipeline_spark.plans.queries import REGISTRY
    from weather_data_pipeline_spark.session import get_spark

    load_start = os.getloadavg()
    ncpus = os.cpu_count() or 1
    spark = get_spark("sim-probe")
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().count()

    q = REGISTRY[args.query]
    windows: list[tuple[float, float, float]] = []  # (t_start, t_end, wall)
    for i in range(args.draws):
        t0w = time.time()
        t0 = time.perf_counter()
        q.spark(spark, args.sf_dir).count()
        wall = time.perf_counter() - t0
        windows.append((t0w, time.time(), round(wall, 4)))
        print(f"draw {i}: {wall:.3f}s", flush=True)

    cells = _read_probe_lines()
    walls = sorted(w for _, _, w in windows)
    median = walls[len(walls) // 2]
    draws_out = []
    for t0w, t1w, wall in windows:
        in_win = [c for c in cells if t0w <= c["ts"] <= t1w]
        cell_wall = round(sum(c["wall"] for c in in_win), 4)
        max_cell = round(max((c["wall"] for c in in_win), default=0.0), 4)
        # per-worker fault/rss movement across the window: compare each
        # pid's last line in-window vs its last line BEFORE the window
        flt = 0
        rss_peak_kb = 0
        for pid in {c["pid"] for c in in_win}:
            seq = sorted(
                (c for c in cells if c["pid"] == pid), key=lambda c: c["ts"]
            )
            before = [c for c in seq if c["ts"] < t0w]
            inside = [c for c in seq if t0w <= c["ts"] <= t1w]
            if inside:
                base = before[-1] if before else inside[0]
                flt += inside[-1]["majflt"] - base["majflt"]
                # lifetime peak per worker (ru_maxrss) — can only grow, so
                # this shows the high-water mark, never a post-transient drop
                rss_peak_kb = max(rss_peak_kb, inside[-1]["rss_peak_kb"])
        draws_out.append(
            {
                "wall": wall,
                "outlier": wall > 3 * median,
                "cells": len(in_win),
                # cells run on up to 32 parallel workers, so this is a CPU
                # sum, not wall: an outlier with a normal cell sum and a
                # normal max cell stalled OUTSIDE the cells (Arrow convert,
                # worker spawn, shuffle fetch); one with a huge max_cell
                # stalled INSIDE a cell (matmul/allocator)
                "cell_wall_cpu_sum": cell_wall,
                "max_cell_wall": max_cell,
                "majflt_delta": flt,
                "peak_worker_rss_mb": round(rss_peak_kb / 1024, 1),
            }
        )

    out_doc = {
        "metric": "sim_probe_decomposition",
        "query": args.query,
        "sf_dir": args.sf_dir,
        "median_wall": median,
        "n_outliers_over_3x": sum(1 for d in draws_out if d["outlier"]),
        "draws": draws_out,
        "matmul_cap_mb": float(
            os.environ.get("SPARK_GRAFT_SIM_MATMUL_CAP_MB", "32")
        ),
        "load": {
            "ncpus": ncpus,
            "loadavg_start": [round(v, 2) for v in load_start],
            "loadavg_end": [round(v, 2) for v in os.getloadavg()],
            "idle_at_start": max(load_start[0], load_start[1]) / ncpus <= 0.25,
        },
    }
    with open(args.out, "w") as fh:
        json.dump(out_doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        json.dumps(
            {
                "median": median,
                "max": walls[-1],
                "outliers_over_3x": out_doc["n_outliers_over_3x"],
            }
        )
    )


if __name__ == "__main__":
    main()
