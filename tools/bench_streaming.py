"""Streaming throughput bench (VERDICT r05 next #5): sustained records/sec
and per-batch latency for the two stateful streaming shapes, measured from
the engine's own progress telemetry — not just availableNow drain time.

The registry's streaming queries are benched as one-shot drains, which
hides the number a 100 TB ingest actually cares about: how many rows/sec a
micro-batch pipeline sustains and what the batch-duration distribution
looks like once state (window aggregates / join buffers) is warm.

Method: split the events table into N parquet files of ~M rows, stream the
directory with maxFilesPerTrigger=1 (so availableNow processes N distinct
micro-batches, exercising state handoff between batches), sink to noop, and
read per-batch numInputRows / triggerExecution out of
StreamingQuery.recentProgress. Reports, per pipeline:
  - rows_per_sec_wall:   total rows / wall-clock of the whole run
  - rows_per_sec_busy:   total rows / sum of per-batch trigger durations
  - batch_ms p50/p99/max over all batches with input rows

Usage:
    python tools/bench_streaming.py [--src /root/testdata/sf0.1] \
        [--n-files 20] [--out BENCH_STREAMING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pct(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    k = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[k]


def _split_events(spark, src: str, out_dir: str, n_files: int) -> int:
    """Write the events table as n_files parquet files ordered by ts, so the
    stream's file order roughly follows event time (kind to watermarks, like
    a real time-partitioned ingest)."""
    from weather_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, src, "events")
    n = ev.count()
    (
        ev.orderBy("ts")
        .repartitionByRange(n_files, "ts")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return n


def _drain(spark, stream_df, output_mode: str, expected_rows: int) -> dict:
    """Run to completion on a noop sink; return progress stats.

    Completeness guard (ADVICE r06): recentProgress is capped at
    spark.sql.streaming.numRecentProgressUpdates entries — the session conf
    raises it well above the file count, and `complete` records whether the
    summed numInputRows actually covered the whole feed, so a silent
    undercount can never masquerade as a throughput reading (wall covers
    the full run; rows from a truncated buffer would bias rows_per_sec_wall
    low)."""
    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("noop")
        .option("checkpointLocation", f"/tmp/bench-streaming-ckpt-{time.time_ns()}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    rows, busy_ms, batch_ms = 0, 0.0, []
    # state-store trajectory across the drain (VERDICT r08 next #3): for a
    # WATERMARKED pipeline the state must plateau once the watermark starts
    # evicting closed windows/buffers — linear growth to the end would mean
    # the state store scales with INPUT, not with the watermark horizon,
    # and a week-long 100 TB ingest would OOM its executors.
    state_rows: list[int] = []
    state_mem: list[int] = []
    for p in q.recentProgress:
        n = p.get("numInputRows", 0) or 0
        dur = (p.get("durationMs") or {}).get("triggerExecution", 0) or 0
        if n > 0:
            rows += n
            busy_ms += dur
            batch_ms.append(float(dur))
        ops = p.get("stateOperators") or []
        if ops:
            state_rows.append(sum(int(o.get("numRowsTotal", 0) or 0) for o in ops))
            state_mem.append(
                sum(int(o.get("memoryUsedBytes", 0) or 0) for o in ops)
            )
    batch_ms.sort()
    complete = rows == expected_rows
    if not complete:
        print(
            f"WARNING: progress rows {rows} != feed rows {expected_rows} — "
            "recentProgress truncated? raise numRecentProgressUpdates",
            flush=True,
        )
    return {
        "rows": rows,
        "expected_rows": expected_rows,
        "complete": complete,
        "n_batches": len(batch_ms),
        "wall_sec": round(wall, 3),
        "rows_per_sec_wall": round(rows / wall, 1) if wall > 0 else None,
        "rows_per_sec_busy": round(rows / (busy_ms / 1e3), 1) if busy_ms else None,
        "batch_ms_p50": round(_pct(batch_ms, 0.50), 1),
        "batch_ms_p99": round(_pct(batch_ms, 0.99), 1),
        "batch_ms_max": round(batch_ms[-1], 1) if batch_ms else None,
        # ~8 evenly spaced samples of the per-batch state-row totals show
        # the growth SHAPE (plateau vs linear) without dumping every batch
        "state_rows_trajectory": [
            state_rows[i]
            for i in sorted(
                {
                    round(j * (len(state_rows) - 1) / 7)
                    for j in range(8)
                }
            )
        ]
        if state_rows
        else [],
        "state_rows_max": max(state_rows) if state_rows else 0,
        "state_rows_final": state_rows[-1] if state_rows else 0,
        "state_mem_max_mb": round(max(state_mem) / 1e6, 1) if state_mem else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n-files", type=int, default=20)
    ap.add_argument("--out", default="BENCH_STREAMING.json")
    args = ap.parse_args()

    # same idle gate as bench.py (VERDICT r07 next #3: the r7 artifact was
    # captured at loadavg 28.9/32 and didn't flag itself)
    load_start = os.getloadavg()
    ncpus = os.cpu_count() or 1
    # max(1m,5m) window, same as bench.py (VERDICT r08 #1: a 1-min-only
    # gate passes a recently-quiesced-but-still-busy host)
    gate_load = max(load_start[0], load_start[1])
    idle_at_start = gate_load / ncpus <= float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "0.25")
    )
    if not idle_at_start:
        print(
            f"bench_streaming: host NOT idle (max(1m,5m) loadavg "
            f"{gate_load:.2f} on {ncpus} cpus) — rows/s will be deflated",
            file=sys.stderr,
        )

    import pyspark.sql.functions as F

    from weather_data_pipeline_spark.session import get_spark
    from weather_data_pipeline_spark.streaming import jobs as SJ

    # recentProgress caps at numRecentProgressUpdates (default 100) entries;
    # a run with more micro-batches than that silently undercounts rows
    # (ADVICE r06) — raise it far above any file count this bench uses
    spark = get_spark(
        "bench-streaming",
        extra_conf={
            "spark.sql.streaming.numRecentProgressUpdates": str(
                max(1024, 4 * args.n_files)
            )
        },
    )
    feed = "/tmp/bench-streaming-feed"
    shutil.rmtree(feed, ignore_errors=True)
    total = _split_events(spark, args.src, feed, args.n_files)
    print(f"feed: {total} rows in {args.n_files} files", flush=True)

    def feed_stream():
        # same schema/NTZ handling as streaming.jobs.events_stream, but over
        # the split feed dir with one file per micro-batch
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw = (
            spark.readStream.schema(SJ.EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(feed)
        )
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))

    def hourly_agg():
        # one source read: expected progress rows = feed rows
        return SJ.hourly_agg_stream(feed_stream()), "update", 1

    def stream_stream_join():
        # watermarked stream-stream interval join (view->purchase attribution)
        ev = feed_stream()
        views = (
            ev.where(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "1 hour")
        )
        purchases = (
            ev.where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        joined = views.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        )
        # the two watermarked branches each read the file source, so the
        # query's numInputRows totals TWICE the feed rows
        return joined, "append", 2

    # Per-batch cost at small batch sizes is dominated by the state-store
    # commit + shuffle fan-out, which scale with the PARTITION count, not
    # the row count — so each pipeline is measured at two shuffle-partition
    # settings AND two batch sizes (VERDICT r06 next #6: the ~5 k-row sweep
    # alone showed sp8 ≈ 2.4× sp32 but not where the curve crosses; a
    # ~50 k-row-batch pair shows whether wider state partitioning pays once
    # batches carry real volume). State partitioning is fixed at first
    # checkpoint — a deploy-time knob, now exposed as
    # streaming.jobs.state_partitions(spark, n).
    from weather_data_pipeline_spark.streaming.jobs import state_partitions

    big_files = max(2, total // 50_000)
    feeds = [(feed, args.n_files)]
    if big_files < args.n_files:  # skip when the feed can't make bigger batches
        feed_big = "/tmp/bench-streaming-feed-big"
        shutil.rmtree(feed_big, ignore_errors=True)
        _split_events(spark, args.src, feed_big, big_files)
        feeds.append((feed_big, big_files))

    results: dict[str, dict] = {}
    default_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for feed_dir, nf in feeds:
        rpb = total // nf  # approx rows per micro-batch
        for sp in (default_sp, 8):
            with state_partitions(spark, sp):
                for label, build in (
                    ("hourly_agg", hourly_agg),
                    ("stream_stream_join", stream_stream_join),
                ):
                    feed = feed_dir  # feed_stream() closes over `feed`
                    df, mode, n_sources = build()
                    key = f"{label}@sp{sp}@b{rpb}"
                    results[key] = _drain(spark, df, mode, total * n_sources)
                    print(f"{key}:", json.dumps(results[key]), flush=True)

    out = {
        "metric": "streaming_throughput",
        "src": args.src,
        "n_files": args.n_files,
        "total_rows": total,
        "pipelines": results,
        "load": {
            "ncpus": ncpus,
            "loadavg_start": [round(v, 2) for v in load_start],
            "loadavg_end": [round(v, 2) for v in os.getloadavg()],
            "idle_at_start": idle_at_start,
        },
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v["rows_per_sec_wall"] for k, v in results.items()}))
    for feed_dir, _ in feeds:
        shutil.rmtree(feed_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
