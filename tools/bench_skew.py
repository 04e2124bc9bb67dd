"""Skewed-replica bench (VERDICT r05 next #1): measure the heavy-family
representatives on a UNIFORM sf-replica and on its Zipf-SKEWED twin (equal
row counts, values remapped — see scale_replicate.py --skew), and record
per-stage task-time p50/p99 from the Spark event log so a wall-clock
regression can be attributed to a straggler partition, not guessed at.

Uniform replicas validate the scale CURVE; skew is the classic killer of
exactly the shapes this engine leans on — entity-key windows (one user owns
20 % of events), bucket joins (one hot MinHash/LSH bucket), and gram
aggregations (one stopword-heavy token). Any query whose skewed runtime is
> 3x its uniform runtime at equal rows is a fix target (salting /
degree-orientation / AQE verification), not a shrug.

Usage:
    python tools/scale_replicate.py --out scaledata/sf1.0 --factor 10
    python tools/scale_replicate.py --out scaledata/sf1.0_skew --factor 10 --skew
    python tools/bench_skew.py --uniform scaledata/sf1.0 \
        --skew scaledata/sf1.0_skew --out BENCH_SKEW.json

Per-stage task stats come from the event log (spark.eventLog.enabled): each
query runs inside its own job group; JobStart events map job-group ->
stage ids, TaskEnd events carry per-task durations. This uses only the
PUBLIC event-log JSON schema, no listener plumbing.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPRESENTATIVES = [
    # entity-key windows: one user owns 20% of events -> one hot partition
    "lag_events",
    "rolling_mean_events",
    "latest_event_per_user",
    # groupBy agg: hot user_id group (map-side combine should absorb it)
    "group_summary_events",
    # bucketized interval self-join: hot user's sessions
    "session_overlap_pairs_events",
    # gram/shingle aggregations + bucket joins: hot token -> hot buckets
    "minhash_lsh_candidates_documents",
    "bigram_lm_documents",
    "passage_dedup_documents",
    # NOT in the default list: tfidf_cosine_pairs_documents. Its RELATIVE
    # df cap (df <= 0.1*n) is right for real corpora but pathological on
    # bijected replicas at sf>=1.0 (per-word df stays fixed while n grows,
    # so the cap admits near-stopwords and the posting join explodes —
    # SCALE.md "Replica-design caveat"). Measure it at the sf0.3 pair:
    #   bench_skew.py --uniform scaledata/sf0.3 --skew scaledata/sf0.3_skew \
    #     --merge --queries tfidf_cosine_pairs_documents
    # BSP graph loops over the near-dup graph: hot token inflates one
    # component; embeddings carry a 5% one-direction near-dup cluster
    "neardup_components_documents",
    "pagerank_neardup_documents",
    "semantic_dedup_keep_list_embeddings",
]


def _pct(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    k = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[k]


def _zstd_lines(path: str):
    """Stream-decompress a .zstd event-log file, trying in order: the zstd
    CLI (resolved via shutil.which, NOT a bare name — VERDICT r06 #1: the
    CLI lives only under miniconda on this box and a bare-PATH shell got
    FileNotFoundError), the `zstandard` module, then pyarrow's
    CompressedInputStream. Raises RuntimeError naming all three if none is
    available, so the caller sees a decode-capability problem rather than a
    confusing empty-stats result."""
    import io
    import shutil as _sh
    import subprocess

    cli = _sh.which("zstd")
    if cli:
        proc = subprocess.Popen([cli, "-dc", path], stdout=subprocess.PIPE)
        assert proc.stdout is not None
        try:
            yield from io.TextIOWrapper(proc.stdout, encoding="utf-8")
        except BaseException:
            # abandoned mid-iteration (caller broke out early / errored):
            # don't leave a zstd process writing into a dead pipe
            proc.kill()
            proc.wait()
            raise
        # a corrupt .zstd file must be an error, not silently truncated
        # stage stats (same fail-loud contract as the no-decompressor case)
        if proc.wait() != 0:
            raise RuntimeError(
                f"zstd -dc exited {proc.returncode} decompressing {path}: "
                "corrupt or truncated event-log file"
            )
        return
    try:
        import zstandard

        with open(path, "rb") as raw:
            reader = zstandard.ZstdDecompressor().stream_reader(raw)
            yield from io.TextIOWrapper(reader, encoding="utf-8")
        return
    except ImportError:
        pass
    try:
        import pyarrow as pa

        with pa.CompressedInputStream(pa.OSFile(path, "rb"), "zstd") as stream:
            yield from io.TextIOWrapper(stream, encoding="utf-8")
        return
    except ImportError:
        pass
    raise RuntimeError(
        f"cannot decompress {path}: no zstd CLI on PATH, no zstandard "
        "module, no pyarrow"
    )


def _iter_events(files: list[str]):
    for path in files:
        if path.endswith(".zstd"):
            # Spark's rolling event log compresses with zstd by default
            yield from _zstd_lines(path)
        else:
            with open(path) as fh:
                yield from fh


def _stage_stats(files: list[str]) -> dict[str, dict[int, dict]]:
    """event log file(s) -> {job_group: {stage_id: {n,p50,p99,max,sum}}}."""
    group_stages: dict[str, set[int]] = {}
    stage_tasks: dict[int, list[float]] = {}
    for line in _iter_events(files):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:  # truncated tail line
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
            if grp:
                ids = {si["Stage ID"] for si in ev.get("Stage Infos", [])}
                group_stages.setdefault(grp, set()).update(ids)
        elif kind == "SparkListenerTaskEnd":
            info = ev.get("Task Info") or {}
            dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1e3
            if dur >= 0:
                stage_tasks.setdefault(ev.get("Stage ID"), []).append(dur)
    out: dict[str, dict[int, dict]] = {}
    for grp, stages in group_stages.items():
        per = {}
        for sid in sorted(stages):
            tasks = sorted(stage_tasks.get(sid, []))
            if not tasks:
                continue  # skipped stage (reused exchange)
            per[sid] = {
                "n_tasks": len(tasks),
                "p50_sec": round(_pct(tasks, 0.50), 3),
                "p99_sec": round(_pct(tasks, 0.99), 3),
                "max_sec": round(tasks[-1], 3),
                "sum_sec": round(sum(tasks), 3),
            }
        out[grp] = per
    return out


def _top_stages(per_stage: dict[int, dict], k: int = 4) -> list[dict]:
    ranked = sorted(
        per_stage.items(), key=lambda kv: kv[1]["sum_sec"], reverse=True
    )
    return [{"stage": sid, **st} for sid, st in ranked[:k]]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--uniform", default="scaledata/sf1.0")
    ap.add_argument("--skew", default="scaledata/sf1.0_skew")
    ap.add_argument("--out", default="BENCH_SKEW.json")
    ap.add_argument("--queries", nargs="*", default=REPRESENTATIVES)
    # best-of-3 per SIDE (VERDICT r07 next #6): the uniform twin is bound by
    # the scheduling floor and noisy at repeat 1-2 — its draw-to-draw spread
    # moved the headline pagerank skew ratio 1.44->1.91 across rounds
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument(
        "--merge",
        action="store_true",
        help="fold results into an existing --out file (per-query entries "
        "replace same-named priors) — used to measure different queries at "
        "different scale pairs, e.g. tfidf_cosine at sf0.3",
    )
    args = ap.parse_args()

    # same idle gate as bench.py: skew ratios from a loaded box are noise
    # (the r7 artifact was captured at loadavg 10/32 and its loadavg_start
    # was sampled AFTER the runs — both fixed here)
    load_start = os.getloadavg()
    ncpus = os.cpu_count() or 1
    idle_at_start = load_start[0] / ncpus <= float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "0.25")
    )
    if not idle_at_start:
        print(
            f"bench_skew: host NOT idle (loadavg {load_start[0]:.2f} on "
            f"{ncpus} cpus) — ratios will be noisy",
            file=sys.stderr,
        )

    evdir = "/tmp/spark-graft-eventlog"
    os.makedirs(evdir, exist_ok=True)
    for old in glob.glob(f"{evdir}/*"):
        # Spark 4 writes v2 event logs as a DIRECTORY of rolled files
        shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)

    from weather_data_pipeline_spark.plans.queries import REGISTRY
    from weather_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "bench-skew",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )
    sc = spark.sparkContext

    wall: dict[str, dict[str, float]] = {}
    best_run: dict[str, dict[str, int]] = {}  # which repeat produced the min
    draws: dict[str, dict[str, list[float]]] = {}  # every repeat's wall time
    from bench import SESSION_CACHED

    for name in args.queries:
        wall[name] = {}
        best_run[name] = {}
        draws[name] = {"uniform": [], "skew": []}
        # session-cached queries (bench.SESSION_CACHED): consecutive
        # same-dir draws read the warm materialized frame and would time
        # checkpoint reads, not the operator — alternate dirs instead, so
        # every draw is a key-switch rebuild (the one-entry cache evicts
        # when the thread asks for a different sf_dir) and both sides'
        # draws stay build-inclusive.
        if name in SESSION_CACHED:
            order = [lbl for _ in range(args.repeat) for lbl in ("uniform", "skew")]
        else:
            order = ["uniform"] * args.repeat + ["skew"] * args.repeat
        dirs = {"uniform": args.uniform, "skew": args.skew}
        best = {"uniform": float("inf"), "skew": float("inf")}
        best_r = {"uniform": -1, "skew": -1}
        rcount = {"uniform": 0, "skew": 0}
        failed: set[str] = set()
        for label in order:
            if label in failed:
                continue
            r = rcount[label]
            rcount[label] += 1
            grp = f"{name}@{label}#{r}"
            sc.setJobGroup(grp, grp)
            t0 = time.perf_counter()
            try:
                REGISTRY[name].spark(spark, dirs[label]).count()
                took = time.perf_counter() - t0
                draws[name][label].append(round(took, 3))
                if took < best[label]:
                    best[label], best_r[label] = took, r
            except Exception as exc:  # noqa: BLE001 — recorded, not fatal
                # keep an earlier successful timing (ADVICE r06: a
                # later-repeat error must not overwrite a good best)
                print(f"{name}@{label}: ERROR {exc}", flush=True)
                failed.add(label)
            finally:
                # SparkContext.clearJobGroup is gone in PySpark 4.x
                sc.setLocalProperty("spark.jobGroup.id", None)
        for label in ("uniform", "skew"):
            wall[name][label] = (
                round(best[label], 3) if best_r[label] >= 0 else -1.0
            )
            best_run[name][label] = best_r[label]
        u, s = wall[name]["uniform"], wall[name]["skew"]
        ratio = round(s / u, 2) if u > 0 and s > 0 else None
        print(f"{name:45s} uniform={u:8.3f}s skew={s:8.3f}s ratio={ratio}", flush=True)

    app_id = sc.applicationId
    spark.stop()
    time.sleep(2)  # let the event-log file flush/rename

    paths = sorted(glob.glob(f"{evdir}/*{app_id}*"), key=os.path.getmtime)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):  # v2 layout: events_* rolled files inside
            files += sorted(glob.glob(f"{p}/events*"), key=lambda f: int(f.rsplit("/events_", 1)[1].split("_")[0]))
        else:
            files.append(p)
    stats = _stage_stats(files) if files else {}

    results = {}
    for name in args.queries:
        u, s = wall[name].get("uniform", -1), wall[name].get("skew", -1)
        du, ds = draws[name]["uniform"], draws[name]["skew"]
        entry = {
            "uniform_sec": u,
            "skew_sec": s,
            "ratio": round(s / u, 2) if u and u > 0 and s > 0 else None,
            # every draw, both sides (r8): draw 0 is COLD on the uniform
            # side (it runs first and pays the scan/page-cache/codegen
            # cost the skew side then inherits — lag_events measured 4.76 s
            # cold vs 0.39/0.43 warm), so warm_ratio sums draws 1..N-1 per
            # side; warm draws are stable to ~2% CV even on the BSP graph
            # queries, where best/best paired a noisy pair of minima and
            # moved the headline ratio 1.44-1.91 across rounds. `ratio`
            # (best/best) stays the historical series.
            "draws_uniform": du,
            "draws_skew": ds,
            "warm_ratio": (
                round(sum(ds[1:]) / sum(du[1:]), 2)
                if len(du) > 1 and len(ds) > 1 and sum(du[1:]) > 0
                else None
            ),
            "dirs": [args.uniform, args.skew],
            # stage stats come from the SAME repeat that produced the
            # reported wall minimum (ADVICE r06: run #0's straggler profile
            # can describe a cold run unrelated to the best timing)
            "best_run": best_run[name],
            "stages_uniform": _top_stages(
                stats.get(f"{name}@uniform#{best_run[name].get('uniform', 0)}", {})
            ),
            "stages_skew": _top_stages(
                stats.get(f"{name}@skew#{best_run[name].get('skew', 0)}", {})
            ),
        }
        results[name] = entry
    prior_load = None
    if args.merge and os.path.exists(args.out):
        with open(args.out) as fh:
            prior_doc = json.load(fh)
        prior = prior_doc.get("queries", {})
        # a merge run starts while the main capture's load is still
        # decaying — keep the MAIN capture's load as the artifact's
        # headline and record this segment's separately
        prior_load = prior_doc.get("load")
        prior.update(results)
        results = prior
    flagged = sorted(
        n for n, e in results.items() if e["ratio"] is not None and e["ratio"] > 3
    )
    out = {
        "metric": "skew_resilience",
        "uniform_dir": args.uniform,
        "skew_dir": args.skew,
        "repeat": args.repeat,
        "queries": results,
        "flagged_over_3x": flagged,
        "load": {
            "ncpus": ncpus,
            "loadavg_start": [round(v, 2) for v in load_start],
            "loadavg_end": [round(v, 2) for v in os.getloadavg()],
            "idle_at_start": idle_at_start,
        },
    }
    if prior_load is not None:
        out["merge_segment_load"] = out["load"]
        out["load"] = prior_load
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"flagged_over_3x": flagged}))


if __name__ == "__main__":
    main()
