#!/usr/bin/env python3
"""Self-contained same-day alternating A/B adjudication (VERDICT r09 #1).

BENCH_AB_r09 proved 'no aggregate regression' but did not record WHICH
queries were in the subset or their per-query draws, so a single 4.7x raw
full-pass mover had no individual verdict. This orchestrator runs each
tree's OWN tools/ab_query.py in alternating fresh processes (A/B/A/B with
cooldowns, so page-cache and thermal state can't systematically favor one
side), keeps EVERY draw, and writes one artifact that names the subset,
the draws, and a per-query verdict.

    python tools/ab_adjudicate.py --other-tree /tmp/wdp_ab_r8 \
        --other-label r8 --queries a b c --rounds 3 --repeats 3 \
        --cooldown 60 --out BENCH_AB_r10.json

Per-query comparable: min of warm draws per side — except session-cached
queries (build_inclusive=true in ab_query output), where only draw 0 of
each process is comparable across trees (later draws depend on each tree's
decoy-eviction details), so the min of FIRST draws is used. Verdict rule:
'code' only when the slower side's BEST reading exceeds the faster side's
WORST by >20% (non-overlapping draw ranges with margin); otherwise
'host-noise/parity'.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_side(tree: str, queries: list[str], repeats: int, sf_dir: str) -> list[dict]:
    """One fresh process of this tree's own ab_query over the subset."""
    cmd = [
        sys.executable,
        os.path.join(tree, "tools", "ab_query.py"),
        *queries,
        "--repeats",
        str(repeats),
        "--sf-dir",
        sf_dir,
    ]
    env = dict(os.environ, PYTHONPATH=tree)
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, env=env, cwd=tree, timeout=1800
        )
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as exc:
        # a hung side must not abort the whole adjudication and lose every
        # previously collected round's draws — salvage whatever lines the
        # process printed before the kill and mark the side incomplete
        stdout = (exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) else (exc.stdout or "")
        stderr = "TIMEOUT after 1800s"
        rc = -1
    lines = []
    for ln in stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    if rc != 0 or len(lines) != len(queries):
        print(
            f"ab_adjudicate: side {tree} returned {rc}, "
            f"{len(lines)}/{len(queries)} parsed lines\n--- stderr tail:\n"
            + "\n".join(stderr.splitlines()[-10:]),
            file=sys.stderr,
        )
    proc_ok = rc == 0 and len(lines) == len(queries)
    for ln in lines:
        ln["process_wall"] = round(time.time() - t0, 1)
        ln["process_complete"] = proc_ok
    return lines


def comparable(rec: dict) -> float:
    """The cross-tree comparable reading from one process's draws."""
    if rec.get("build_inclusive"):
        return rec["draws"][0]
    return min(rec["draws"])


def per_query_verdict(a_vals: list[float], b_vals: list[float]) -> dict:
    """a = HEAD/new tree, b = other/old tree. 'code' only when ranges are
    disjoint with a 20% margin — the r9 lesson is that overlapping draw
    ranges across a +30% single capture mean host drift, not code."""
    lo_a, hi_a = min(a_vals), max(a_vals)
    lo_b, hi_b = min(b_vals), max(b_vals)
    if lo_a > hi_b * 1.2:
        verdict = "code-regression"
    elif lo_b > hi_a * 1.2:
        verdict = "code-improvement"
    else:
        verdict = "host-noise/parity"
    return {
        "verdict": verdict,
        "new_min": lo_a,
        "old_min": lo_b,
        "new_over_old_min_ratio": round(lo_a / lo_b, 3) if lo_b else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--other-tree", required=True)
    ap.add_argument("--other-label", default="other")
    ap.add_argument("--this-label", default="head")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cooldown", type=float, default=60.0)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--question", default="")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sides = {args.this_label: here, args.other_label: args.other_tree}
    raw: dict[str, list[dict]] = {lbl: [] for lbl in sides}
    load_trace = []
    incomplete: dict[str, int] = {lbl: 0 for lbl in sides}
    for rnd in range(args.rounds):
        # swap which side goes first each round so sequence position
        # (box self-heating) can't systematically favor one tree
        order = list(sides) if rnd % 2 == 0 else list(reversed(list(sides)))
        for lbl in order:
            load_trace.append(
                {"round": rnd, "side": lbl, "loadavg": round(os.getloadavg()[0], 2)}
            )
            print(f"round {rnd} side {lbl} ...", flush=True)
            recs = run_side(sides[lbl], args.queries, args.repeats, args.sf_dir)
            if len(recs) != len(args.queries) or any(
                not r.get("process_complete", True) for r in recs
            ):
                incomplete[lbl] += 1
            raw[lbl].extend(recs)
            # no settling needed after the LAST measurement of the run
            if rnd < args.rounds - 1 or lbl != order[-1]:
                time.sleep(args.cooldown)

    per_query = {}
    for q in args.queries:
        a_recs = [r for r in raw[args.this_label] if r["query"] == q]
        b_recs = [r for r in raw[args.other_label] if r["query"] == q]
        a_vals = [comparable(r) for r in a_recs]
        b_vals = [comparable(r) for r in b_recs]
        entry = {
            "build_inclusive": bool(a_recs and a_recs[0].get("build_inclusive")),
            f"{args.this_label}_comparables": a_vals,
            f"{args.other_label}_comparables": b_vals,
            f"{args.this_label}_all_draws": [r["draws"] for r in a_recs],
            f"{args.other_label}_all_draws": [r["draws"] for r in b_recs],
        }
        if a_vals and b_vals:
            entry.update(per_query_verdict(a_vals, b_vals))
            # a verdict over asymmetric or crash-tainted process counts is
            # visibly weaker — stamp it rather than leaving the reader to
            # count draw lists
            if len(a_vals) != len(b_vals) or any(
                not r.get("process_complete", True) for r in a_recs + b_recs
            ):
                entry["verdict"] += " (incomplete-side data)"
        else:
            entry["verdict"] = "no-data"
        per_query[q] = entry

    doc = {
        "metric": "same_day_ab_per_query_adjudication",
        "question": args.question or (
            f"are the raw full-pass movers code or host-state? "
            f"{args.this_label} vs {args.other_label}"
        ),
        "subset_queries": args.queries,
        "protocol": {
            "alternating": "A/B order swaps each round",
            "rounds": args.rounds,
            "repeats_per_process": args.repeats,
            "cooldown_sec": args.cooldown,
            "fresh_process_per_side_per_round": True,
            "comparable": (
                "min warm draw per process; first draw only for "
                "session-cached (build-inclusive) queries"
            ),
            "verdict_rule": (
                "code only when one side's best exceeds the other side's "
                "worst by >20% (disjoint ranges with margin)"
            ),
        },
        "trees": sides,
        "sf_dir": args.sf_dir,
        "per_query": per_query,
        "incomplete_processes_per_side": incomplete,
        "load_trace": load_trace,
        "ncpus": os.cpu_count(),
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps({q: v["verdict"] for q, v in per_query.items()}, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
