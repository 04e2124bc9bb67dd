"""Empirical scaling curve (VERDICT r03 next-round #1): run a representative
query per operator family at sf0.1 (driver fixtures) and the re-keyed
synthetic sf0.3 / sf1.0 replicas (tools/scale_replicate.py), fit a per-query
scaling exponent  t ~ sf^e  (least-squares slope in log-log), and write
BENCH_SCALING.json + a per-family summary.

Interpretation: e ≈ 1 is linear scale-out; e < 1 means fixed scheduling
overhead still dominates at these sizes (the query is cheaper than the
harness); e > 1.3 needs a reason — either the operator is quadratic BY
DEFINITION (exact all-pairs similarity, pair-output queries: flagged in
EXPECTED_SUPERLINEAR) or there's a genuine scale bug worth fixing.

Usage:
    python tools/bench_scaling.py [--build] [--repeat 1] [--timeout 420]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import threading
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

from bench import SESSION_CACHED, family  # noqa: E402
from weather_data_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from weather_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
SCALES: list[tuple[str, float, str, int]] = [
    # (label, relative scale, dir, replica factor)
    ("sf0.1", 1.0, SRC, 1),
    ("sf0.3", 3.0, os.path.join(_REPO, "scaledata", "sf0.3"), 3),
    ("sf1.0", 10.0, os.path.join(_REPO, "scaledata", "sf1.0"), 10),
]

# One-to-a-few representatives per family. ML training queries are excluded
# (MLlib iteration cost, not plan scaling — correctness covers them).
QUERIES = [
    # scan / agg
    "recent_events_scan",
    "topk_events_by_value",
    "group_summary_events",
    "global_stats_events",
    "percentiles_events",
    "duplicate_keys_events",
    # TPC-H joins
    "q1_pricing_summary",
    "q3_shipping_priority",
    "revenue_by_nation",
    "q9_product_profit_by_nation",
    "q21_waiting_supplier",
    # custom joins
    "asof_join_events",
    "band_join_events",
    # windows / time series
    "lag_events",
    "rolling_mean_events",
    "interpolate_events",
    "session_stats_events",
    "cohort_retention_events",
    "zscore_anomaly_events",
    # feature prep
    "feature_pipeline_weather",
    "label_encode_event_type",
    # text
    "token_stats_documents",
    "quality_score_documents",
    "language_id_documents",
    "bm25_scores_documents",
    "bigram_lm_documents",
    "pii_scrub_documents",
    "tfidf_top_terms_documents",
    # dedup
    "exact_dedup_stats_documents",
    "minhash_signatures_documents",
    "minhash_lsh_candidates_documents",
    "simhash_documents",
    "simhash_near_dup_documents",
    "passage_dedup_documents",
    "decontaminate_3gram_documents",
    "incremental_dedup_documents",
    "jaccard_pairs_documents",
    # graph
    "neardup_components_documents",
    "kcore_documents",
    "triangle_stats_documents",
    "pagerank_neardup_documents",
    # similarity
    "cosine_topk_embeddings",
    "ann_lsh_topk_embeddings",
    "semantic_dedup_keep_list_embeddings",
    "cosine_near_dup_embeddings",
    "hard_negatives_embeddings",
    # corpus assembly
    "hash_split_documents",
    "chunk_documents",
    "pack_sequences_documents",
    "training_corpus_manifest",
    # streaming / drift
    "streaming_hourly_agg",
    "psi_value_drift_events",
]

EXPECTED_SUPERLINEAR = {
    "jaccard_pairs_documents": (
        "exact all-pairs Jaccard: pair OUTPUT is quadratic within each "
        "replica by definition; the LSH candidates query is the linear path"
    ),
    "cosine_near_dup_embeddings": (
        "exact all-pairs cosine: O(n²) COMPUTE by definition (block-pair "
        "grid spreads it over tasks); ANN/LSH is the linear path"
    ),
    "hard_negatives_embeddings": (
        "exact different-label argmax: O(n²) compute by definition; "
        "the ANN variant bounds candidates for the linear path"
    ),
}


class _Timeout(Exception):
    pass


def _run_once(spark, name: str, sf_dir: str, timeout: float) -> float:
    """Time one full execution (count() on the final frame); cancel the
    Spark job group on timeout so one runaway query can't eat the budget."""
    sc = spark.sparkContext
    group = f"scaling:{name}"
    sc.setJobGroup(group, name, interruptOnCancel=True)
    cancelled = threading.Event()

    def _cancel():
        cancelled.set()
        sc.cancelJobGroup(group)

    timer = threading.Timer(timeout, _cancel)
    timer.start()
    t0 = time.perf_counter()
    try:
        REGISTRY[name].spark(spark, sf_dir).count()
        return time.perf_counter() - t0
    except Exception:
        if cancelled.is_set():
            raise _Timeout(name)
        raise
    finally:
        timer.cancel()
        sc.setJobGroup("", "")
        for t in spark.catalog.listTables():
            if t.name.startswith(("stream_out_", "stateful_out_")):
                spark.catalog.dropTempView(t.name)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true", help="(re)build replicas")
    ap.add_argument("--repeat", type=int, default=2, help="best-of-N per point")
    ap.add_argument("--timeout", type=float, default=420.0, help="per query+scale")
    ap.add_argument("--only", default=None, help="substring filter")
    ap.add_argument(
        "--queries", default=None, help="comma-separated exact query names"
    )
    ap.add_argument(
        "--sf3",
        action="store_true",
        help="add a 30x point (scaledata/sf3.0, built on demand)",
    )
    ap.add_argument(
        "--out", default=os.path.join(_REPO, "BENCH_SCALING.json")
    )
    ap.add_argument(
        "--merge",
        action="store_true",
        help="update the selected queries inside an existing --out file "
        "(keeping everyone else's fits) instead of replacing it wholesale",
    )
    args = ap.parse_args()
    if args.sf3:
        SCALES.append(
            ("sf3.0", 30.0, os.path.join(_REPO, "scaledata", "sf3.0"), 30)
        )

    for _, _, d, factor in SCALES:
        if factor > 1 and (args.build or not os.path.isdir(d)):
            from scale_replicate import replicate

            replicate(SRC, d, factor)

    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    else:
        names = [n for n in QUERIES if (not args.only or args.only in n)]
    spark = get_spark("wdp-bench-scaling")
    # warmup: codegen/JIT + parquet footers
    spark.read.parquet(f"{SRC}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().count()

    results: dict[str, dict] = {}
    for name in names:
        fam = family(name)
        entry = {
            "family": fam,
            "t": {},
            "expected_superlinear": EXPECTED_SUPERLINEAR.get(name),
        }
        if name in SESSION_CACHED:
            # session-cached queries: each timed draw must be BUILD-
            # INCLUSIVE (a repeat at the same scale reads the warm
            # materialized frame and min() would fit the exponent on
            # checkpoint-read times). The per-scale cache key differs by
            # sf_dir and the lease evicts on key switch, so one draw per
            # scale rebuilds — but the very first draw of the session also
            # pays codegen/JIT for the whole subplan, which polluted the
            # smallest scale's point (measured 5.1 s vs 1.9 s warm at
            # sf0.1). Warm up with an UNTIMED draw at the second scale:
            # every timed draw is then a key-switch rebuild on warm JIT.
            try:
                _run_once(spark, name, SCALES[1][2], args.timeout)
            except Exception:
                pass  # warmup only; the timed draws surface real errors
        for label, scale, sf_dir, _ in SCALES:
            try:
                draws = 1 if name in SESSION_CACHED else args.repeat
                t = min(
                    _run_once(spark, name, sf_dir, args.timeout)
                    for _ in range(draws)
                )
                entry["t"][label] = round(t, 4)
            except _Timeout:
                entry["t"][label] = -2.0  # timed out
                break  # larger scales would also blow the budget
            except Exception as exc:  # errored: visible, not dropped
                entry["t"][label] = -1.0
                entry["err"] = f"{type(exc).__name__}: {exc}"[:300]
                break
        pts = [
            (math.log(s), math.log(entry["t"][lbl]))
            for lbl, s, _, _ in SCALES
            if entry["t"].get(lbl, -1) > 0
        ]
        if len(pts) >= 2:
            n = len(pts)
            mx = sum(x for x, _ in pts) / n
            my = sum(y for _, y in pts) / n
            denom = sum((x - mx) ** 2 for x, _ in pts)
            entry["exponent"] = round(
                sum((x - mx) * (y - my) for x, y in pts) / denom, 3
            )
        entry["fit_points"] = len(pts)
        results[name] = entry
        print(
            f"{name:45s} {fam:16s} "
            + " ".join(f"{lbl}={entry['t'].get(lbl, float('nan'))}" for lbl, *_ in SCALES)
            + f" e={entry.get('exponent')}",
            flush=True,
        )

    if args.merge and os.path.exists(args.out):
        with open(args.out) as fh:
            prior = json.load(fh)
        merged = prior.get("queries", {})
        merged.update(results)
        results = merged

    # family summaries only fold in entries fitted on THIS run's scale set:
    # --merge can carry older-schema entries (no expected_superlinear key)
    # or prior 3-point fits whose exponents aren't comparable to the current
    # 4-point fits (ADVICE r05) — those stay in `queries` but are excluded
    # here and listed under `excluded_from_family_summary`.
    cur_fit_points = len(SCALES)
    excluded: list[str] = []
    fams: dict[str, list[float]] = {}
    for name, e in results.items():
        if "exponent" not in e:
            continue
        if e.get("fit_points") != cur_fit_points:
            excluded.append(name)
            continue
        if not e.get("expected_superlinear"):
            fams.setdefault(e["family"], []).append(e["exponent"])
    fam_summary = {
        f: {
            "n": len(v),
            "median_exponent": round(sorted(v)[len(v) // 2], 3),
            "max_exponent": round(max(v), 3),
        }
        for f, v in sorted(fams.items())
    }
    out = {
        "metric": "scaling_curve",
        "scales": {lbl: s for lbl, s, _, _ in SCALES},
        "base_rows": {
            "lineitem": 600_000,
            "events": 100_000,
            "documents": 5_000,
            "embeddings": 2_000,
        },
        "repeat": args.repeat,
        "queries": results,
        "families": fam_summary,
        "excluded_from_family_summary": sorted(excluded),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"families": fam_summary}))
    spark.stop()


if __name__ == "__main__":
    main()
