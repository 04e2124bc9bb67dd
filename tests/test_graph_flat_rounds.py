"""Regression for _strip_plan_origin (round 4): iterative checkpoint loops
must have FLAT per-round driver cost.

The hazard (measured, Spark 4.1): in a loop whose round derives several
frames from the evolving `localCheckpoint` chain and joins them — exactly the
connected_components round body (neighbor messages + union/min-agg + pointer
jump + convergence-count join) — per-round wall time starts DOUBLING after
~13 rounds (0.45 s rounds hit 2.9 s by round 17 and 150 s by round 23) even
though the data, the optimized plan, the job count and the persisted-block
count all stay constant. The compounding rides on the checkpoint Dataset's
origin-plan metadata; `_strip_plan_origin` rebuilds the Dataset as a bare
LogicalRDD leaf, and identical loops then run flat indefinitely.

This test replays the EXACT round body for 20 fixed rounds (past the
measured onset) through `_ckpt_tracked` (which applies the strip) and pins
the flat-cost invariant. Reproduction note: with the strip monkeypatched to
identity, this same loop exhibits 0.44→0.50→0.71→1.39→2.93 s at rounds
13-17 — the early-abort then trips around round 19 and the test fails in
seconds instead of hanging exponentially.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators.graph import _ckpt_tracked, _free_ckpt


def test_cc_round_body_stays_flat_for_20_rounds(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(40)], "s long, d long")
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("s"), F.col("d").alias("d")),
                    F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .localCheckpoint()
    )
    labels, label_ids = _ckpt_tracked(
        und.select(F.col("s").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    # structural half: the stripped checkpoint is a bare leaf, carrying no
    # origin plan for later rounds to compound on
    assert "LogicalRDD" in labels._jdf.queryExecution().optimizedPlan().toString()
    times: list[float] = []
    for rnd in range(20):  # fixed rounds — keep going past convergence
        t0 = time.monotonic()
        msgs = und.join(labels, und.s == labels.node).select(
            F.col("d").alias("node"), "label"
        )
        prop = labels.union(msgs).groupBy("node").agg(F.min("label").alias("label"))
        jump = labels.select(F.col("node").alias("label"), F.col("label").alias("_ll"))
        new_labels, new_ids = _ckpt_tracked(
            prop.join(jump, "label", "left").select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # the convergence-count join (new checkpoint vs old checkpoint) is
        # part of the hazard shape — keep it even though we ignore the value
        (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        _free_ckpt(spark, label_ids)
        labels, label_ids = new_labels, new_ids
        times.append(time.monotonic() - t0)
        if rnd >= 6 and times[-1] > 30 * (sorted(times[:4])[1] + 0.05):
            break  # already exponential — fail below without hanging
    _free_ckpt(spark, label_ids)
    # structural gate (primary): every round's checkpoint must still be a
    # bare LogicalRDD leaf — the origin-strip working is WHAT makes rounds
    # flat, and it cannot be tripped by host contention
    assert "LogicalRDD" in labels._jdf.queryExecution().optimizedPlan().toString()
    early = sorted(times[1:5])[1]  # 2nd-smallest of rounds 2-5 (skip warmup)
    # median of the last 5 rounds (ADVICE r04): a single GC/scheduler stall
    # on a contended host can spike ONE late round; the exponential failure
    # inflates EVERY late round (x8 by round 19, doubling after), which no
    # median can hide
    late = sorted(times[-5:])[2]
    # 10x margin: scheduler noise is ~2x; the regression is >=8x by round 19
    # and doubling every round after — only the exponential failure trips this
    assert len(times) == 20 and late <= max(10 * early, early + 2.0), times
