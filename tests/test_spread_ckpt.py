"""Adaptive loop-input re-spread (round 6): `graph._spread_ckpt` must widen
a NARROW, LARGE materialized edge frame (the AQE coalesce-to-2-partitions
imbalance every BSP superstep would otherwise re-read — measured p50 16 ms /
max 10.7 s over 2 tasks at sf1.0) while leaving small frames untouched (an
unconditional spread measured pagerank_neardup 6.7 s → 8.4 s warm at sf0.1:
ten rounds of near-empty scan tasks). Both sides of the threshold are
pinned here, plus the block-lifecycle contract: a fired re-spread FREES the
narrow original's blocks instead of double-pinning the edge set forever.
"""

from __future__ import annotations

from weather_data_pipeline_spark.operators import graph


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_small_narrow_frame_is_not_respread(spark):
    """Below _SPREAD_MIN_ROWS_PER_SLOT x parallelism the spread must NOT
    fire: the re-spread exists for balance on big frames, and on small ones
    it is pure per-task overhead."""
    df = spark.range(100).coalesce(1).selectExpr("id AS s", "id + 1 AS d")
    out, ids = graph._spread_ckpt(*graph._ckpt_tracked(df))
    assert out.rdd.getNumPartitions() == 1  # untouched
    assert out.count() == 100
    graph._free_ckpt(spark, ids)


def test_large_narrow_frame_is_respread_and_original_freed(spark):
    """Above the threshold a 1-partition frame must come back cluster-wide,
    values intact, with the narrow original's checkpoint blocks freed (peak
    pinned storage is briefly 2x, never permanently)."""
    par = spark.sparkContext.defaultParallelism
    n = par * graph._SPREAD_MIN_ROWS_PER_SLOT + 1
    df = spark.range(n).coalesce(1).selectExpr("id AS s", "id + 1 AS d")
    before = _persistent_ids(spark)
    narrow, narrow_ids = graph._ckpt_tracked(df)
    assert narrow.rdd.getNumPartitions() == 1
    out, ids = graph._spread_ckpt(narrow, narrow_ids)
    assert out.rdd.getNumPartitions() == par
    assert out.count() == n
    # the narrow original's blocks were freed; only the spread copy is new
    leftover = _persistent_ids(spark) - before
    assert leftover == set(ids), (
        f"narrow original not freed: {leftover - set(ids)}"
    )
    graph._free_ckpt(spark, ids)


def test_wide_frame_passes_through(spark):
    """A frame already at cluster parallelism is returned as-is — no count
    job, no exchange, same ids."""
    par = spark.sparkContext.defaultParallelism
    df = spark.range(10_000).repartition(par).selectExpr("id AS s", "id + 1 AS d")
    out, ids = graph._ckpt_tracked(df)
    out2, ids2 = graph._spread_ckpt(out, ids)
    assert out2 is out and ids2 is ids
    graph._free_ckpt(spark, ids)
