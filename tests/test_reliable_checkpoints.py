"""Fault-tolerant checkpointing for the iterative BSP loops (VERDICT r04 #2).

`localCheckpoint` truncates lineage and pins blocks in EXECUTOR storage —
fast, but on a real cluster an executor loss mid-loop loses its blocks and
the truncated lineage cannot recompute them: an hours-long 1000-executor
corpus build dies unrecoverably. `graph.reliable_checkpoints` opts the loops
into `Dataset.checkpoint` against a fault-tolerant checkpoint dir instead.

The kill-and-recompute test simulates TOTAL executor-storage loss after
every superstep (unpersist every persistent RDD, blocking) and asserts:
  - the default localCheckpoint path FAILS under that loss (proving the
    injection is lethal, i.e. the simulation means something), and
  - the reliable path completes with output IDENTICAL to an unperturbed
    run — recovery replays from checkpoint files, not executor blocks.
"""

from __future__ import annotations

import pytest

from weather_data_pipeline_spark.operators import graph


def _nuke_all_blocks(spark) -> None:
    """Simulated cluster-wide executor-storage loss: drop every persisted
    block (blocking, so the loss is visible to the very next job)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in jmap.values():
        rdd.unpersist(True)


def _edges(spark):
    # a 30-node chain (forces many propagation rounds) + a separate clique
    rows = [(i, i + 1) for i in range(30)] + [(100, 101), (101, 102), (100, 102)]
    return spark.createDataFrame(rows, "s long, d long")


def test_reliable_cc_survives_total_block_loss(spark, tmp_path, monkeypatch):
    # pin the distributed BSP loop: the r12 union-find fast path would take
    # this fixture-sized graph and never touch executor blocks at all
    monkeypatch.setattr(graph, "_CC_LOCAL_MAX_ROWS", 0)
    edges = _edges(spark)
    expected = sorted(
        (r.node, r.component)
        for r in graph.connected_components(edges, max_iter=50).collect()
    )
    _nuke_all_blocks(spark)

    # inject loss after every tracked checkpoint
    orig = graph._ckpt_tracked

    def lossy(df, eager=True):
        out = orig(df, eager=eager)
        _nuke_all_blocks(spark)
        return out

    monkeypatch.setattr(graph, "_ckpt_tracked", lossy)

    # default (localCheckpoint) path: lineage is truncated and the blocks
    # are gone -> the loop MUST fail (otherwise the injection proves nothing)
    with pytest.raises(Exception):
        graph.connected_components(edges, max_iter=50).count()

    # reliable path: state lives in checkpoint FILES; identical output
    with graph.reliable_checkpoints(spark, str(tmp_path / "ckpt")):
        got = sorted(
            (r.node, r.component)
            for r in graph.connected_components(edges, max_iter=50).collect()
        )
    assert got == expected
    _nuke_all_blocks(spark)  # clear debris from the failed local run


def test_reliable_mode_pins_no_executor_blocks(spark, tmp_path):
    """In reliable mode `_ckpt_tracked` returns no RDD ids and leaves the
    persistent-RDD map untouched — checkpoint-file lifecycle belongs to the
    ContextCleaner (cleanCheckpoints), not to `_free_ckpt`."""
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    with graph.reliable_checkpoints(spark, str(tmp_path / "ckpt2")):
        out, ids = graph._ckpt_tracked(spark.range(100).selectExpr("id", "id*2 AS y"))
        assert ids == []
        assert out.count() == 100
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set()
    # and the data really is on disk, not just lineage-truncated
    import os

    files = []
    for root, _dirs, names in os.walk(str(tmp_path / "ckpt2")):
        files += [os.path.join(root, n) for n in names]
    assert files, "reliable checkpoint wrote no files"


def test_reliable_pagerank_and_kcore_match_local(spark, tmp_path):
    """The opt-in changes durability, never values: pagerank and k_core emit
    bit-identical results in both modes (ranks are decimal-accumulated and
    12dp-quantized, so no float-order hazard hides a real difference)."""
    edges = _edges(spark)
    pr_local = sorted(
        (r.node, r.rank) for r in graph.pagerank(edges, undirected=True).collect()
    )
    kc_local = sorted(
        (r.node, r.core_degree)
        for r in graph.k_core(edges.selectExpr("s AS id_a", "d AS id_b"), k=2).collect()
    )
    with graph.reliable_checkpoints(spark, str(tmp_path / "ckpt3")):
        pr_rel = sorted(
            (r.node, r.rank) for r in graph.pagerank(edges, undirected=True).collect()
        )
        kc_rel = sorted(
            (r.node, r.core_degree)
            for r in graph.k_core(
                edges.selectExpr("s AS id_a", "d AS id_b"), k=2
            ).collect()
        )
    assert pr_rel == pr_local
    assert kc_rel == kc_local


def _lossy_ckpts(spark, monkeypatch):
    """Patch BOTH checkpoint helpers to nuke every persisted block right
    after each checkpoint materializes — total executor-storage loss after
    every stage of the operator, the worst case an hours-long corpus build
    can meet. similarity.py imports the helpers per-call from graph, so
    patching the graph module attributes covers _ckpt_cand and
    _block_pair_grid too."""
    orig_t, orig_u = graph._ckpt_tracked, graph._ckpt_untracked

    def lossy_t(df, eager=True):
        out = orig_t(df, eager=eager)
        _nuke_all_blocks(spark)
        return out

    def lossy_u(df):
        out = orig_u(df)
        _nuke_all_blocks(spark)
        return out

    monkeypatch.setattr(graph, "_ckpt_tracked", lossy_t)
    monkeypatch.setattr(graph, "_ckpt_untracked", lossy_u)


def test_reliable_semantic_dedup_survives_total_block_loss(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r05 next #3: `semantic_dedup_keep_list` is exactly the
    hours-long corpus-build stage the reliable opt-in exists for (LSH
    candidates → exact cosine edges → BSP connected components). Simulate
    total block loss after every checkpoint: the local path must die, the
    reliable path must complete bit-identical to the unperturbed run."""
    from weather_data_pipeline_spark.operators.similarity import (
        semantic_dedup_keep_list,
    )
    from weather_data_pipeline_spark.sources.tables import load_table

    # pin the distributed CC loop (see test_reliable_cc_...): the loss
    # injection needs per-round executor blocks to exist
    monkeypatch.setattr(graph, "_CC_LOCAL_MAX_ROWS", 0)
    emb = load_table(spark, sf_dir, "embeddings")
    expected = sorted(
        tuple(r) for r in semantic_dedup_keep_list(emb, threshold=0.4).collect()
    )
    _nuke_all_blocks(spark)
    _lossy_ckpts(spark, monkeypatch)

    with pytest.raises(Exception):
        semantic_dedup_keep_list(emb, threshold=0.4).count()

    with graph.reliable_checkpoints(spark, str(tmp_path / "ckpt_sem")):
        got = sorted(
            tuple(r)
            for r in semantic_dedup_keep_list(emb, threshold=0.4).collect()
        )
    assert got == expected
    _nuke_all_blocks(spark)


def test_reliable_block_pair_grid_survives_total_block_loss(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Same scenario for the exact block-pair-grid operators
    (`_block_pair_grid` + `_ckpt_cand` sites): cosine_near_dup_pairs and
    hard_negatives. Local path dies under post-checkpoint block loss (the
    candidate checkpoint's truncated lineage cannot replay the matmul);
    reliable path completes bit-identical."""
    from weather_data_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs,
        hard_negatives,
    )
    from weather_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exp_pairs = sorted(
        tuple(r) for r in cosine_near_dup_pairs(emb, 0.4, block_rows=64).collect()
    )
    exp_hn = sorted(tuple(r) for r in hard_negatives(emb, block_rows=64).collect())
    _nuke_all_blocks(spark)
    _lossy_ckpts(spark, monkeypatch)

    with pytest.raises(Exception):
        cosine_near_dup_pairs(emb, 0.4, block_rows=64).count()

    with graph.reliable_checkpoints(spark, str(tmp_path / "ckpt_grid")):
        got_pairs = sorted(
            tuple(r)
            for r in cosine_near_dup_pairs(emb, 0.4, block_rows=64).collect()
        )
        got_hn = sorted(
            tuple(r) for r in hard_negatives(emb, block_rows=64).collect()
        )
    assert got_pairs == exp_pairs
    assert got_hn == exp_hn
    _nuke_all_blocks(spark)


def test_reliable_env_var_opt_in(spark, tmp_path, monkeypatch):
    """$SPARK_GRAFT_RELIABLE_CKPT_DIR enables the mode globally — the knob a
    cluster submit script sets without touching call sites."""
    monkeypatch.setenv(
        "SPARK_GRAFT_RELIABLE_CKPT_DIR", str(tmp_path / "ckpt_env")
    )
    assert graph._reliable_on(spark)
    out, ids = graph._ckpt_tracked(spark.range(10))
    assert ids == [] and out.count() == 10
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CKPT_DIR")
    assert not getattr(graph._RELIABLE, "on", False)
