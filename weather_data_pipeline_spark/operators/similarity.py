"""Similarity search over the `embeddings` table (array<float> column).

- Brute-force cosine top-k: broadcast the (small) query set against the
  corpus; dot products via zip_with + aggregate — JVM higher-order
  functions, no Python, no shuffle except the final per-query top-k.
- Sign-LSH (random hyperplane) bucketing: the scale path. Hyperplanes are
  derived deterministically from md5 so results are replayable and
  oracle-able; candidates only compare within a bucket.
- Cosine near-dup pairs: all-pairs above a threshold (use the LSH variant
  when the corpus is too large for blocked brute force).

Parity: dot products accumulate per-element products as DECIMAL(18,9) —
order-independent, so Spark and the DuckDB oracle produce bit-identical
cosines (embedding floats are cast to double first; both engines do the
same IEEE multiply).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.localrel import literal_df

# --- off-JVM allocation bound + stall probe (VERDICT r08 #2) ---------------
# The block-pair matmuls were the registry's largest single off-JVM
# allocations: a 4096x4096 float64 `sims` matrix is 134 MB PER GRID CELL,
# transiently allocated and freed once per cell in every worker — r8's
# GC-probe retired the JVM-GC hypothesis for cosine_near_dup's rare 3-10x
# wall outliers and event logs put the time task-active off-JVM, consistent
# with allocator/page-fault stalls on these buffers. The matmul is therefore
# CHUNKED over anchor rows so no single allocation exceeds this cap
# (semantics-exact: each anchor row still sees the full partner block, so
# thresholds, diagonal masks and pair-local maxima are unchanged — only the
# transient buffer shape is). 32 MB keeps a worker's peak well under
# glibc's mmap-churn regime while leaving BLAS enough rows per call.
_MATMUL_CAP_MB = float(os.environ.get("SPARK_GRAFT_SIM_MATMUL_CAP_MB", "32"))
_MATMUL_CAP_ELEMS = max(1, int(_MATMUL_CAP_MB * (1 << 20) / 8))

# per-grid-cell instrumentation, env-gated (zero cost when off): each cell
# appends one JSON line {op, wall, majflt, rss_peak_kb, ...} to a
# per-worker-pid file so an outlier window can be decomposed into which cells
# stalled and whether major faults / RSS growth line up with the stall.
_SIM_PROBE = bool(os.environ.get("SPARK_GRAFT_SIM_PROBE"))


def _chunk_rows(n_cols: int, cap: int | None = None) -> int:
    """Anchor-rows per matmul chunk such that chunk*n_cols stays under the
    allocation cap. Callers inside mapInPandas closures must pass ``cap``
    captured DRIVER-side at operator-call time: workers re-import this
    module, so the module constant there is the env default, not whatever
    the driver (or a test monkeypatch) set."""
    cap = _MATMUL_CAP_ELEMS if cap is None else cap
    return max(1, cap // max(n_cols, 1))


def _probe_cell(op: str, wall: float, n_a: int, n_b: int, emitted: int) -> None:
    if not _SIM_PROBE:
        return
    try:
        import json as _json
        import resource
        import time as _time

        ru = resource.getrusage(resource.RUSAGE_SELF)
        with open(f"/tmp/wdp_sim_probe-{os.getpid()}.jsonl", "a") as fh:
            fh.write(
                _json.dumps(
                    {
                        "op": op,
                        "ts": round(_time.time(), 3),
                        "wall": round(wall, 4),
                        "n_a": n_a,
                        "n_b": n_b,
                        "emitted": emitted,
                        "majflt": ru.ru_majflt,  # cumulative for the worker
                        "minflt": ru.ru_minflt,
                        # ru_maxrss is the worker's LIFETIME PEAK RSS, not
                        # current RSS (ADVICE r09) — per-cell samples only
                        # stay flat or grow; the field name says so
                        "rss_peak_kb": ru.ru_maxrss,
                    }
                )
                + "\n"
            )
    except Exception:
        pass  # the probe must never fail a task


def _dot_decimal(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with exact decimal accumulation → double.

    Accumulator is DECIMAL(20,9) with an explicit cast per step: Spark's
    decimal `+` would otherwise grow precision past 38 and silently drop the
    scale to 8 (rounding each partial!). Unit-vector products are < 1, so 11
    integer digits can never overflow and the cast is value-exact."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(18,9)")
    )
    s = F.aggregate(
        prods,
        F.lit(0).cast("decimal(20,9)"),
        lambda acc, v: (acc + v).cast("decimal(20,9)"),
    )
    return s.cast("double")


def _dot_double(a: Column, b: Column) -> Column:
    """Fast double-fold dot product — for RANKING/pruning only (accumulation
    order makes the last ulp engine-dependent, so never emit it)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return _dot_decimal(a, a)


def cosine(a: Column, b: Column) -> Column:
    return _dot_decimal(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b)))


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Precompute ‖v‖² once per vector (decimal-exact) — candidate scoring
    then does ONE dot per pair instead of three."""
    return df.withColumn(out, _norm2(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    The query side is tiny → broadcast; the corpus side streams through one
    codegen'd stage. Two-phase scoring: a fast double dot ranks all pairs
    (per-query top-k via row_number), then the ≤ 5k·|Q| surviving rows get
    the exact decimal cosine for emission — O(n) cheap folds + O(k) exact
    folds instead of 3 exact folds per pair."""
    q = _with_norm(
        emb.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "qv",
        "qn",
    )
    c = _with_norm(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")),
        "nv",
        "nn",
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    fast = pairs.withColumn(
        "_fast_sim",
        _dot_double(F.col("qv"), F.col("nv"))
        / (F.sqrt(F.col("qn")) * F.sqrt(F.col("nn"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_fast_sim"), F.col("neighbor_id"))
    top = fast.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    # EMITTED similarity is quantized to 6 dp (+0.0 kills -0.0) on both the
    # Spark and oracle sides: the per-element float->decimal cast inside
    # the exact dot can differ across engines by one decimal ulp on true
    # binary ties (value-dependent tie direction, pinned r9 on
    # label_centroids: 0.1494140625 -> Spark .063 / DuckDB .062), so any
    # UNROUNDED decimal-derived emission diverges at a large enough sample
    # count. Ranking stays on the unrounded doubles, row sets unchanged.
    return top.select(
        "query_id",
        "neighbor_id",
        (
            F.round(
                _dot_decimal(F.col("qv"), F.col("nv"))
                / (F.sqrt(F.col("qn")) * F.sqrt(F.col("nn"))),
                6,
            )
            + F.lit(0.0)
        ).alias("cosine_sim"),
        F.col("_rk").alias("rank"),
    ).orderBy("query_id", "rank")


def _block_pair_grid(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    extra_cols: tuple[str, ...] = (),
    block_rows: int = 4096,
    n_rows: int | None = None,
) -> tuple[DataFrame, int, list[int]]:
    """Distributed all-pairs scaffold: rows are hash-assigned to ~`block_rows`
    sized blocks, blocks are aggregated once, and every unordered block pair
    (b_a ≤ b_b) is produced by an explode+equi-join — NO driver collect, NO
    CartesianProduct. Shuffle volume is O(n·B·dim) (each block is shipped to
    its B-b_a partners); compute stays the full O(n²) matmul, but spread over
    B(B+1)/2 independent tasks, so the exact operator survives a 100× scale-up
    that the old whole-table driver broadcast could not (driver OOM).

    `n_rows` sizes the grid without a counting job — pass the parquet footer
    row count (or any upper bound; it only sets block granularity). Falls back
    to `emb.count()` when absent, which at 100 TB is a full pre-scan — callers
    that know the table should always pass the hint.

    Returns (pairs, n_blocks, ckpt_ids): pairs has columns blk, blk_b, items,
    items_b where items is array<struct<id, v [, extras...]>>. `ckpt_ids` are
    the block-table checkpoint's pinned RDD ids — callers MUST free them via
    `graph._free_ckpt` once the downstream candidate frame is materialized,
    or every invocation pins a corpus copy in executor storage for the
    session (the leak class the iterative graph loops already fixed)."""
    import math

    from .graph import _ckpt_tracked

    spark = emb.sparkSession
    # a NULL vector has no geometry — it can contribute to no pair; drop it
    # before blocking (the n_rows hint may still count such rows: it only
    # sets block granularity, never correctness)
    emb = emb.where(F.col(vec_col).isNotNull())
    n = n_rows if n_rows is not None else emb.count()
    n_blocks = max(1, math.ceil(n / block_rows))
    fields = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")] + [
        F.col(c).alias(c) for c in extra_cols
    ]
    r = emb.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
        F.struct(*fields).alias("item"),
    )
    # consumed twice (both sides of the pair join): materialize once, with
    # tracked ids so callers can free the blocks after the matmul pass
    blocks, ckpt_ids = _ckpt_tracked(
        r.groupBy("blk").agg(F.collect_list("item").alias("items"))
    )
    left = blocks.withColumn(
        "blk_b", F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1)))
    )
    pairs = left.join(
        blocks.select(F.col("blk").alias("blk_b"), F.col("items").alias("items_b")),
        "blk_b",
    )
    # one heavy matmul per pair row: pin the partition count so AQE can't
    # coalesce the tiny pair-id shuffle into one single-threaded task
    n_pairs = n_blocks * (n_blocks + 1) // 2
    pairs = pairs.repartition(
        max(1, min(n_pairs, 4 * spark.sparkContext.defaultParallelism))
    )
    return pairs, n_blocks, ckpt_ids


# Latest candidate checkpoint per (operator, calling thread):
# (owning applicationId, RDD ids). See _ckpt_cand for the deferred-free
# contract. Keyed per-THREAD (VERDICT r05 wrong #1): two registry queries
# running concurrently on one shared session (the Thrift-server / notebook-
# scheduler pattern) must not free each other's candidate blocks mid-query.
# The bound is then one candidate set per (operator, live thread) — a pooled
# server reuses its worker threads, so this does not grow unboundedly.
_PREV_CAND: dict = {}
_PREV_CAND_LOCK = threading.Lock()


def _ckpt_cand(op: str, df: DataFrame) -> DataFrame:
    """Eager candidate checkpoint with DEFERRED freeing (ADVICE r04): the
    candidate frame feeds the RETURNED lazy plan, so its blocks cannot be
    freed inside this call — instead each invocation frees the PREVIOUS
    same-operator same-thread invocation's candidate blocks. Pinned executor
    storage is then bounded at ONE candidate set per (operator, thread) for
    the session, instead of growing one set per call. Contract: an
    operator's returned frame is valid until the NEXT call of the SAME
    operator FROM THE SAME THREAD — and at most until the creating thread
    EXITS (the registry, bench and driver all consume results before
    re-invoking — the same single-entry rationale as the ML caches,
    plans/queries.py:1395); concurrent threads never evict each other.

    Dead-thread pruning (r8, same policy the ML caches got in r7): each
    call also frees entries whose owning thread no longer exists —
    otherwise a pooled server with thread churn pins one candidate set per
    (operator, dead thread) forever. A frame built on a worker thread must
    therefore be consumed before that thread exits; hand-offs of the LAZY
    frame across a thread's death were already outside the documented
    contract.

    The previous entry is popped only AFTER the new checkpoint job succeeds
    (ADVICE r05): if _ckpt_tracked throws, the prior candidate's ids stay
    registered so the next successful call can still free its blocks.

    The free is guarded by the owning context's applicationId: after a
    session restart RDD ids restart from 0, and freeing a stale id through a
    NEW context could unpersist an unrelated RDD (the id-collision hazard
    ADVICE r04 flags on the ML cache evict path)."""
    from .graph import _ckpt_tracked, _free_ckpt

    spark = df.sparkSession
    app = spark.sparkContext.applicationId
    key = (op, threading.get_ident())
    out, ids = _ckpt_tracked(df)
    with _PREV_CAND_LOCK:
        prev = _PREV_CAND.pop(key, None)
        _PREV_CAND[key] = (app, ids)
        live = {t.ident for t in threading.enumerate()}
        stale = [
            (k, _PREV_CAND.pop(k))
            for k in [k for k in _PREV_CAND if k[1] not in live]
        ]
    if prev is not None and prev[0] == app:
        _free_ckpt(spark, prev[1])
    for _k, (prev_app, prev_ids) in stale:
        if prev_app == app:  # same id-collision guard as the normal evict
            _free_ckpt(spark, prev_ids)
    return out


def _unpack_block(items) -> tuple:
    """items (list of Arrow structs) -> (ids int64[n], mat float64[n,dim])."""
    import numpy as np

    ids = np.fromiter((int(it["id"]) for it in items), dtype=np.int64, count=len(items))
    mat = np.array([it["v"] for it in items], dtype=np.float64)
    return ids, mat


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
    n_rows: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — the EXACT variant, O(n²) by
    definition (see lsh_bucket_topk for the linear-candidate scale path).

    Candidate generation is a block-partitioned distributed matmul
    (`_block_pair_grid`): each unordered block pair is one Arrow-batched
    numpy matmul task — no whole-table driver collect, no broadcast ceiling.
    An epsilon margin on the float prefilter guarantees no true pair is
    lost; survivors (few) are re-scored JVM-side with the exact
    order-independent decimal dot, so emitted values stay
    engine-portable/oracle-exact.

    Lifetime contract (ADVICE r05): the returned DataFrame replays from an
    eager candidate checkpoint whose blocks are freed by the NEXT
    `cosine_near_dup_pairs` call from the SAME thread — consume (collect/
    write) the result before re-invoking the operator on that thread, or a
    later action on the earlier frame fails with a 'checkpoint block not
    found' error (localCheckpoint truncates lineage, so there is no
    recompute path). Calls from different threads never evict each other
    (see `_ckpt_cand`)."""
    import numpy as np
    import pandas as pd

    from .graph import _free_ckpt

    pairs, _, grid_ids = _block_pair_grid(
        emb, id_col, vec_col, block_rows=block_rows, n_rows=n_rows
    )
    cut = threshold - 1e-6
    cap = _MATMUL_CAP_ELEMS  # captured by value into the worker closure

    def gen_pairs(batches):
        import time as _time

        for pdf in batches:
            out_a: list = []
            out_b: list = []
            for blk, blk_b, items, items_b in zip(
                pdf["blk"], pdf["blk_b"], pdf["items"], pdf["items_b"]
            ):
                t_cell = _time.perf_counter()
                cell_emitted = 0
                ids_a, mat_a = _unpack_block(items)
                if blk == blk_b:
                    ids_b, mat_b = ids_a, mat_a
                else:
                    ids_b, mat_b = _unpack_block(items_b)
                na = np.sqrt((mat_a * mat_a).sum(axis=1))
                nb = np.sqrt((mat_b * mat_b).sum(axis=1))
                # chunk over anchor rows so the sims buffer never exceeds
                # the allocation cap (exact: each anchor row still sees the
                # whole partner block — see _MATMUL_CAP_MB block comment)
                step = _chunk_rows(len(ids_b), cap)
                for a0 in range(0, len(ids_a), step):
                    ma = mat_a[a0 : a0 + step]
                    sims = (ma @ mat_b.T) / np.outer(na[a0 : a0 + step], nb)
                    mask = sims >= cut
                    if blk == blk_b:
                        # diagonal: keep the strict upper triangle by id so
                        # each unordered pair (and self-pairs) is emitted
                        # exactly once
                        mask &= ids_b[None, :] > ids_a[a0 : a0 + step, None]
                    ai, bi = np.nonzero(mask)
                    pa, pb = ids_a[a0 + ai], ids_b[bi]
                    # cross blocks: orient as (lo, hi); hash-blocking puts
                    # each unordered pair in exactly ONE grid cell, so no
                    # duplicates
                    out_a.append(np.minimum(pa, pb))
                    out_b.append(np.maximum(pa, pb))
                    cell_emitted += len(pa)
                _probe_cell(
                    "cosine_near_dup_pairs",
                    _time.perf_counter() - t_cell,
                    len(ids_a),
                    len(ids_b),
                    cell_emitted,
                )
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                    }
                )

    # materialize the (small) surviving-candidate set eagerly: the exact
    # re-score below — and any caller action after it — replays from this
    # checkpoint instead of re-running the full O(n²) block matmul, and it
    # lets us free the corpus-sized block-table checkpoint right away; the
    # candidate blocks themselves are freed by the NEXT call (_ckpt_cand)
    cand = _ckpt_cand(
        "cosine_near_dup_pairs",
        pairs.mapInPandas(gen_pairs, schema="id_a long, id_b long"),
    )
    _free_ckpt(emb.sparkSession, grid_ids)
    a = _with_norm(
        emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")), "va", "na"
    )
    b = _with_norm(
        emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")), "vb", "nb"
    )
    exact = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine_sim",
            _dot_decimal(F.col("va"), F.col("vb"))
            / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
    )
    return (
        # threshold gate on the UNROUNDED exact value (both engines gate on
        # the same expression); only the EMISSION is quantized to 6 dp —
        # see cosine_topk for the engine-tie rationale
        exact.where(F.col("cosine_sim") >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            (F.round(F.col("cosine_sim"), 6) + F.lit(0.0)).alias("cosine_sim"),
        )
        .orderBy("id_a", "id_b")
    )


# --- deterministic sign-LSH ------------------------------------------------
def _plane_sign_values(dim: int, plane: int) -> list[float]:
    """±1 hyperplane components r[plane][i] from md5(plane:i) parity —
    deterministic, no stored model. Computed DRIVER-SIDE: the values are
    row-independent, so evaluating the md5 inside the per-row lambda (the
    previous shape) re-hashed dim × n_planes times per row — the md5s
    dominated the whole LSH job (~4M hashes at sf0.1)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:15], 16) & 1 == 1
        else -1.0
        for i in range(dim)
    ]


def _hyperplane_signs(vec: Column, dim: int, plane: int) -> Column:
    """Sign bit of <vec, r[plane]> with the ±1 components embedded as an
    array literal; the fold accumulates in the same element order as the
    previous per-row-md5 form, so bucket assignments are bit-identical."""
    signs = F.array(*[F.lit(s) for s in _plane_sign_values(dim, plane)])
    proj = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj > 0).cast("int")


def add_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Sign-LSH bucket id: n_planes random-hyperplane sign bits packed into
    an int. Vectors in the same bucket are ANN candidates; expected bucket
    count 2^n_planes keeps candidate sets ~corpus/2^n_planes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + (_hyperplane_signs(F.col(vec_col), dim, p) * F.lit(2**p))
    return df.withColumn("lsh_bucket", bucket)


def lsh_planes_for(
    n_rows: int, target_bucket: int = 32, min_planes: int = 6
) -> int:
    """Scale-out rule for the sign-LSH bucket count: planes =
    max(min_planes, ceil(log2(n_rows / target_bucket))), i.e. bucket count
    grows WITH the corpus so expected occupancy stays ~target_bucket.

    With a FIXED plane count the bucket count is constant, occupancy grows
    linearly and the in-bucket candidate equi-join quadratically — measured
    scaling exponent ≈1.5 on the sf0.1→sf1.0 replicas (BENCH_SCALING.json)
    before this rule. Corpora ≤ 2^min_planes·target rows (all driver-scale
    fixtures) keep exactly min_planes, so the 6-plane DuckDB oracle stays
    bit-identical at sf0.001/0.01."""
    import math

    if n_rows <= target_bucket:
        return min_planes
    return max(min_planes, math.ceil(math.log2(n_rows / target_bucket)))


def lsh_bucket_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """ANN top-k within LSH buckets: candidates come from an equi-join on the
    bucket id (linear + one shuffle instead of O(n²)); exact cosine re-rank
    inside each bucket. Recall < 1 by construction — this is the 100 TB
    fallback when brute force is off the table.

    Two-phase scoring like cosine_topk: norms are precomputed once per
    vector, the in-bucket ranking uses the cheap double fold, and only the
    k survivors per query get the exact decimal cosine (3 decimal folds per
    PAIR would dominate the whole job).

    Parallelism is PINNED through the two fan-out hazards (round-5 profiling
    — the per-pair cosine was running in 3 tasks at sf3.0, 32 cores idle):
    (a) a small-file corpus scan spreads over the cluster before the
    HOF-heavy bucket assignment (no-op at 100 TB where the scan already has
    plenty of splits — gated on the actual partition count); (b) the bucket
    join's output is ~occupancy× larger than its inputs, and AQE sizes
    post-shuffle partitions on INPUT bytes, so the expensive per-pair stage
    inherits a handful of coalesced partitions — an explicit repartition on
    query_id (the distribution the top-k window needs anyway, so no second
    exchange) fans the work back out."""
    spark = emb.sparkSession
    par = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    with_b = _with_norm(add_lsh_bucket(emb, vec_col, n_planes), vec_col, "_n2")
    a = with_b.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("_n2").alias("qn"),
        "lsh_bucket",
    )
    b = with_b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("_n2").alias("nn"),
        "lsh_bucket",
    )
    pairs = (
        a.join(b, "lsh_bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .repartition(par, F.col("query_id"))
    )
    fast = pairs.withColumn(
        "_fast_sim",
        _dot_double(F.col("qv"), F.col("nv"))
        / (F.sqrt(F.col("qn")) * F.sqrt(F.col("nn"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_fast_sim"), F.col("neighbor_id"))
    return (
        fast.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # 6 dp emission quantization — see cosine_topk for the
            # engine-tie rationale; ranking stays on the unrounded doubles
            (
                F.round(
                    _dot_decimal(F.col("qv"), F.col("nv"))
                    / (F.sqrt(F.col("qn")) * F.sqrt(F.col("nn"))),
                    6,
                )
                + F.lit(0.0)
            ).alias("cosine_sim"),
            F.col("_rk").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# --- IVF (inverted-file) ANN ------------------------------------------------
# KMeans training-input cap (VERDICT r09 #4): at 100 TB the coarse and
# product quantizers train on a bounded sample — training cost must be
# O(cap), only the one-pass assignment/encode scan may grow with the corpus.
# 16k rows is far past codebook saturation for <=256-centroid quantizers.
_KMEANS_TRAIN_CAP = int(os.environ.get("SPARK_GRAFT_KMEANS_TRAIN_CAP", "16384"))
# upper acceptance factor for the sampled class (ADVICE r10): the value hash
# keeps whole duplicate-value groups or none, so the kept class is ~cap only
# IN EXPECTATION over distinct values — past this factor the sample is
# re-tightened so training cost/memory stays bounded on duplicate-heavy
# corpora (exactly this engine's near-dup domain)
_TRAIN_OVERSHOOT = 2


def _hashable_cols(df: DataFrame) -> list:
    """Columns xxhash64 can take: atomics, and arrays/structs of those.
    Excludes MapType (unsupported by hash functions) and UDTs — the
    quantizer frames carry VectorUDT projections (`_vec`, `_sub{j}`) that
    are derived from the hashable array column, so excluding them loses no
    distinguishing information."""
    from pyspark.sql.types import ArrayType, AtomicType, StructType

    def ok(dt) -> bool:
        if isinstance(dt, AtomicType):
            return True
        if isinstance(dt, ArrayType):
            return ok(dt.elementType)
        if isinstance(dt, StructType):
            return all(ok(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in df.schema.fields if ok(f.dataType)]


def _train_frame(
    df: DataFrame,
    hash_col: str,
    cap: int | None = None,
    n_probed: int | None = None,
) -> DataFrame:
    """Deterministic, partitioning-independent training sample of ~``cap``
    rows: keep rows whose xxhash64(hash_col) ≡ 0 (mod ceil(n/cap)). The kept
    row SET depends only on values — identical on 1 core or 1000 executors
    (no sample()/limit() partition dependence), so seeded-KMeans results
    stay replayable. At or under the cap the frame passes through untouched
    (tests and driver fixtures are unchanged); the sizing count only runs
    when the limit-probe shows the corpus exceeds the cap, and at that scale
    the full-corpus assignment scan that follows dwarfs one narrow count.

    Upper guard (ADVICE r10): the value hash admits whole duplicate-value
    groups, so a duplicate-heavy corpus can land FAR more than cap rows in
    the kept class. When the kept class overshoots ``_TRAIN_OVERSHOOT`` ×
    cap, it is re-tightened with a FULL-ROW hash over every hashable column
    (an id column subdivides duplicate-value groups; the filter is still a
    pure function of row values, so still partition-independent and
    replayable), sized by the measured overshoot. Rows identical in every
    hashable column — nothing left to subdivide by — are collapsed with a
    distinct on those columns as the final backstop: exact duplicates add
    nothing to a KMeans fit. The extra counts run only on this guarded
    path, and the result the CALLER caches is what is bounded — the guard
    exists precisely so no unbounded frame is ever materialized."""
    cap = _KMEANS_TRAIN_CAP if cap is None else cap
    # n_probed: the caller already ran a limit(>= cap+1) probe on this exact
    # frame (r12: _coarse_model folds its n_fit probe and this one into ONE
    # action) — reuse it instead of scheduling a second probe job. The
    # at-or-under-cap decision only needs min(n, cap+1).
    probed = (
        min(n_probed, cap + 1)
        if n_probed is not None
        else df.limit(cap + 1).count()
    )
    if probed <= cap:
        return df
    n = df.count()
    mod = -(-n // cap)  # ceil(n / cap)
    kept = df.where(F.pmod(F.xxhash64(F.col(hash_col)), F.lit(mod)) == 0)
    k = kept.count()
    if k <= _TRAIN_OVERSHOOT * cap:
        return kept
    hashables = _hashable_cols(df)
    sub = -(-k // cap)  # ceil(k / cap): tighten by the measured overshoot
    kept = kept.where(
        F.pmod(F.xxhash64(*[F.col(c) for c in hashables]), F.lit(sub)) == 0
    )
    probe = _TRAIN_OVERSHOOT * cap
    if kept.limit(probe + 1).count() <= probe:
        return kept
    # only fully-identical-row mass can still overshoot (the full-row hash
    # spreads distinct rows uniformly); among such rows the non-hashable
    # columns are derived from hashable ones, so any surviving row is the
    # same row — dropDuplicates stays deterministic here
    return kept.dropDuplicates(hashables)


# One fitted coarse quantizer per (applicationId, cache_tag, params) —
# the ann_ivf_topk and ivf_pq_adc_topk registry queries train the IDENTICAL
# seeded coarse KMeans (k=16, seed=42, maxIter=10 over the same corpus
# projection), and one fit costs ~1.8 s WARM at sf0.1 — latency-bound MLlib
# iteration jobs, not data volume. Session-scoped sharing follows the
# _trained_suite precedent in plans/queries.py: the first consumer pays the
# fit (the bench lists both consumers in SESSION_CACHED so a warm re-draw
# can't masquerade as training-free), later consumers ride it. Single entry
# (cleared on key change) so dead sessions'/other corpora's JVM-backed
# models are never pinned — same bound rationale as the ML caches
# (ADVICE r02). cache_tag=None (library callers, tests) bypasses entirely.
_COARSE_MODEL_CACHE: dict = {}
_COARSE_MODEL_LOCK = threading.Lock()


def _coarse_model(
    emb: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int,
    cache_tag=None,
):
    """Fit (or fetch the session's) coarse IVF quantizer. The training
    recipe is EXACTLY ivf_index's historical one — same filtered frame, same
    _train_frame(vec_col) sample, same guards — so a cached model is
    bit-identical to what a fresh per-query fit would produce."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    key = None
    if cache_tag is not None:
        key = (
            emb.sparkSession.sparkContext.applicationId,
            cache_tag,
            vec_col,
            n_centroids,
            seed,
        )
        with _COARSE_MODEL_LOCK:
            if _COARSE_MODEL_CACHE.get("key") == key:
                return _COARSE_MODEL_CACHE["model"]
    emb = emb.where(F.col(vec_col).isNotNull())
    with_vec = emb.withColumn(
        "_vec", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    # ONE limit probe serves both sizing decisions (r12 constant-floor:
    # this was two eager jobs — an n_centroids probe here plus
    # _train_frame's cap+1 probe). c = min(n, probe_rows) with
    # probe_rows >= max(n_centroids, cap+1), so min(n_centroids, c) equals
    # the old min(n_centroids, n) and (c <= cap) equals the old (n <= cap).
    probe_rows = max(n_centroids, _KMEANS_TRAIN_CAP + 1)
    c = with_vec.limit(probe_rows).count()
    n_fit = max(2, min(n_centroids, c))
    km = KMeans(
        k=n_fit, seed=seed, maxIter=10,
        featuresCol="_vec", predictionCol="centroid_id",
    )
    train = _train_frame(with_vec, vec_col, n_probed=c)
    sampled = train is not with_vec
    if sampled:
        train = train.cache()
        if train.count() < n_fit:
            train.unpersist()
            train, sampled = with_vec, False
    model = km.fit(train)
    if sampled:
        train.unpersist()
    if key is not None:
        with _COARSE_MODEL_LOCK:
            _COARSE_MODEL_CACHE["key"] = key
            _COARSE_MODEL_CACHE["model"] = model
    return model


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    cache_tag=None,
):
    """Build an IVF index: KMeans centroids (seeded → replayable) + corpus
    assignment to its nearest centroid. Returns (assigned_df, kmeans_model).
    At 100 TB: centroids train on a sample; assignment is one broadcast map
    stage; the assigned table is written partitioned by centroid id so a
    probe reads only nprobe partitions.

    Precondition (ADVICE r05): the corpus must have >= 2 non-null vectors —
    MLlib KMeans' param validator requires k >= 2, so a 0/1-row corpus
    raises from the fit. Every registry caller filters/guards < 2 rows
    before reaching here (the degenerate-input sweep pins this); an index
    over < 2 vectors has no meaningful codebook to return anyway."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # NULL vectors can't train or be assigned to a codebook — drop at entry.
    # Training (sample-bounded, cached, degenerate-guarded — see
    # _coarse_model) is delegated so the fitted model can be shared across
    # the session's quantizer queries; maxIter=10 rationale and the ~cap
    # sample materialization argument (measured 22.0 s vs 9.5 s at 20k
    # vectors) live there too.
    emb = emb.where(F.col(vec_col).isNotNull())
    with_vec = emb.withColumn("_vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = _coarse_model(emb, vec_col, n_centroids, seed, cache_tag=cache_tag)
    assigned = model.transform(with_vec).drop("_vec")
    _ = vector_to_array  # imported for callers building centroid frames
    return assigned, model


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_tag=None,
) -> DataFrame:
    """IVF ANN: score each query only against corpus vectors in its `nprobe`
    nearest centroid cells — candidates shrink ~n_centroids/nprobe-fold vs
    brute force. Exact double cosine re-rank inside the probed cells.
    Recall < 1 by construction (measured in tests)."""
    import numpy as np

    emb = emb.where(F.col(vec_col).isNotNull())  # no geometry, no neighbors
    if emb.limit(2).count() < 2:
        # <2 corpus rows: no codebook to train (KMeans needs k>=2), and the
        # self-excluded neighbor set is empty anyway — well-defined empty
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, rank int"
        )
    assigned, model = ivf_index(emb, n_centroids, vec_col, cache_tag=cache_tag)
    centers = np.array(model.clusterCenters())

    q = assigned.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # nprobe nearest centroids per query: tiny driver-side compute on the
    # collected query vectors (|Q| rows), broadcast back as a probe map
    probes = []
    for row in q.collect():  # small: |Q| query vectors only
        qv = np.array(row.qv, dtype=float)
        d = ((centers - qv) ** 2).sum(axis=1)
        for cid in np.argsort(d)[:nprobe]:
            probes.append((row.query_id, int(cid)))
    spark = emb.sparkSession
    # literal plan, not a pickled-RDD scan: every action on the consuming
    # query re-ran defaultParallelism Python-worker tasks per local frame
    probe_df = literal_df(spark, probes, "query_id long, centroid_id int")

    cand = assigned.join(
        F.broadcast(probe_df), on="centroid_id"
    ).where(F.col(id_col) != F.col("query_id"))
    sim = (
        _dot_double(F.col("qv"), F.col(vec_col))
        / (
            F.sqrt(_dot_double(F.col("qv"), F.col("qv")))
            * F.sqrt(_dot_double(F.col(vec_col), F.col(vec_col)))
        )
    ).alias("cosine_sim")
    scored = cand.join(F.broadcast(q), on="query_id").select(
        "query_id", F.col(id_col).alias("neighbor_id"), sim
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("_rk").alias("rank"))
        .orderBy("query_id", "rank")
    )


# --- Product quantization (PQ) ----------------------------------------------
def pq_encode(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Product-quantize d-dim float vectors into m small integer codes (one
    seeded-KMeans codebook per subspace) — the storage-side companion of the
    IVF index above (IVF+PQ is the standard billion-scale ANN layout).

    Returns one row per vector: (id, codes array<int>, recon_err double =
    L2 distance between the vector and its codebook reconstruction).

    Scale shape: the m codebooks are tiny (k centroids each) and train on a
    sample; encoding is m broadcast hash joins against k-row codebook tables
    plus array HOFs — no shuffle of the embedding table itself, so the plan
    is a single map-side stage per subspace at 100 TB. Stored codes are m
    bytes/vector (64 float32 dims → 4 bytes at m=4, 64× compression).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    emb = emb.where(F.col(vec_col).isNotNull())  # no bytes, no codes
    drow = emb.select(F.size(vec_col).alias("d")).first()
    if drow is None:
        # empty corpus -> no codebooks to train; well-defined empty answer
        return spark.createDataFrame(
            [], f"{id_col} long, codes array<int>, recon_err double"
        )
    d = drow["d"]
    assert d % m == 0, f"dim {d} not divisible into {m} subspaces"
    sub = d // m

    # all m subspace columns in ONE projection, cached across the m KMeans
    # fits: fitting subspace j on a frame whose lineage already stacks j-1
    # transform+join steps re-runs all of them per fit (each fit is many
    # passes) — that made the original loop quadratic in m
    base = emb.select(
        id_col,
        F.col(vec_col).cast("array<double>").alias("_v"),
        *[
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub)
            ).alias(f"_sub{j}")
            for j in range(m)
        ],
    ).cache()
    # per-subspace codebooks can't exceed the corpus row count (KMeans init
    # throws on k > n, its validator requires k >= 2); a single-row corpus
    # needs no codebook at all — one implicit centroid (the vector itself)
    # reproduces it exactly: codes all 0, recon_err 0. The probe reads at
    # most k rows, not the corpus.
    n_avail = base.limit(k).count()
    if n_avail < 2:
        out = base.select(
            id_col,
            F.array(*[F.lit(0) for _ in range(m)]).alias("codes"),
            F.lit(0.0).alias("recon_err"),
        )
        base.unpersist()
        return out
    k = min(k, n_avail)
    # the m subspace codebooks are independent fits over the SAME cached
    # frame — train them on driver threads (CrossValidator-style
    # parallelism; each fit is seeded, so results are order-independent).
    # Populate the cache in ONE pass first: otherwise the m first-pass jobs
    # race to compute the same uncached partitions concurrently.
    # Training input is sample-bounded (VERDICT r09 #4): each fit scans
    # ~_KMEANS_TRAIN_CAP rows of the cached frame, never the full corpus —
    # only the encode joins below touch every row.
    base.count()
    # the sample is its own cached frame (~cap rows, <= _TRAIN_OVERSHOOT x
    # cap even on duplicate-heavy corpora — ADVICE r10 guard): each of the
    # m fits runs ~10 iterations, and filtering the corpus-sized cached base
    # per iteration per fit is strictly worse than one bounded
    # materialization
    train = _train_frame(base, "_v")
    train_sampled = train is not base
    if train_sampled:
        train = train.cache()
        # degenerate-sample guard (whole duplicate groups hash together):
        # fewer sampled rows than k would throw/degrade the codebook fits
        if train.count() < k:
            train.unpersist()
            train, train_sampled = base, False
    from concurrent.futures import ThreadPoolExecutor

    def _fit_sub(j: int):
        return KMeans(
            k=k,
            seed=seed + j,
            maxIter=10,
            featuresCol=f"_sub{j}",
            predictionCol=f"code_{j}",
            initMode="k-means||",
        ).fit(train)

    with ThreadPoolExecutor(max_workers=m) as ex:
        models = list(ex.map(_fit_sub, range(m)))
    if train_sampled:
        train.unpersist()
    df = base
    err_terms = []
    for j, model in enumerate(models):
        df = model.transform(df)
        codebook = literal_df(
            spark,
            [
                (int(c), [float(x) for x in center])
                for c, center in enumerate(model.clusterCenters())
            ],
            f"code_{j} int, _cent{j} array<double>",
        )
        df = df.join(F.broadcast(codebook), on=f"code_{j}")
        # squared residual of this subspace: Σ (x_i - c_i)²
        err_terms.append(
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("_v"), j * sub + 1, sub),
                    F.col(f"_cent{j}"),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    total_sq = err_terms[0]
    for t in err_terms[1:]:
        total_sq = total_sq + t
    out = df.select(
        id_col,
        F.array(*[F.col(f"code_{j}") for j in range(m)]).alias("codes"),
        F.sqrt(total_sq).alias("recon_err"),
    )
    # models are fitted (actions done); the lazy result recomputes base's
    # cheap projection rather than holding cached partitions forever
    base.unpersist()
    return out


def ivf_pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    refine_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    cache_tag=None,
) -> DataFrame:
    """IVF + PQ asymmetric-distance (ADC) search — the billion-scale ANN
    query layout: the coarse quantizer prunes to `nprobe` cells, candidates
    are scored from their m PQ codes via per-query lookup tables (16·m
    doubles per query — no full-vector reads in the scan), and the ADC
    shortlist (k·refine_factor per query) gets an exact L2 re-rank against
    true vectors. With only m codes the ADC ordering is coarse, so the
    shortlist must over-fetch generously; refine IO stays tiny either way.

    Spark shape: the LUT is a tiny (|Q|·m·n_codes)-row frame, broadcast onto
    the posexploded code column; ADC is then one groupBy(query, vec) sum.
    At 100 TB the codes table is m bytes/vector and the only full-vector IO
    is the k·4-row refine join. Deterministic: seeded KMeans, no RNG at
    query time. Recall < 1 by construction (measured in tests)."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    emb = emb.where(F.col(vec_col).isNotNull())  # no geometry, no neighbors
    drow = emb.select(F.size(vec_col).alias("d")).first()
    if drow is None or emb.limit(2).count() < 2:
        # <2 corpus rows: no quantizers to train (KMeans needs k>=2), and
        # the self-excluded neighbor set is empty anyway — well-defined empty
        return spark.createDataFrame(
            [],
            "query_id long, neighbor_id long, adc_dist double, "
            "exact_dist double, rank int",
        )
    d = drow["d"]
    assert d % m == 0
    sub = d // m
    # quantizer sizes can't exceed the corpus row count (KMeans init throws
    # on k > n, validator floor k >= 2); the probe reads at most max(k)
    # rows, not the corpus
    n_avail = emb.limit(max(n_centroids, n_codes)).count()
    n_centroids = max(2, min(n_centroids, n_avail))
    n_codes = max(2, min(n_codes, n_avail))

    # One cached frame carries BOTH quantizers' training inputs (the full
    # vector for the IVF coarse quantizer, the m slices for the PQ
    # codebooks) so all m+1 seeded KMeans fits run concurrently on driver
    # threads — the coarse and product quantizers are trained on raw
    # vectors independently (residual-PQ is the production refinement,
    # same plumbing), so nothing sequences them. Models are identical to
    # the sequential ivf_index-then-PQ shape: same rows, same narrow
    # projection of emb (same partitioning), same seeds.
    base = emb.select(
        id_col,
        F.col(vec_col).cast("array<double>").alias("_v"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_vec"),
        *[
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub)
            ).alias(f"_sub{j}")
            for j in range(m)
        ],
    ).cache()
    # one cache-populating pass first so the fits don't race-compute it
    base.count()
    # sample-bounded training (VERDICT r09 #4): all m+1 quantizer fits scan
    # ~_KMEANS_TRAIN_CAP rows, never the corpus; only the assignment
    # transform + encode joins below are full-corpus stages. The sample is
    # materialized as its own bounded cache so the ~10 iterations per fit
    # read cap rows, not filter-the-corpus
    train = _train_frame(base, "_v")
    train_sampled = train is not base
    if train_sampled:
        train = train.cache()
        # degenerate-sample guard (whole duplicate groups hash together):
        # both quantizers need at least their own k rows to fit
        if train.count() < max(n_centroids, n_codes):
            train.unpersist()
            train, train_sampled = base, False
    from concurrent.futures import ThreadPoolExecutor

    # The coarse quantizer is the IDENTICAL seeded fit ann_ivf_topk trains
    # (same k/seed/maxIter/feature recipe) — fetch it from the session's
    # coarse-model share (_coarse_model; ~1.8 s/fit warm at sf0.1) instead
    # of refitting per query. At or under the training cap the shared
    # recipe trains on exactly the same rows this function's own fit did,
    # so the model (and every downstream code/assignment) is unchanged;
    # past the cap the kept sample follows _coarse_model's canonical
    # hash-on-vec recipe rather than this frame's hash-on-_v one — a
    # training-sample detail of a rows-only, recall-gated surface, pinned
    # by the recall floors in tests.
    def _fit_ivf():
        return _coarse_model(emb, vec_col, n_centroids, seed, cache_tag=cache_tag)

    def _fit_pq(j: int):
        return KMeans(
            k=n_codes,
            seed=seed + 1 + j,
            maxIter=10,
            featuresCol=f"_sub{j}",
            predictionCol=f"code_{j}",
        ).fit(train)

    with ThreadPoolExecutor(max_workers=m + 1) as ex:
        ivf_fut = ex.submit(_fit_ivf)
        pq_models = list(ex.map(_fit_pq, range(m)))
        ivf_model = ivf_fut.result()
    if train_sampled:
        train.unpersist()
    centers = np.array(ivf_model.clusterCenters())
    codebooks = [np.array(mod.clusterCenters()) for mod in pq_models]
    coded = ivf_model.transform(base)
    for mod in pq_models:
        coded = mod.transform(coded)
    codes = coded.select(
        id_col,
        "centroid_id",
        F.array(*[F.col(f"code_{j}") for j in range(m)]).alias("codes"),
    )

    # query vectors + their nprobe cells + ADC lookup tables (driver-side
    # compute over |Q| vectors only)
    qrows = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .collect()  # small: |Q| query vectors only
    )
    probes, luts = [], []
    for row in qrows:
        qv = np.array(row.qv, dtype=float)
        cd = ((centers - qv) ** 2).sum(axis=1)
        for cid in np.argsort(cd)[:nprobe]:
            probes.append((row.query_id, int(cid)))
        for j in range(m):
            qs = qv[j * sub : (j + 1) * sub]
            # iterate the FITTED codebook, not range(n_codes): MLlib KMeans
            # returns fewer than k centers when the subspace has fewer
            # distinct points (duplicate-heavy corpora) — indexing by the
            # requested size was an IndexError on any low-diversity corpus
            for c in range(len(codebooks[j])):
                d2 = float(((codebooks[j][c] - qs) ** 2).sum())
                luts.append((row.query_id, j, c, d2))
    probe_df = literal_df(spark, probes, "query_id long, centroid_id int")
    lut_df = literal_df(spark, luts, "query_id long, j int, code int, d2 double")

    cand = codes.join(F.broadcast(probe_df), "centroid_id").where(
        F.col(id_col) != F.col("query_id")
    )
    exploded = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("j", "code"),
    )
    adc = (
        exploded.join(F.broadcast(lut_df), ["query_id", "j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    shortlist = adc.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= k * refine_factor
    )

    # exact refine: true L2 on the shortlist only (decimal accumulation —
    # order-independent, engine-portable)
    qdf = literal_df(
        spark,
        [(r.query_id, [float(x) for x in r.qv]) for r in qrows],
        "query_id long, qv array<double>",
    )
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    diff2 = F.zip_with(
        F.col("qv"), F.col("nv"), lambda x, y: ((x - y) * (x - y)).cast("decimal(20,9)")
    )
    exact_d2 = F.aggregate(
        diff2, F.lit(0).cast("decimal(22,9)"), lambda a, x: (a + x).cast("decimal(22,9)")
    ).cast("double")
    refined = (
        shortlist.join(F.broadcast(qdf), "query_id")
        .join(nv, "neighbor_id")
        .withColumn("exact_dist", F.sqrt(exact_d2))
    )
    w2 = Window.partitionBy("query_id").orderBy("exact_dist", "neighbor_id")
    out = (
        refined.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc_dist", 6).alias("adc_dist"),
            F.round("exact_dist", 6).alias("exact_dist"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )
    base.unpersist()
    return out


def multi_table_bucket_cols(
    vec_col: str, n_tables: int, planes_per_table: int, dim: int = 64
) -> dict[str, Column]:
    """One packed sign-LSH bucket id per hash table; table t uses planes
    t·planes_per_table … t·planes_per_table + planes_per_table − 1. Fewer
    planes per table = bigger buckets; more tables = another independent
    chance to collide — the standard recall knob for hyperplane LSH."""
    out: dict[str, Column] = {}
    for t in range(n_tables):
        b = F.lit(0)
        for j in range(planes_per_table):
            b = b + (
                _hyperplane_signs(F.col(vec_col), dim, t * planes_per_table + j)
                * F.lit(2**j)
            )
        out[f"_b{t}"] = b
    return out


def semantic_dedup_keep_list(
    emb: DataFrame,
    threshold: float = 0.4,
    n_tables: int = 4,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup decision over embeddings: multi-table
    sign-LSH candidates → exact decimal in-bucket cosine ≥ threshold edges
    → connected components → keep the min-id representative per cluster
    plus every untouched singleton.

    Multi-table (4×4 planes) rather than one deeper table: a single
    6-plane table finds ~0% of true cosine-0.4 pairs on this corpus, while
    4 independent 4-plane tables recover ~56% with ~24% of all-pairs
    candidate mass — the classic L-tables recall/cost trade.

    Fully deterministic (md5-derived hyperplanes, decimal-exact cosines,
    min-label components), so unlike most ANN surfaces this one is exactly
    oracle-able. Scale shape: candidates are linear (explode to
    (table, bucket) keys + equi-join, no all-pairs), components converge in
    O(cluster diameter) BSP rounds, and the final keep decision is two
    dimension-sized joins.

    Parallelism is pinned through the two fan-out hazards (round-5
    profiling, same trap as lsh_bucket_topk): a small-file corpus scan
    spreads before the 16-hyperplane bucket assignment, and the candidate
    set repartitions on id_a before edge verification — the per-pair
    fast+exact cosine folds otherwise inherit the TINY exploded-key join's
    AQE-coalesced partitioning (single-digit tasks for the most expensive
    stage of the query)."""
    from .graph import connected_components

    par = emb.sparkSession.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    tb = _with_norm(emb, vec_col, "_n2").withColumns(
        multi_table_bucket_cols(vec_col, n_tables, planes_per_table)
    )
    ex = tb.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), F.col(f"_b{t}").alias("bucket")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, "tb.tbl", "tb.bucket")
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
        .repartition(par, F.col("id_a"))
    )
    look_a = tb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("_n2").alias("na"),
    )
    look_b = tb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("_n2").alias("nb"),
    )
    # two-phase like cosine_topk: the cheap double fold prunes the candidate
    # mass with an epsilon margin (cannot lose a true edge), then only the
    # few survivors pay the exact decimal dot that makes the final edge set
    # engine-portable — the decimal-everywhere version was 8× slower
    fast = _dot_double(F.col("va"), F.col("vb")) / (
        F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))
    )
    exact = _dot_decimal(F.col("va"), F.col("vb")) / (
        F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))
    )
    edges = (
        cand.join(look_a, "id_a")
        .join(look_b, "id_b")
        .where(fast >= F.lit(threshold - 1e-6))
        .where(exact >= F.lit(threshold))
        .select("id_a", "id_b")
    )
    cc = connected_components(edges, src="id_a", dst="id_b")
    rep = cc.groupBy("component").agg(F.min("node").alias("rep_id"))
    ids = emb.select(F.col(id_col))
    return (
        ids.join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .join(rep, "component", "left")
        .where(F.col("component").isNull() | (F.col(id_col) == F.col("rep_id")))
        .select(id_col, F.col("component").isNotNull().alias("from_dup_cluster"))
        .orderBy(id_col)
    )


def hard_negatives(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    block_rows: int = 4096,
    n_rows: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for every
    vector, the single most-similar vector with a DIFFERENT label — the
    example a batch builder pairs against the anchor.

    Same two-phase shape as cosine_near_dup_pairs: block-pair numpy matmuls
    (`_block_pair_grid` — no whole-table driver collect, no broadcast
    ceiling) rank with doubles; per block pair, every candidate within 1e-6
    of the anchor's PAIR-LOCAL masked max is kept. The pair-local max never
    exceeds the global max, so any candidate within 1e-6 of the global max
    survives its own pair's gate — the union over pairs is a superset of
    the old global-margin set, and the exact decimal re-score + argmax
    (ties by neighbor id) picks the identical winner. Emitted volume is
    ≈ one candidate per (anchor, partner block): O(n·B), tiny next to the
    O(n·B·dim) block shuffle.

    Lifetime contract (ADVICE r05): the returned DataFrame replays from an
    eager candidate checkpoint whose blocks are freed by the NEXT
    `hard_negatives` call from the SAME thread — consume the result before
    re-invoking the operator on that thread (lineage is truncated; a later
    action on the earlier frame cannot recompute freed blocks). Calls from
    different threads never evict each other (see `_ckpt_cand`)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    from .graph import _free_ckpt

    pairs, _, grid_ids = _block_pair_grid(
        emb, id_col, vec_col, extra_cols=(label_col,), block_rows=block_rows,
        n_rows=n_rows,
    )
    cap = _MATMUL_CAP_ELEMS  # captured by value into the worker closure

    def _labs(items) -> "np.ndarray":
        return np.fromiter(
            (int(it[label_col]) for it in items), dtype=np.int64, count=len(items)
        )

    def _mine(ids_a, labs_a, mat_a, na, ids_b, labs_b, mat_b, nb):
        """Anchors (a-side) vs candidates (b-side): per-anchor candidates
        within 1e-6 of the pair-local different-label max. Chunked over
        anchor rows under the allocation cap (exact — every anchor row's
        max and mask still span the whole b side; see _MATMUL_CAP_MB)."""
        got_a: list = []
        got_b: list = []
        step = _chunk_rows(len(ids_b), cap)
        for a0 in range(0, len(ids_a), step):
            la = labs_a[a0 : a0 + step]
            sims = (mat_a[a0 : a0 + step] @ mat_b.T) / np.outer(
                na[a0 : a0 + step], nb
            )
            diff = labs_b[None, :] != la[:, None]
            sims = np.where(diff, sims, -np.inf)
            # a zero-norm (or NaN-component) vector yields NaN cosines for a
            # WHOLE column; left in place, np.max would poison every row's
            # max and silently suppress all candidates in the batch. Map
            # NaN -> -inf: degenerate vectors drop out as anchors AND as
            # candidates, healthy rows keep their true winner.
            sims = np.where(np.isnan(sims), -np.inf, sims)
            rowmax = sims.max(axis=1, initial=-np.inf)
            # two gates beyond the margin: (a) the label mask — without it a
            # row with rowmax -inf admits self/same-label columns via
            # `-inf >= -inf`; (b) rowmax must be FINITE — a zero-norm anchor
            # (all its cosines NaN -> -inf) must emit nothing, or its
            # candidates hit the exact re-score's /0 under ANSI mode
            mask = (
                diff
                & (sims >= (rowmax[:, None] - 1e-6))
                & np.isfinite(rowmax)[:, None]
            )
            ai, bi = np.nonzero(mask)
            got_a.append(ids_a[a0 + ai])
            got_b.append(ids_b[bi])
        return np.concatenate(got_a), np.concatenate(got_b)

    def gen_cand(batches):
        import time as _time

        for pdf in batches:
            out_id: list = []
            out_neg: list = []
            for blk, blk_b, items, items_b in zip(
                pdf["blk"], pdf["blk_b"], pdf["items"], pdf["items_b"]
            ):
                t_cell = _time.perf_counter()
                cell_emitted = 0
                ids_a, mat_a = _unpack_block(items)
                labs_a = _labs(items)
                na = np.sqrt((mat_a * mat_a).sum(axis=1))
                if blk == blk_b:
                    a, b = _mine(ids_a, labs_a, mat_a, na, ids_a, labs_a, mat_a, na)
                    out_id.append(a)
                    out_neg.append(b)
                    cell_emitted += len(a)
                    n_b = len(ids_a)
                else:
                    ids_b, mat_b = _unpack_block(items_b)
                    labs_b = _labs(items_b)
                    nb = np.sqrt((mat_b * mat_b).sum(axis=1))
                    # both directions: A-anchors vs B, B-anchors vs A
                    a, b = _mine(ids_a, labs_a, mat_a, na, ids_b, labs_b, mat_b, nb)
                    out_id.append(a)
                    out_neg.append(b)
                    cell_emitted += len(a)
                    a, b = _mine(ids_b, labs_b, mat_b, nb, ids_a, labs_a, mat_a, na)
                    out_id.append(a)
                    out_neg.append(b)
                    cell_emitted += len(a)
                    n_b = len(ids_b)
                _probe_cell(
                    "hard_negatives",
                    _time.perf_counter() - t_cell,
                    len(ids_a),
                    n_b,
                    cell_emitted,
                )
            if out_id:
                yield pd.DataFrame(
                    {
                        "id": np.concatenate(out_id),
                        "neg_id": np.concatenate(out_neg),
                    }
                )

    # eager checkpoint: every action on the returned frame (count + collect,
    # say) replays from the small candidate set instead of redoing the full
    # O(n²) matmul, and the corpus-sized block table can be freed immediately;
    # the candidate blocks themselves are freed by the NEXT call (_ckpt_cand)
    cand = _ckpt_cand(
        "hard_negatives",
        pairs.mapInPandas(gen_cand, schema="id long, neg_id long"),
    )
    _free_ckpt(emb.sparkSession, grid_ids)
    a = _with_norm(
        emb.select(
            F.col(id_col).alias("id"), F.col(label_col).alias("label"), F.col(vec_col).alias("va")
        ),
        "va",
        "na",
    )
    b = _with_norm(
        emb.select(
            F.col(id_col).alias("neg_id"),
            F.col(label_col).alias("negative_label"),
            F.col(vec_col).alias("vb"),
        ),
        "vb",
        "nb",
    )
    scored = (
        cand.join(a, "id")
        .join(b, "neg_id")
        .withColumn(
            "cosine_sim",
            _dot_decimal(F.col("va"), F.col("vb"))
            / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine_sim"), "neg_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("id").alias(id_col),
            "label",
            F.col("neg_id").alias("hard_negative_id"),
            "negative_label",
            # argmax stays on the unrounded exact decimal; only the
            # EMISSION is quantized (see cosine_topk)
            (F.round(F.col("cosine_sim"), 6) + F.lit(0.0)).alias("cosine_sim"),
        )
    )
