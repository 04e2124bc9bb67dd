"""Encoding / normalization operators (SURVEY.md §2.8, E1-E4).

E1 label encoding reproduces the reference's sklearn LabelEncoder semantics
(`data_processor.py:206-226`): fit = sorted distinct values → 0..n−1; unseen
at transform → −1. Implemented as a broadcast join against the fitted vocab
(a tiny table), so the fact side never shuffles.

E2/E3 standard scaling reproduces sklearn StandardScaler (population std,
ddof=0, `weather_predictor.py:64-66`): one aggregation pass computes μ/σ per
column, then a single projection applies (x−μ)/σ. MLlib's StandardScaler uses
sample std — the ddof note from SURVEY.md §2.8 is handled here explicitly.

E4 per-group mode imputation: see relational.mode_per_group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_label_encoding(df: DataFrame, col: str) -> DataFrame:
    """Fit: sorted distinct non-null values → dense codes 0..n−1 (sklearn
    LabelEncoder assigns codes in sorted order).

    The global rank is computed WITHOUT a single-partition window (a
    ``Window.orderBy`` with no partition key funnels the whole vocabulary
    through one task — fine for bounded categoricals, a straggler for the
    100k+-distinct columns this is now the designated fallback for, see
    :func:`label_encode`): range-repartition the distinct values so
    partition i holds a contiguous sorted slice, rank within each slice,
    then add per-partition offsets (one bounded row per partition,
    collected driver-side like :func:`standardize`'s stats row). The
    range-partitioned vocab is materialized ONCE (``localCheckpoint``)
    before the counts collect — range boundaries come from reservoir
    sampling of a shuffle read, which is NOT re-execution-deterministic,
    so the offsets job and the rank job must read the same partitions."""
    vocab = (
        df.select(F.col(col).cast("string").alias(col))
        .where(F.col(col).isNotNull())
        .distinct()
        .repartitionByRange(F.col(col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # one row per partition — bounded by the partition count, never by n
    counts = {
        r["_pid"]: r["_n"]
        for r in vocab.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        off = F.coalesce(
            F.try_element_at(
                F.create_map(
                    *[
                        x
                        for p, o in sorted(offsets.items())
                        for x in (F.lit(p), F.lit(o))
                    ]
                ),
                F.col("_pid"),
            ),
            F.lit(0),
        )
    else:  # empty vocab: no partitions produced rows
        off = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(col)
    return vocab.withColumn(
        f"{col}_encoded", F.row_number().over(w) - 1 + off
    ).drop("_pid")


def apply_label_encoding(
    df: DataFrame, vocab: DataFrame, col: str, unseen: int = -1,
    broadcast: bool = True,
) -> DataFrame:
    """Transform: broadcast-join the vocab; unseen category → −1 (reference
    `data_processor.py:219-223`). ``broadcast=False`` drops the hint and
    lets Catalyst/AQE pick the join strategy — used by the high-cardinality
    fallback, where forcing a 100k+-row broadcast would be wrong."""
    code = f"{col}_encoded"
    v = vocab.withColumnRenamed(col, "_k")
    out = df.withColumn("_k", F.col(col).cast("string")).join(
        F.broadcast(v) if broadcast else v, on="_k", how="left"
    )
    return out.withColumn(code, F.coalesce(F.col(code), F.lit(unseen))).drop("_k")


def fit_label_encoding_multi(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Fit ALL columns' vocabularies in ONE scan: stack (column, value)
    pairs, aggregate each column's distinct values map-side into a sorted
    array, and posexplode to dense codes 0..n−1 (same sorted-order semantics
    as :func:`fit_label_encoding` / sklearn ``np.unique``).

    One exchange total (the per-column ``collect_set``), versus one
    distinct-shuffle plus one global-window shuffle PER COLUMN for repeated
    single-column fits — at sf0.1 this took the feature pipeline's encode
    stage from three independent scan→shuffle→window job chains to one.
    The collected sets are per-CATEGORICAL-column vocabularies — the same
    "tiny enough to broadcast" contract the apply side already assumes."""
    return _fit_vocab_arrays(df, cols).select(
        "_col", F.posexplode("_ks").alias("_code", "_k")
    )


def _fit_vocab_arrays(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Single-scan fit, pre-explode form: one row per column with its sorted
    distinct-value array (`_ks`). Shared by :func:`fit_label_encoding_multi`
    (which explodes to dense codes) and :func:`label_encode` (which guards
    on ``size(_ks)`` before collecting driver-side)."""
    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("_col"),
                            F.col(c).cast("string").alias("_k"),
                        )
                        for c in cols
                    ]
                )
            ).alias("p")
        )
        .select("p.*")
        .where(F.col("_k").isNotNull())
    )
    return pairs.groupBy("_col").agg(F.array_sort(F.collect_set("_k")).alias("_ks"))


# Above this many distinct values per column, label_encode stops collecting
# the vocabulary driver-side (a plan-sized create_map literal / driver OOM
# risk at 100 TB) and falls back to the distributed broadcast-join path.
MAX_LITERAL_VOCAB = 100_000


def label_encode(
    df: DataFrame,
    cols: Sequence[str],
    unseen: int = -1,
    max_literal_vocab: int = MAX_LITERAL_VOCAB,
    assume_bounded: bool = False,
    fit_df: DataFrame | None = None,
) -> DataFrame:
    """Fit-and-apply on the same frame (the reference fits once per pipeline
    run and reuses; callers wanting reuse should fit separately).

    All vocabularies come from one shared single-scan fit
    (:func:`fit_label_encoding_multi`), collected driver-side — the result
    is per-CATEGORICAL-column vocab rows, bounded exactly like
    :func:`standardize`'s stats row — and applied as map-literal lookups in
    one projection. The fact side never shuffles OR joins: the apply step
    fuses into the surrounding codegen stage, where the previous
    one-broadcast-join-per-column shape cost the feature pipeline three
    extra AQE stage materializations at sf0.1 (r7 adjudication).

    Cardinality guard (VERDICT r07 #2): a column with more than
    ``max_literal_vocab`` distinct values (user_id-shaped) would OOM the
    driver collect or explode the Catalyst plan with a 100k+-entry map
    literal. Columns are classified by a map-side HLL census
    (``approx_count_distinct``, one cheap pass) BEFORE any vocabulary array
    exists — size-checking the ``collect_set`` output instead would already
    have materialized an over-cap column's full array in one executor
    aggregation buffer, i.e. the guard would fire only after the memory it
    guards against was spent. Over-cap columns are encoded through the
    distributed :func:`fit_label_encoding` → :func:`apply_label_encoding`
    join path — same sorted-order/unseen=-1 semantics, no plan-sized
    literal. The ±5 % sketch error is benign at the boundary: a misread
    column either falls back (still correct, join path) or collects a
    ~cap-sized array (MBs); a second, executor-side size check keeps even
    a pathologically undercounted column's array off the driver. Lookups
    use ``try_element_at`` (NULL for a missing key under ANSI mode, where
    ``element_at`` would throw MAP_KEY_DOES_NOT_EXIST and make the
    documented unseen→−1 contract unreachable on any fit/apply divergence
    — ADVICE r07).

    ``assume_bounded=True`` skips the census pass: the CALLER asserts every
    column is a schema-bounded categorical (an enum-like weather condition,
    not an id) — used by the feature pipeline, whose three categoricals are
    bounded by construction, so its fit stays one scan. The executor-side
    size check still nulls an over-cap array before the driver collect, so
    a wrong assertion degrades to the join fallback after one oversized
    aggregation buffer rather than ever shipping the vocab to the driver.

    ``fit_df``: optional CHEAPER frame to fit the vocabularies on. The
    caller asserts it yields the same per-column distinct non-null value
    sets as ``df`` — the feature pipeline's categoricals qualify (mode
    imputation only fills nulls with an already-present value and the fit
    ignores nulls; time_of_day is deterministic from timestamp), so its
    eager fit job scans a bare projection of the source instead of the
    full window+join repair plan (r9: that fit job was the largest single
    piece of the pipeline's construction latency)."""
    if not cols:
        return df
    fit_src = fit_df if fit_df is not None else df
    if assume_bounded:
        census = {c: 0 for c in cols}
    else:
        census = fit_src.agg(
            *[F.approx_count_distinct(F.col(c).cast("string")).alias(c) for c in cols]
        ).first()
    lit_cols = [c for c in cols if census[c] <= max_literal_vocab]
    big_cols: list[str] = [c for c in cols if census[c] > max_literal_vocab]
    by_col: dict = {}
    if lit_cols:
        fitted = _fit_vocab_arrays(fit_src, lit_cols).select(
            "_col",
            F.size("_ks").alias("_n"),
            # second-layer driver guard: if the sketch undercounted, the
            # executor already built the array, but it must not reach the
            # driver — null the payload, keep the count, fall back below
            F.when(F.size("_ks") <= max_literal_vocab, F.col("_ks")).alias("_ks"),
        )
        by_col = {r["_col"]: (r["_n"], r["_ks"]) for r in fitted.collect()}
    exprs = {}
    for c in lit_cols:
        n, vocab = by_col.get(c, (0, None))
        if vocab is not None:
            m = F.create_map(
                *[x for code, k in enumerate(vocab) for x in (F.lit(k), F.lit(code))]
            )
            code_col = F.try_element_at(m, F.col(c).cast("string"))
        elif n > 0:  # over-cap: distributed broadcast-join fallback below
            big_cols.append(c)
            continue
        else:  # all-null column: no vocab, everything is "unseen"
            code_col = F.lit(None).cast("int")
        exprs[f"{c}_encoded"] = F.coalesce(code_col, F.lit(unseen))
    out = df.withColumns(exprs)
    for c in big_cols:
        out = apply_label_encoding(
            out, fit_label_encoding(fit_src, c), c, unseen=unseen, broadcast=False
        )
    return out


def apply_vocab_literals(
    df: DataFrame, by_col: dict, unseen: int = -1
) -> DataFrame:
    """Apply caller-collected sorted vocabularies as map-literal lookups —
    the literal branch of :func:`label_encode`, reusable by callers that
    fit the vocabularies in their own bounded job (the feature pipeline's
    one-job fit, r12). ``by_col``: {column: sorted distinct values list};
    an empty list means an all-null column (everything is unseen). Codes,
    lookup expression (``try_element_at``) and the unseen→−1 fallback are
    identical to label_encode's literal path; encoded columns are appended
    in one ``withColumns`` in dict order."""
    exprs = {}
    for c, vocab in by_col.items():
        if vocab:
            m = F.create_map(
                *[x for code, k in enumerate(vocab) for x in (F.lit(k), F.lit(code))]
            )
            code_col = F.try_element_at(m, F.col(c).cast("string"))
        else:  # all-null column: no vocab, everything is "unseen"
            code_col = F.lit(None).cast("int")
        exprs[f"{c}_encoded"] = F.coalesce(code_col, F.lit(unseen))
    return df.withColumns(exprs)


def standardize(
    df: DataFrame, cols: Sequence[str], ddof: int = 0, suffix: str = ""
) -> DataFrame:
    """(x − μ)/σ per column; σ via the requested ddof (0 = sklearn parity).
    One agg pass for all columns, one projection to apply — no MLlib vector
    materialization, stays columnar."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"mu_{c}"))
        std = F.stddev_pop(c) if ddof == 0 else F.stddev_samp(c)
        aggs.append(std.alias(f"sd_{c}"))
    stats = df.agg(*aggs).first()
    exprs = {}
    for c in cols:
        mu = stats[f"mu_{c}"]
        sd = stats[f"sd_{c}"]
        if mu is None or sd is None or sd == 0.0:
            exprs[f"{c}{suffix}"] = F.lit(0.0)
        else:
            exprs[f"{c}{suffix}"] = (F.col(c) - F.lit(mu)) / F.lit(sd)
    return df.withColumns(exprs)
