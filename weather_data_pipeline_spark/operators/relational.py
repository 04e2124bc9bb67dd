"""Relational operators: scans, filters, aggregations, top-k, correlation.

Implements the reference's projection/filter/aggregation surface
(SURVEY.md §2.2, §2.4: reference `dashboard.py:160-280`,
`quick_db_check.py:18-56`, `data_processor.py:316-421`) as pure
``DataFrame -> DataFrame`` transforms built only from Catalyst-native
expressions — everything here stays inside whole-stage codegen, filters and
projections push down to the parquet scan, and group aggregations get
map-side partial aggregation for free.

Scale notes (100 TB): every function avoids driver-side collection; exact
``countDistinct`` is kept only where the reference semantics demand it and an
``approx`` variant is provided for the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_range_scan(
    df: DataFrame,
    ts_col: str,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Predicate-pushdown time-range scan (reference `data_processor.py:27-53`
    builds the WHERE clause by string concatenation; here Catalyst pushes the
    range into parquet row-group pruning automatically)."""
    out = df
    if start is not None:
        out = out.where(F.col(ts_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        out = out.where(F.col(ts_col) <= F.lit(end).cast("timestamp"))
    return out


def projected_topk(
    df: DataFrame, cols: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """Projected scan + ORDER BY ... LIMIT k (reference `quick_db_check.py:24-29`).
    Spark plans this as TakeOrderedAndProject — no full sort at scale."""
    return df.select(*cols).orderBy(*order).limit(k)


def group_means(df: DataFrame, key: str, value_cols: Sequence[str]) -> DataFrame:
    """Multi-column group mean (reference `dashboard.py:236-241`)."""
    return df.groupBy(key).agg(
        *[F.avg(c).alias(f"avg_{c}") for c in value_cols]
    )


def group_summary(df: DataFrame, key: str, value_col: str, ts_col: str) -> DataFrame:
    """COUNT/AVG/MAX-ts per group (reference `quick_db_check.py:35-44`)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg(value_col).alias(f"avg_{value_col}"),
        F.max(ts_col).alias(f"max_{ts_col}"),
    )


def global_stats(df: DataFrame, value_col: str) -> DataFrame:
    """Grand aggregates: mean/max/min/count (reference `dashboard.py:160-176`)."""
    return df.agg(
        F.avg(value_col).alias("avg_value"),
        F.max(value_col).alias("max_value"),
        F.min(value_col).alias("min_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def count_distinct(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """COUNT(DISTINCT col) (reference `dashboard.py:171`). ``approx=True``
    switches to HyperLogLog++ — the right call at 100 TB where exact distinct
    forces a full shuffle of the key."""
    agg = (
        F.approx_count_distinct(col) if approx else F.countDistinct(col)
    ).alias(f"n_distinct_{col}")
    return df.agg(agg)


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """Group-count sorted desc (reference `dashboard.py:212`,
    `data_quality_report.py:30,36`). Ties broken by key for determinism."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col(col))
    )


def latest_per_group(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """First-row-per-group under DESC time order (reference `dashboard.py:163`
    relies on pandas ordering; Spark makes the order explicit via row_number)."""
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def minmax(df: DataFrame, col: str) -> DataFrame:
    """MIN/MAX over the table (reference `quick_db_check.py:50-56`)."""
    return df.agg(F.min(col).alias(f"min_{col}"), F.max(col).alias(f"max_{col}"))


def null_counts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE pass (reference `data_processor.py:359-364`
    does `df.isnull().sum()`; here a single agg, no per-column jobs)."""
    cols = cols or df.columns
    return df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
            for c in cols
        ]
    )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows whose key occurs more than once (reference
    `data_processor.py:351-356` pandas ``duplicated(keep=False)``)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
        .orderBy(*keys)
    )


def out_of_range_counts(
    df: DataFrame, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Counts outside physical bounds per column, one pass (reference
    VALID_RANGES audit, `data_processor.py:316-328,366-383`)."""
    aggs = []
    for c, (lo, hi) in ranges.items():
        aggs.append(F.sum((F.col(c) < F.lit(lo)).cast("long")).alias(f"below_{c}"))
        aggs.append(F.sum((F.col(c) > F.lit(hi)).cast("long")).alias(f"above_{c}"))
    return df.agg(*aggs)


def column_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """mean/std/min/max/nulls per numeric column, single pass (reference
    `data_processor.py:402-421`). Output: one row per column (unpivoted)."""
    aggs = []
    for c in cols:
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.avg(c).cast("double").alias("mean"),
                F.stddev_samp(c).cast("double").alias("std"),
                F.min(c).cast("double").alias("min"),
                F.max(c).cast("double").alias("max"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            ).alias(c)
        )
    # one wide agg row -> explode to (column, stats) rows
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias("s")
    )
    return stacked.select("s.column", "s.mean", "s.std", "s.min", "s.max", "s.n_null")


def corr_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations (reference `dashboard.py:178-199`),
    computed as one agg of F.corr per pair — a single scan, no VectorAssembler
    materialization."""
    aggs = [
        F.corr(a, b).alias(f"corr_{a}__{b}")
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    ]
    return df.agg(*aggs)


def mode_per_group(df: DataFrame, key: str, cat_col: str) -> DataFrame:
    """Most frequent value per group (reference mode imputation,
    `data_processor.py:193-198`). Deterministic tie-break: higher count first,
    then lexicographically smaller value."""
    counted = df.groupBy(key, cat_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(key).orderBy(F.desc("n"), F.col(cat_col))
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(key, F.col(cat_col).alias(f"mode_{cat_col}"))
    )


def row_null_threshold_drop(df: DataFrame, thresh_ratio: float = 0.7) -> DataFrame:
    """Drop rows with fewer than ``thresh_ratio * ncols`` non-null values
    (reference `data_processor.py:201` ``dropna(thresh=...)``)."""
    n_needed = int(thresh_ratio * len(df.columns))
    non_null = sum(
        (F.col(c).isNotNull().cast("int") for c in df.columns), F.lit(0)
    )
    return df.where(non_null >= F.lit(n_needed))


def null_ratio_column_prune(
    df: DataFrame, candidate_cols: Sequence[str], max_null_ratio: float = 0.3
) -> tuple[DataFrame, list[str]]:
    """Drop columns whose null ratio exceeds the threshold (reference
    `weather_predictor.py:54-59`). One aggregation pass; the collected row is
    tiny (one double per column), so this is cluster-safe."""
    ratios = df.agg(
        *[F.avg(F.col(c).isNull().cast("int")).alias(c) for c in candidate_cols]
    ).first()
    bad = [c for c in candidate_cols if (ratios[c] or 0.0) > max_null_ratio]
    return df.drop(*bad), bad
