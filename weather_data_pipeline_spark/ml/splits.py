"""Train/test splitting: random, temporal, walk-forward (SURVEY.md §2.9 M2-M4).

Temporal semantics match the reference (`weather_predictor.py:71-172`):
chronological 80/20 by row position after a (timestamp, tiebreak) sort, and
expanding-window walk-forward CV with equal test slices (sklearn
TimeSeriesSplit parity: n_splits folds, test size n//(n_splits+1), train is
everything before the test slice).

Scale notes: the exact split needs a global row order — fine up to ~1e9 rows
(a single pass window), but at 100 TB use `temporal_split_by_cutoff`, which
computes a timestamp cutoff from approxQuantile (no global sort, no single
reducer) and splits by predicate, trading exact 80/20 for a pushdown filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def random_split(df: DataFrame, test_size: float = 0.2, seed: int = 42):
    """M2 (reference `weather_predictor.py:191-194`)."""
    train, test = df.randomSplit([1.0 - test_size, test_size], seed=seed)
    return train, test


def _with_pos(df: DataFrame, ts_col: str, tiebreak: str | None):
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.orderBy(*order)
    return df.withColumn("_pos", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy())
    )


def temporal_split(
    df: DataFrame, ts_col: str, test_size: float = 0.2, tiebreak: str | None = None
):
    """M3 exact chronological split (reference `weather_predictor.py:71-105`):
    first ⌊(1−test)·n⌋ rows by time are train, rest test."""
    pos = _with_pos(df, ts_col, tiebreak)
    cut = F.floor((1.0 - test_size) * F.col("_n"))
    train = pos.where(F.col("_pos") <= cut).drop("_pos", "_n")
    test = pos.where(F.col("_pos") > cut).drop("_pos", "_n")
    return train, test


def temporal_split_by_cutoff(
    df: DataFrame, ts_col: str, test_size: float = 0.2, rel_err: float = 0.001
):
    """Cluster-scale temporal split: approxQuantile cutoff + predicate —
    no global sort, filters push down to the scan. approxQuantile only takes
    numeric columns, so quantile over unix micros and compare in micros."""
    probe = df.select(F.unix_micros(F.col(ts_col)).alias("_us"))
    cutoff = probe.approxQuantile("_us", [1.0 - test_size], rel_err)[0]
    us = F.unix_micros(F.col(ts_col))
    return df.where(us <= cutoff), df.where(us > cutoff)


def walk_forward_folds(
    df: DataFrame,
    ts_col: str,
    n_splits: int = 5,
    tiebreak: str | None = None,
    persist: bool = False,
) -> list[tuple[DataFrame, DataFrame]]:
    """M4 expanding-window CV (reference `weather_predictor.py:107-172`,
    sklearn TimeSeriesSplit parity). Returns n_splits (train, test) pairs.

    `persist=True` caches the shared position frame across folds — callers
    that train on every fold should enable it and `unpersist()` the train
    frames' source when done. The default recomputes per fold (correct,
    slightly slower) so query-surface callers leave no cached partitions
    behind."""
    pos = _with_pos(df, ts_col, tiebreak)
    if persist:
        pos = pos.cache()
    folds = []
    for i in range(1, n_splits + 1):
        test_size = F.floor(F.col("_n") / (n_splits + 1))
        test_start = test_size * i + (F.col("_n") % (n_splits + 1)) + 1
        test_end = test_start + test_size - 1
        train = pos.where(F.col("_pos") < test_start).drop("_pos", "_n")
        test = pos.where(
            (F.col("_pos") >= test_start) & (F.col("_pos") <= test_end)
        ).drop("_pos", "_n")
        folds.append((train, test))
    return folds
