"""Window operators — the heart of the reference's feature pipeline.

All per-entity, time-ordered (reference: per-city ordered by timestamp,
`data_processor.py:86-116,151,182-190,246-270`; SURVEY.md §2.5 W1-W10).
Everything is expressed with native Catalyst window expressions — one shuffle
on the partition key serves every window in the same frame spec, and no
Python executes per row. The two reference operators pandas gets from
`Series` methods (limited forward-fill, linear interpolation) are closed-form
compositions of `last/first(..., ignorenulls=True)` windows rather than
`applyInPandas`, so they scale with the JVM and stay spill-aware.

Determinism: the reference sorts by (city, timestamp) and relies on stable
row order; here every window order includes a unique tiebreak column so
results are well-defined even with duplicate timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def entity_window(keys: str | Sequence[str], order: str | Sequence[str]) -> WindowSpec:
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order] if isinstance(order, str) else list(order)
    return Window.partitionBy(*keys).orderBy(*order)


def lag_exprs(
    w: WindowSpec, cols: Sequence[str], lags: Sequence[int] = (1, 3, 6, 12, 24)
) -> dict:
    """Expression dict for :func:`add_lags` — exposed so plan builders can
    merge several independent stages into ONE ``withColumns`` call (each
    DataFrame transformation runs a full eager Catalyst analysis pass over
    the whole accumulated plan; the 70-column feature pipeline's
    construction latency is almost entirely those passes, r9 measured)."""
    return {f"{c}_lag_{n}": F.lag(F.col(c), n).over(w) for c in cols for n in lags}


def add_lags(
    df: DataFrame,
    w: WindowSpec,
    cols: Sequence[str],
    lags: Sequence[int] = (1, 3, 6, 12, 24),
) -> DataFrame:
    """W1: lag features, cols × lags (reference `data_processor.py:86-98`)."""
    return df.withColumns(lag_exprs(w, cols, lags))


def add_lead(df: DataFrame, w: WindowSpec, col: str, n: int, name: str) -> DataFrame:
    """W2: future-value target, `shift(-n)` (reference `data_processor.py:253`)."""
    return df.withColumn(name, F.lead(F.col(col), n).over(w))


def add_rolling_mean(
    df: DataFrame, w: WindowSpec, cols: Sequence[str], window: int = 24, exact: bool = False
) -> DataFrame:
    """W3: trailing row-count rolling mean, min_periods=1 (reference
    `data_processor.py:101-108`). `avg` over a short head frame already
    matches pandas min_periods=1.

    ``exact=True`` accumulates in DECIMAL(18,6) and divides once — the result
    is independent of accumulation order (segment trees, partial aggs), so it
    is bit-identical across engines/cluster sizes. Slightly slower; the
    default double path is the throughput path."""
    return df.withColumns(rolling_mean_exprs(w, cols, window, exact))


def rolling_mean_exprs(
    w: WindowSpec, cols: Sequence[str], window: int = 24, exact: bool = False
) -> dict:
    """Expression dict for :func:`add_rolling_mean` (see :func:`lag_exprs`
    for why builders are exposed)."""
    frame = w.rowsBetween(-(window - 1), 0)
    exprs = {}
    for c in cols:
        if exact:
            s = F.sum(F.col(c).cast("decimal(18,6)")).over(frame).cast("double")
            exprs[f"{c}_rolling_mean_{window}"] = s / F.count(F.col(c)).over(frame)
        else:
            exprs[f"{c}_rolling_mean_{window}"] = F.avg(F.col(c)).over(frame)
    return exprs


def add_rolling_std(
    df: DataFrame,
    w: WindowSpec,
    cols: Sequence[str],
    window: int = 24,
    min_periods: int = 2,
    exact: bool = False,
) -> DataFrame:
    """W4: trailing rolling sample std with min_periods guard (reference
    `data_processor.py:110-116`): null until `min_periods` non-null
    observations are in the frame, matching pandas ddof=1.

    ``exact=True`` uses the closed form sqrt((Σx² − (Σx)²/n)/(n−1)) with both
    sums accumulated in DECIMAL — order-independent and engine-portable."""
    return df.withColumns(rolling_std_exprs(w, cols, window, min_periods, exact))


def rolling_std_exprs(
    w: WindowSpec,
    cols: Sequence[str],
    window: int = 24,
    min_periods: int = 2,
    exact: bool = False,
) -> dict:
    """Expression dict for :func:`add_rolling_std` (see :func:`lag_exprs`)."""
    frame = w.rowsBetween(-(window - 1), 0)
    exprs = {}
    for c in cols:
        n_obs = F.count(F.col(c)).over(frame)
        if exact:
            sx = F.sum(F.col(c).cast("decimal(18,6)")).over(frame).cast("double")
            sxx = (
                F.sum((F.col(c) * F.col(c)).cast("decimal(18,6)"))
                .over(frame)
                .cast("double")
            )
            n = n_obs.cast("double")
            var = F.greatest((sxx - sx * sx / n) / (n - F.lit(1.0)), F.lit(0.0))
            std = F.sqrt(var)
        else:
            std = F.stddev_samp(F.col(c)).over(frame)
        exprs[f"{c}_rolling_std_{window}"] = F.when(n_obs >= min_periods, std)
    return exprs


def add_diff(df: DataFrame, w: WindowSpec, col: str, name: str) -> DataFrame:
    """W5: first difference within group (reference `data_processor.py:151`)."""
    return df.withColumn(name, F.col(col) - F.lag(F.col(col), 1).over(w))


def add_forward_rolling_sum_positive(
    df: DataFrame, w: WindowSpec, col: str, horizon: int, name: str
) -> DataFrame:
    """W6: `will_rain`-style flag — 1 iff the sum of `col` over the next
    `horizon` rows is > 0 (reference `data_processor.py:264-270`:
    rolling(24).sum().shift(-24) > 0). Matches the pandas NaN tail: null when
    the forward frame is empty (last row of each group), 0/1 otherwise."""
    frame = w.rowsBetween(1, horizon)
    fwd_n = F.count(F.lit(1)).over(frame)
    fwd_sum = F.sum(F.coalesce(F.col(col), F.lit(0.0))).over(frame)
    return df.withColumn(
        name, F.when(fwd_n > 0, (fwd_sum > 0).cast("int"))
    )


def add_ffill_limited(
    df: DataFrame,
    w: WindowSpec,
    cols: Sequence[str],
    limit: int = 3,
    order_rn: Column | None = None,
    suffix: str = "_ffill",
) -> DataFrame:
    """W7: group forward-fill with a gap limit (reference
    `data_processor.py:182-184` `ffill(limit=3)`). No Spark built-in; closed
    form: carry the last non-null value forward only while the distance (in
    rows) from the row that produced it is ≤ limit.
    """
    rn = order_rn if order_rn is not None else F.row_number().over(w)
    out = df.withColumn("_ffrn", rn)
    return out.withColumns(
        ffill_limited_exprs(w, cols, "_ffrn", limit=limit, suffix=suffix)
    ).drop("_ffrn")


def ffill_limited_exprs(
    w: WindowSpec,
    cols: Sequence[str],
    rn_col: str,
    limit: int = 3,
    suffix: str = "_ffill",
) -> dict:
    """Expression dict for :func:`add_ffill_limited` over a PRE-computed
    row-number column ``rn_col`` — exposed so repair pipelines can share one
    row number across fill + interpolation and batch the analysis passes
    (see :func:`lag_exprs`)."""
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    exprs = {}
    for c in cols:
        last_val = F.last(F.col(c), ignorenulls=True).over(cum)
        last_rn = F.last(
            F.when(F.col(c).isNotNull(), F.col(rn_col)), ignorenulls=True
        ).over(cum)
        exprs[f"{c}{suffix}"] = F.when(F.col(c).isNotNull(), F.col(c)).when(
            (last_rn.isNotNull()) & ((F.col(rn_col) - last_rn) <= limit), last_val
        )
    return exprs


def add_interpolate_linear(
    df: DataFrame,
    keys: str | Sequence[str],
    order: str | Sequence[str],
    cols: Sequence[str],
    suffix: str = "_interp",
) -> DataFrame:
    """W8: per-group linear interpolation, limit_direction='both' (reference
    `data_processor.py:186-190` `Series.interpolate`). Closed form over two
    windows instead of `applyInPandas`: for a null row, take the previous and
    next non-null values and linearly weight by row distance; at the edges
    fall back to the nearest non-null (pandas 'both' back/forward fills the
    head/tail).

    Performance: the "next non-null" side is `last(..., ignorenulls)` over a
    REVERSED-order growing frame, not `first(...)` over UNBOUNDED FOLLOWING —
    Spark evaluates shrinking frames by recomputing the frame per row (O(n²)
    per partition; measured 25× slower at 5k rows/group), while growing
    frames stream in O(n). Costs one extra descending sort, no extra shuffle
    (same partitioning)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order] if isinstance(order, str) else list(order)
    w = Window.partitionBy(*keys).orderBy(*[F.col(o) for o in order])
    out = df.withColumn("_irn", F.row_number().over(w))
    return out.withColumns(
        interpolate_linear_exprs(keys, order, cols, "_irn", suffix=suffix)
    ).drop("_irn")


def interpolate_linear_exprs(
    keys: Sequence[str],
    order: Sequence[str],
    cols: Sequence[str],
    rn_col: str,
    suffix: str = "_interp",
) -> dict:
    """Expression dict for :func:`add_interpolate_linear` over a
    PRE-computed row-number column ``rn_col`` (see
    :func:`ffill_limited_exprs`)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(o) for o in order])
    w_rev = Window.partitionBy(*keys).orderBy(*[F.col(o).desc() for o in order])
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w_rev.rowsBetween(Window.unboundedPreceding, 0)
    exprs = {}
    for c in cols:
        v = F.col(c)
        prev_val = F.last(v, ignorenulls=True).over(back)
        prev_rn = F.last(
            F.when(v.isNotNull(), F.col(rn_col)), ignorenulls=True
        ).over(back)
        next_val = F.last(v, ignorenulls=True).over(fwd)
        next_rn = F.last(
            F.when(v.isNotNull(), F.col(rn_col)), ignorenulls=True
        ).over(fwd)
        frac = (F.col(rn_col) - prev_rn).cast("double") / (
            (next_rn - prev_rn).cast("double")
        )
        exprs[f"{c}{suffix}"] = (
            F.when(v.isNotNull(), v.cast("double"))
            .when(prev_val.isNull(), next_val.cast("double"))
            .when(next_val.isNull(), prev_val.cast("double"))
            .otherwise(prev_val + (next_val - prev_val) * frac)
        )
    return exprs


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """W9: global top-k — planned as TakeOrderedAndProject, never a full sort
    (reference `nlargest` / ORDER BY DESC LIMIT)."""
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """Top-k within each group via row_number (beyond-reference utility —
    the Spark-idiomatic replacement for per-group nlargest)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def add_time_rolling_mean(
    df: DataFrame,
    keys: str | Sequence[str],
    ts_col: str,
    cols: Sequence[str],
    window_seconds: int,
    exact: bool = False,
) -> DataFrame:
    """Time-based trailing mean: RANGE frame over event time (beyond the
    reference's row-count rolling — the natural semantics when observations
    are irregularly spaced). Spark RANGE frames need a numeric order key, so
    the frame runs over unix microseconds."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    us = F.unix_micros(F.col(ts_col))
    out = df.withColumn("_us", us)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_us")
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    exprs = {}
    for c in cols:
        if exact:
            s = F.sum(F.col(c).cast("decimal(18,6)")).over(w).cast("double")
            exprs[f"{c}_time_mean_{window_seconds}s"] = s / F.count(F.col(c)).over(w)
        else:
            exprs[f"{c}_time_mean_{window_seconds}s"] = F.avg(F.col(c)).over(w)
    return out.withColumns(exprs).drop("_us")
