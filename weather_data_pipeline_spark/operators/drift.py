"""Distribution-drift checks between two time halves of an event stream.

Beyond-reference mandate (training-data pipeline ops): before a corpus or
feature table feeds a training run, you compare its distribution against the
previous snapshot — PSI (population stability index) for binned numeric
drift, the two-sample Kolmogorov-Smirnov statistic for continuous drift, and
a chi-square independence check for categorical×categorical structure. The
reference's quality layer (`data_processor.py:330-400`) stops at range/null
checks; these are the distributional extension.

All three are aggregation-only plans:

- `psi_table`: one tiny min/max agg (broadcast 1-row) + one groupBy on a
  10-ary bin key. Two scans, one shuffle of 10 groups. Scales trivially.
- `ks_table`: groupBy(value) then an ordered cumulative window. The final
  window is a single global sort over *distinct values* (not rows) —
  bounded by value cardinality. At 100 TB with high-cardinality doubles,
  swap the exact CDF for `approx_percentile`-grid CDFs; the exact form is
  kept because the oracle requires bit-equality.
- `chisq_table`: groupBy on a 35-ary (type, dow) key + window marginals
  over those 35 rows. One shuffle.

Determinism: the time-half split compares `2*unix_micros(ts) <= e0 + e1`
(pure integer arithmetic, identical in DuckDB via `epoch_us`); per-row terms
are IEEE-deterministic scalar math rounded to 6 dp; cross-row totals go
through DECIMAL(18,6) so accumulation order cannot change the result.
`+ 0.0` guards normalize any `-0.0` a rounded term could produce (repr-level
hash parity with the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _w_all():
    # built lazily: Window.partitionBy() needs an active session at call time
    return Window.partitionBy()


def _dsum_over_all(col):
    """Order-independent total of an (already 6-dp-rounded) double column."""
    return F.sum(col.cast("decimal(18,6)")).over(_w_all()).cast("double")


def split_time_halves(ev: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Tag every event with `is_a`: true iff it falls in the first half of
    the observed time range (midpoint by epoch-microsecond integer math)."""
    us = F.unix_micros(F.col(ts_col))
    bounds = ev.agg(
        F.min(us).alias("_e0"), F.max(us).alias("_e1")
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .withColumn("is_a", (us * 2) <= (F.col("_e0") + F.col("_e1")))
        .drop("_e0", "_e1")
    )


def psi_table(
    ev: DataFrame,
    value_col: str = "value",
    bin_width: float = 50.0,
    n_bins: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-bin PSI between the two time halves of `ev`.

    Fixed-width bins (clamped to `n_bins`) keep the bin edges data-independent
    — no quantile pass, so the whole check is one groupBy. Laplace-smoothed
    proportions (`alpha` per bin) make the log terms finite for empty bins.
    Emits one row per observed bin plus the repeated `psi` total.
    """
    tagged = split_time_halves(ev)
    bin_col = F.least(
        F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint"),
        F.lit(n_bins - 1),
    )
    g = tagged.groupBy(bin_col.alias("bin")).agg(
        F.sum(F.col("is_a").cast("bigint")).alias("n_a"),
        F.sum((~F.col("is_a")).cast("bigint")).alias("n_b"),
    )
    tot_a = F.sum("n_a").over(_w_all())
    tot_b = F.sum("n_b").over(_w_all())
    pa = (F.col("n_a") + F.lit(alpha)) / (tot_a + F.lit(alpha * n_bins))
    pb = (F.col("n_b") + F.lit(alpha)) / (tot_b + F.lit(alpha * n_bins))
    term = F.round((pa - pb) * F.log(pa / pb), 6) + F.lit(0.0)
    return (
        g.withColumn("p_a", F.round(pa, 6))
        .withColumn("p_b", F.round(pb, 6))
        .withColumn("psi_term", term)
        .withColumn("psi", F.round(_dsum_over_all(F.col("psi_term")), 6))
        .orderBy("bin")
    )


def ks_table(ev: DataFrame, value_col: str = "value") -> DataFrame:
    """Two-sample KS statistic between the time halves: max CDF gap over the
    pooled distinct values. Returns one row (ks_stat, n_a, n_b)."""
    tagged = split_time_halves(ev)
    g = tagged.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.col("is_a").cast("bigint")).alias("na_v"),
        F.sum((~F.col("is_a")).cast("bigint")).alias("nb_v"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.sum("na_v").over(w_cum).alias("ca"),
        F.sum("nb_v").over(w_cum).alias("cb"),
        F.sum("na_v").over(_w_all()).alias("tot_a"),
        F.sum("nb_v").over(_w_all()).alias("tot_b"),
    )
    # null (not error) divisor when a half is empty: KS is undefined there
    # and ANSI mode (Spark 4 default) turns x/0 into a hard error
    safe_a = F.when(F.col("tot_a") > 0, F.col("tot_a").cast("double"))
    safe_b = F.when(F.col("tot_b") > 0, F.col("tot_b").cast("double"))
    gap = F.abs(F.col("ca") / safe_a - F.col("cb") / safe_b)
    return c.agg(
        (F.round(F.max(gap), 6) + F.lit(0.0)).alias("ks_stat"),
        F.max("tot_a").alias("n_a"),
        F.max("tot_b").alias("n_b"),
    )


def chisq_table(
    ev: DataFrame, cat_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Chi-square independence table for `cat_col` × weekday(ts).

    Emits one row per observed (category, dow) cell with observed/expected
    counts and the cell's chi-square term, plus the repeated total statistic.
    `weekday` is 0=Monday (Spark `weekday` == DuckDB `isodow - 1`).
    """
    g = ev.groupBy(
        F.col(cat_col), F.weekday(F.col(ts_col)).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o_cnt"))
    row_tot = F.sum("o_cnt").over(Window.partitionBy(cat_col))
    col_tot = F.sum("o_cnt").over(Window.partitionBy("dow"))
    n = F.sum("o_cnt").over(_w_all())
    e = (row_tot * col_tot) / n.cast("double")
    # (d * d), not pow(d, 2): plain multiplication is bit-identical across
    # engines; pow's libm path need not be
    d = F.col("o_cnt") - e
    term = F.round((d * d) / e, 6) + F.lit(0.0)
    return (
        g.withColumn("e_cnt", F.round(e, 6))
        .withColumn("chisq_term", term)
        .withColumn("chisq", F.round(_dsum_over_all(F.col("chisq_term")), 6))
        .orderBy(cat_col, "dow")
    )
