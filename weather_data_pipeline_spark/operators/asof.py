"""As-of join and sessionization — time-series operators Spark lacks natively.

As-of join (pandas `merge_asof` analog): for each left row, attach the most
recent right row at-or-before its timestamp, per key. The distributed
implementation is the union-and-carry trick: tag both streams, union them,
sort once per key, and carry the right side's values forward with
`last(..., ignorenulls=True)` over a growing frame — one shuffle + one sort,
O(n log n) total, no per-row probing and no range-join explosion. (The
pandas-per-group `merge_asof` alternative needs the same shuffle but adds
Python; this stays in the JVM.)

Sessionization: gap-based session ids via lag + conditional cumsum — the
standard two-window formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the latest right row with right.ts <= left.ts,
    matching on `key`. Left columns are preserved; right `value_cols` arrive
    as `<col><suffix>` (null when no earlier right row exists)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        key, ts, *[F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (_side 0 < 1):
    # a right row AT the left timestamp is eligible ("at-or-before")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumns(
        {
            f"{c}{suffix}": F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
            for c in value_cols
        }
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based session ids: a new session starts when the time since the
    previous event of the same key exceeds `gap_seconds`. Two windows over
    one partition exchange (lag → boundary flag → running sum)."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(ts)).over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts)) - F.unix_micros(prev_ts)) > gap_seconds * 1_000_000)
    ).cast("long")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id", F.sum("_new_session").over(cum)
    ).drop("_new_session")


def session_stats(
    df: DataFrame, key: str, ts: str, gap_seconds: int, tiebreak: str | None = None
) -> DataFrame:
    """Per-session aggregates (count, span) from the sessionized frame."""
    s = sessionize(df, key, ts, gap_seconds, tiebreak)
    return (
        s.groupBy(key, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
        .withColumn(
            "duration_seconds",
            (
                F.unix_micros(F.col("session_end")) - F.unix_micros(F.col("session_start"))
            ).cast("double")
            / 1e6,
        )
        .orderBy(key, "session_id")
    )
