"""Slowly-changing-dimension (SCD2) merge on plain parquet.

CDC upsert with full history: instead of overwriting a changed dimension row
(the reference's `ON CONFLICT DO UPDATE`, `weather_collector.py:314-338`,
keeps only the latest), SCD2 closes the current version (valid_to := change
ts) and appends the new one (valid_to := null). Without Delta/Iceberg MERGE
this is the standard anti-join + union + window emulation — one shuffle on
the business key.

Scale notes: at lake scale you'd partition the dimension by a stable hash of
the key and rewrite only partitions containing changed keys; MERGE INTO on a
table format replaces the whole dance. The transform below is the
engine-agnostic core either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """Bootstrap a history table from a first snapshot."""
    return snapshot.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply a batch of updates to an SCD2 history.

    - unchanged keys: history rows pass through untouched
    - changed keys: the open row (valid_to null) closes at the update ts and
      a new open row is appended
    - new keys: appended as open rows
    Idempotent for a repeated identical batch (no-op when tracked values
    already match the open row)."""
    open_rows = history.where(F.col("valid_to").isNull())
    upd = updates.select(
        key, ts_col, *[F.col(c) for c in tracked_cols]
    ).alias("u")

    changed = (
        upd.join(open_rows.alias("h"), on=key, how="inner")
        .where(
            ~F.struct(*[F.col(f"u.{c}") for c in tracked_cols]).eqNullSafe(
                F.struct(*[F.col(f"h.{c}") for c in tracked_cols])
            )
        )
        .select("u.*")
    )
    brand_new = upd.join(open_rows, on=key, how="left_anti")
    to_insert = changed.unionByName(brand_new).distinct()

    closing_keys = to_insert.select(key, F.col(ts_col).alias("_close_ts"))
    closed = (
        open_rows.join(F.broadcast(closing_keys), on=key, how="inner")
        .withColumn("valid_to", F.col("_close_ts"))
        .drop("_close_ts")
    )
    untouched_open = open_rows.join(
        F.broadcast(closing_keys.select(key)), on=key, how="left_anti"
    )
    already_closed = history.where(F.col("valid_to").isNotNull())

    inserted = to_insert.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    )
    cols = history.columns
    return (
        already_closed.select(cols)
        .unionByName(untouched_open.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(inserted.select(cols))
    )


def scd2_current(history: DataFrame) -> DataFrame:
    return history.where(F.col("valid_to").isNull())


def scd2_as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: rows valid at the given timestamp."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
