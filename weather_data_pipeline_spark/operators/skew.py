"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

At 100 TB a handful of hot keys (one city with half the observations, one
user with millions of events) serialize a shuffle partition. Two standard
remedies, both pure DataFrame transforms:

- salted aggregation: groupBy (key, salt) partial agg → groupBy key final
  agg. Decomposable aggregates only (sum/count/min/max — and avg as
  sum+count). The DECIMAL accumulation used engine-wide makes the two-phase
  result bit-identical to the one-phase result.
- salted broadcast join: explode the small side across salt values so the
  big side's hot key spreads over N partitions.

AQE's skew-join splitting (enabled in session.py) handles sort-merge joins
automatically; these utilities cover aggregations and forced-broadcast cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key: str,
    value_col: str,
    n_salts: int = 16,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Two-phase sum/count/avg per key: phase 1 aggregates (key, salt)
    partitions, phase 2 combines the per-salt partials. The salt is a
    deterministic hash of a unique column (replayable), not rand()."""
    salt_src = F.col(tiebreak_col) if tiebreak_col else F.col(value_col)
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_psum").cast("double").alias(f"sum_{value_col}"),
            F.sum("_pcnt").alias("n_rows"),
        )
        .withColumn(
            f"avg_{value_col}",
            F.col(f"sum_{value_col}") / F.col("n_rows").cast("double"),
        )
    )


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Replicate the small side n_salts times and join on (key, salt): the
    big side's hot key spreads across n_salts partitions instead of one."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    small_rep = small.withColumn("_salt", salts)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(*[c for c in big.columns]), F.lit(n_salts))
    )
    return big_salted.join(F.broadcast(small_rep), on=[key, "_salt"]).drop("_salt")
