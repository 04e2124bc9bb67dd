"""Data-quality audit (reference `run_quality_checks`,
`data_processor.py:330-400`): duplicates on key, per-column nulls,
out-of-physical-range counts, freshness — ALL in a single aggregation pass
over one scan (the reference runs four separate eager passes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# physical bounds (reference VALID_RANGES, data_processor.py:316-328)
WEATHER_VALID_RANGES: dict[str, tuple[float, float]] = {
    "temperature": (-60.0, 60.0),
    "humidity": (0.0, 100.0),
    "pressure": (800.0, 1100.0),
    "wind_speed": (0.0, 120.0),
    "cloudiness": (0.0, 100.0),
    "rain_1h": (0.0, 300.0),
}


def quality_report(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """One-row audit frame: n_rows, duplicate-key rows, per-column null
    counts, out-of-range counts, min/max timestamp. One shuffle (the key
    dedup count) + one scan."""
    ranges = {c: r for c, r in (ranges or {}).items() if c in df.columns}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(
                ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))).cast("long")
            ).alias(f"out_of_range_{c}")
        )
    if ts_col:
        aggs.append(F.min(ts_col).alias("min_ts"))
        aggs.append(F.max(ts_col).alias("max_ts"))
    base = df.agg(*aggs)
    dups = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("duplicate_key_rows"))
    )
    return base.crossJoin(dups)


def quality_warnings(report_row, null_ratio_warn: float = 0.3) -> list[str]:
    """Driver-side interpretation of a collected report row (the reference
    logs warnings, `data_processor.py:366-400`)."""
    warnings = []
    d = report_row.asDict()
    n = d["n_rows"] or 0
    if d.get("duplicate_key_rows", 0):
        warnings.append(f"{d['duplicate_key_rows']} rows share a duplicate key")
    for k, v in d.items():
        if k.startswith("nulls_") and n and (v or 0) / n > null_ratio_warn:
            warnings.append(f"column {k[6:]} is {100 * v / n:.0f}% null")
        if k.startswith("out_of_range_") and (v or 0) > 0:
            warnings.append(f"column {k[13:]} has {v} out-of-range values")
    return warnings
