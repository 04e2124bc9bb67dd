"""Scalar (projection) expressions — SURVEY.md §2.6.

Every function here returns native Column expressions (JVM-side, inside
whole-stage codegen); none drops to Python. Parity shims vs the reference's
pandas semantics are called out inline:

- pandas `dt.dayofweek` is 0=Monday..6=Sunday; Spark `dayofweek` is
  1=Sunday..7=Saturday → `(dayofweek + 5) % 7`.
- pandas `pd.cut` is right-closed with `include_lowest` on the first bin;
  the F.when chains below encode the exact same edges.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def pandas_dayofweek(ts: Column) -> Column:
    """0=Monday..6=Sunday, matching pandas (reference `data_processor.py:61`)."""
    return (F.dayofweek(ts) + 5) % 7


def add_time_features(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Calendar + cyclical + categorical time features (reference
    `data_processor.py:55-84`): hour, day_of_week, month, quarter,
    day_of_year, 6 cyclical encodings, time_of_day bucket, is_weekend."""
    return df.withColumns(time_feature_exprs(ts_col))


def time_feature_exprs(ts_col: str = "timestamp") -> dict:
    """Expression dict for :func:`add_time_features` — exposed so plan
    builders can merge independent stages into one ``withColumns`` call
    (every DataFrame transformation runs an eager Catalyst analysis pass;
    see operators/windows.lag_exprs)."""
    ts = F.col(ts_col)
    hour = F.hour(ts)
    dow = pandas_dayofweek(ts)
    month = F.month(ts)
    return (
        {
            "hour": hour,
            "day_of_week": dow,
            "month": month,
            "quarter": F.quarter(ts),
            "day_of_year": F.dayofyear(ts),
            "hour_sin": F.sin(F.lit(TWO_PI) * hour / F.lit(24.0)),
            "hour_cos": F.cos(F.lit(TWO_PI) * hour / F.lit(24.0)),
            "month_sin": F.sin(F.lit(TWO_PI) * month / F.lit(12.0)),
            "month_cos": F.cos(F.lit(TWO_PI) * month / F.lit(12.0)),
            "day_of_week_sin": F.sin(F.lit(TWO_PI) * dow / F.lit(7.0)),
            "day_of_week_cos": F.cos(F.lit(TWO_PI) * dow / F.lit(7.0)),
            # pd.cut(hour, [0,6,12,18,24], labels=..., include_lowest=True):
            # [0,6] (6,12] (12,18] (18,24]  (reference data_processor.py:75-78)
            "time_of_day": F.when(hour <= 6, "Night")
            .when(hour <= 12, "Morning")
            .when(hour <= 18, "Afternoon")
            .otherwise("Evening"),
            "is_weekend": (dow >= 5).cast("int"),
        }
    )


def heat_index(temp_c: Column, humidity: Column) -> Column:
    """9-term heat-index polynomial (reference `data_processor.py:126-136`,
    Rothfusz regression in Fahrenheit, converted back to Celsius)."""
    t = temp_c * 9.0 / 5.0 + 32.0  # °F
    h = humidity
    hi_f = (
        F.lit(-42.379)
        + 2.04901523 * t
        + 10.14333127 * h
        - 0.22475541 * t * h
        - 0.00683783 * t * t
        - 0.05481717 * h * h
        + 0.00122874 * t * t * h
        + 0.00085282 * t * h * h
        - 0.00000199 * t * t * h * h
    )
    return (hi_f - 32.0) * 5.0 / 9.0


def wind_chill(temp_c: Column, wind_speed: Column) -> Column:
    """Wind-chill, applied only when temp < 10 °C (reference
    `data_processor.py:138-145`); passthrough otherwise."""
    v16 = F.pow(wind_speed * 3.6, F.lit(0.16))  # m/s → km/h
    wc = F.lit(13.12) + 0.6215 * temp_c - 11.37 * v16 + 0.3965 * temp_c * v16
    return F.when(temp_c < 10.0, wc).otherwise(temp_c)


def discomfort_index(temp_c: Column, humidity: Column) -> Column:
    """Thom discomfort index (reference `data_processor.py:148`)."""
    return temp_c - 0.55 * (1.0 - 0.01 * humidity) * (temp_c - 14.5)


def add_weather_indices(
    df: DataFrame,
    temp_col: str = "temperature",
    humidity_col: str = "humidity",
    wind_col: str = "wind_speed",
    temp_max_col: str | None = None,
    temp_min_col: str | None = None,
) -> DataFrame:
    """Derived comfort indices (reference `data_processor.py:121-157`)."""
    return df.withColumns(
        weather_index_exprs(temp_col, humidity_col, wind_col, temp_max_col, temp_min_col)
    )


def weather_index_exprs(
    temp_col: str = "temperature",
    humidity_col: str = "humidity",
    wind_col: str = "wind_speed",
    temp_max_col: str | None = None,
    temp_min_col: str | None = None,
) -> dict:
    """Expression dict for :func:`add_weather_indices` (see
    :func:`time_feature_exprs`)."""
    t, h, w = F.col(temp_col), F.col(humidity_col), F.col(wind_col)
    cols = {
        "heat_index": heat_index(t, h),
        "wind_chill": wind_chill(t, w),
        "discomfort_index": discomfort_index(t, h),
    }
    if temp_max_col and temp_min_col:
        cols["temp_range"] = F.col(temp_max_col) - F.col(temp_min_col)
    return cols


def interaction_exprs(pairs: list[tuple[str, str]]) -> dict:
    """Expression dict for :func:`add_interactions`."""
    return {f"{a}_x_{b}": F.col(a) * F.col(b) for a, b in pairs}


def add_interactions(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Pairwise interaction products (reference `data_processor.py:159-176`)."""
    return df.withColumns(interaction_exprs(pairs))


def temp_change_category(change: Column) -> Column:
    """pd.cut(temp_change, [-inf,-2,2,inf] → Decrease/Stable/Increase) with
    null passthrough (reference `data_processor.py:257-261`)."""
    return (
        F.when(change.isNull(), F.lit(None).cast("string"))
        .when(change <= -2.0, "Decrease")
        .when(change <= 2.0, "Stable")
        .otherwise("Increase")
    )
