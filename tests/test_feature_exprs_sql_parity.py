"""Pin the SQL-string expression twins (plans/feature_exprs_sql) to the
Column-API builders they mirror (operators/windows, functions/scalar,
plans/features.add_targets pass shapes): exact value equality on fixture
data. A drift in literal typing (DECIMAL vs DOUBLE), CASE semantics,
window frames, or operator association shows up here as a value diff
before it can reach the pipeline's oracle hash."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark.functions import scalar
from weather_data_pipeline_spark.operators import windows as W
from weather_data_pipeline_spark.plans import feature_exprs_sql as FSQL
from weather_data_pipeline_spark.plans import features as FP
from weather_data_pipeline_spark.sources.tables import load_events


@pytest.fixture(scope="module")
def weather(spark, sf_dir):
    return FP.events_as_weather(spark, sf_dir).localCheckpoint(eager=True)


def _assert_same(df, col_exprs: dict, sql_exprs: dict, order_cols):
    assert set(col_exprs) == set(sql_exprs)
    a = df.withColumns(col_exprs).orderBy(*order_cols).collect()
    b = df.withColumns({k: F.expr(v) for k, v in sql_exprs.items()}).orderBy(
        *order_cols
    ).collect()
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        for k in col_exprs:
            va, vb = ra[k], rb[k]
            if isinstance(va, float) and isinstance(vb, float):
                assert (va == vb) or (math.isnan(va) and math.isnan(vb)), (
                    k, va, vb,
                )
            else:
                assert va == vb, (k, va, vb)


def test_time_features_parity(weather):
    _assert_same(
        weather,
        scalar.time_feature_exprs("timestamp"),
        FSQL.time_feature_sql("timestamp"),
        ["city", "timestamp"],
    )


def test_lag_rolling_parity(weather):
    w = FP.weather_window()
    col_exprs = {}
    col_exprs.update(W.lag_exprs(w, FP.LAG_COLS, FP.LAGS))
    col_exprs.update(
        W.rolling_mean_exprs(w, FP.LAG_COLS, FP.ROLLING_WINDOW, exact=True)
    )
    col_exprs.update(
        W.rolling_std_exprs(
            w, FP.LAG_COLS, FP.ROLLING_WINDOW, min_periods=2, exact=True
        )
    )
    sql_exprs = {}
    sql_exprs.update(FSQL.lag_sql(FP.LAG_COLS, FP.LAGS))
    sql_exprs.update(FSQL.rolling_mean_sql(FP.LAG_COLS, FP.ROLLING_WINDOW))
    sql_exprs.update(
        FSQL.rolling_std_sql(FP.LAG_COLS, FP.ROLLING_WINDOW, min_periods=2)
    )
    _assert_same(weather, col_exprs, sql_exprs, ["city", "timestamp"])


def test_indices_interactions_parity(weather):
    col_exprs = scalar.weather_index_exprs(
        temp_max_col="temp_max", temp_min_col="temp_min"
    )
    col_exprs.update(scalar.interaction_exprs(FP.INTERACTIONS))
    sql_exprs = FSQL.weather_index_sql(temp_max="temp_max", temp_min="temp_min")
    sql_exprs.update(FSQL.interaction_sql(FP.INTERACTIONS))
    _assert_same(weather, col_exprs, sql_exprs, ["city", "timestamp"])


def test_ffill_interpolate_parity(spark, weather):
    w = FP.weather_window()
    base = weather.withColumn("_rn", F.row_number().over(w))
    col_exprs = W.ffill_limited_exprs(w, FP.FFILL_COLS, "_rn", limit=3, suffix="_ff")
    sql_exprs = FSQL.ffill_limited_sql(FP.FFILL_COLS, "_rn", limit=3, suffix="_ff")
    _assert_same(base, col_exprs, sql_exprs, ["city", "timestamp"])

    filled = base.withColumns({k: F.expr(v) for k, v in sql_exprs.items()})
    i_cols = [f"{c}_ff" for c in FP.FFILL_COLS]
    col_i = W.interpolate_linear_exprs(
        ["city"], ["timestamp"], i_cols, "_rn", suffix="_i"
    )
    sql_i = FSQL.interpolate_linear_sql(i_cols, "_rn", suffix="_i")
    _assert_same(filled, col_i, sql_i, ["city", "timestamp"])


def test_targets_parity(weather):
    w = FP.weather_window()
    first_cols = {
        "temperature_future": F.lead(F.col("temperature"), 24).over(w),
        "temp_change": F.col("temperature") - F.lag(F.col("temperature"), 1).over(w),
    }
    _assert_same(weather, first_cols, FSQL.targets_first_sql(24), ["city", "timestamp"])
    staged = weather.withColumns(
        {k: F.expr(v) for k, v in FSQL.targets_first_sql(24).items()}
    )
    frame = w.rowsBetween(1, 24)
    fwd_n = F.count(F.lit(1)).over(frame)
    fwd_sum = F.sum(F.coalesce(F.col("rain_1h"), F.lit(0.0))).over(frame)
    second_cols = {
        "temp_change_category": scalar.temp_change_category(F.col("temp_change")),
        "will_rain": F.when(fwd_n > 0, (fwd_sum > 0).cast("int")),
    }
    _assert_same(
        staged, second_cols, FSQL.targets_second_sql(24), ["city", "timestamp"]
    )


def test_events_as_weather_projection_parity(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    legacy = ev.select(
        F.concat(F.lit("city_"), (F.col("user_id") % 20).cast("string")).alias("city"),
        F.col("ts").alias("timestamp"),
        (F.col("value") / 10.0).alias("temperature"),
        ((F.col("user_id") * 7) % 100).cast("int").alias("humidity"),
        (F.lit(1000) + (F.col("user_id") % 50)).cast("int").alias("pressure"),
        (F.col("value") / 50.0).alias("wind_speed"),
        ((F.col("user_id") * 13) % 100).cast("int").alias("cloudiness"),
        F.when(
            (F.col("event_type") == "error") & (F.col("value") > 100.0),
            F.col("value") / 100.0,
        )
        .otherwise(F.lit(0.0))
        .alias("rain_1h"),
        (F.col("value") / 10.0 + 1.0).alias("temp_max"),
        (F.col("value") / 10.0 - 1.0).alias("temp_min"),
        F.col("event_type").alias("weather_main"),
        F.concat(F.col("event_type"), F.lit(" conditions")).alias(
            "weather_description"
        ),
    )
    twin = ev.selectExpr(*FSQL.events_as_weather_sql())
    assert [f.name for f in legacy.schema.fields] == [
        f.name for f in twin.schema.fields
    ]
    assert legacy.schema == twin.schema
    a = legacy.orderBy("city", "timestamp", "temperature").collect()
    b = twin.orderBy("city", "timestamp", "temperature").collect()
    assert a == b and len(a) > 0
