"""The full feature-engineering pipeline (reference `process_pipeline`,
`data_processor.py:275-314`) as ONE lazy DataFrame plan.

Stage order mirrors the reference exactly: time features → lag features →
rolling stats → weather indices → interactions → missing-value repair →
categorical encoding → target construction → drop null targets. Where the
reference materializes 9 full pandas copies (`df.copy()` per stage), this is
a single Catalyst DAG: the ~45 projections collapse into a handful of
codegen'd stages and the only shuffles are (a) one hash partition on `city`
shared by *all* window stages and (b) the tiny vocab aggregations for
encoding.

Scale notes: every window uses the same (city, timestamp) partitioning, so
Spark runs them in one Window exec chain after a single exchange. At 100 TB,
write the base table partitioned/bucketed by city and even that exchange
disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scalar
from ..operators import encoding as E
from ..operators import windows as W

LAG_COLS = ["temperature", "humidity", "pressure", "wind_speed"]
LAGS = (1, 3, 6, 12, 24)
ROLLING_WINDOW = 24
INTERACTIONS = [
    ("temperature", "humidity"),
    ("temperature", "wind_speed"),
    ("humidity", "pressure"),
    ("wind_speed", "cloudiness"),
]
CATEGORICAL_COLS = ["weather_main", "weather_description", "time_of_day"]
FFILL_COLS = ["temperature", "humidity", "pressure", "wind_speed"]


def weather_window(order_tiebreak: str | None = None):
    order = ["timestamp"] + ([order_tiebreak] if order_tiebreak else [])
    return Window.partitionBy("city").orderBy(*order)


def add_lag_features(df: DataFrame) -> DataFrame:
    """W1 ×20 lags (reference `data_processor.py:86-98`)."""
    return W.add_lags(df, weather_window(), LAG_COLS, LAGS)


def add_rolling_features(df: DataFrame) -> DataFrame:
    """W3/W4 rolling mean + std with pandas min_periods semantics
    (reference `data_processor.py:101-116`). exact=True: decimal-accumulated
    closed forms, so the feature values are independent of accumulation
    order — identical on 1 core or 1000 executors, and hash-checkable
    against the pipeline's DuckDB oracle."""
    w = weather_window()
    out = W.add_rolling_mean(df, w, LAG_COLS, ROLLING_WINDOW, exact=True)
    return W.add_rolling_std(out, w, LAG_COLS, ROLLING_WINDOW, min_periods=2, exact=True)


def add_pressure_change(df: DataFrame) -> DataFrame:
    """W5 diff (reference `data_processor.py:151`)."""
    return W.add_diff(df, weather_window(), "pressure", "pressure_change")


def handle_missing_values(df: DataFrame) -> DataFrame:
    """Missing-value repair (reference `data_processor.py:178-204`):
    limited forward-fill (limit=3) then linear interpolation on the numeric
    measurement columns; categorical mode-fill per city; finally drop rows
    that are mostly null.

    Fill and interpolation share ONE row-number column and every helper
    column is dropped in one pass: 5 analysis passes total where the
    sequential helper chain ran ~9 (see _repaired_features on why passes,
    not expressions, dominate construction latency)."""
    w = weather_window()
    out = df.withColumn("_rn", F.row_number().over(w))
    out = out.withColumns(
        W.ffill_limited_exprs(w, FFILL_COLS, "_rn", limit=3, suffix="_ff")
    )
    out = out.withColumns(
        W.interpolate_linear_exprs(
            ["city"], ["timestamp"], [f"{c}_ff" for c in FFILL_COLS], "_rn",
            suffix="_i",
        )
    )
    out = out.withColumns(
        {
            c: F.coalesce(F.col(f"{c}_ff_i"), F.col(c).cast("double"))
            for c in FFILL_COLS
        }
    ).drop("_rn", *[n for c in FFILL_COLS for n in (f"{c}_ff", f"{c}_ff_i")])
    # categorical mode imputation per city (E4 / A11)
    from ..operators.relational import mode_per_group

    for c in ("weather_main",):
        modes = mode_per_group(df.where(F.col(c).isNotNull()), "city", c)
        out = out.join(F.broadcast(modes), on="city", how="left")
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"mode_{c}"))).drop(
            f"mode_{c}"
        )
    return out


def encode_categoricals(df: DataFrame, fit_df: DataFrame | None = None) -> DataFrame:
    """E1 label encoding with unseen→−1 (reference `data_processor.py:206-226`).
    ``assume_bounded``: these three columns are schema-bounded categoricals
    (weather condition enums + a 4-value time-of-day bin), so the fit skips
    the cardinality census and stays a single scan. ``fit_df``: optional
    cheap frame with the same distinct value sets (see
    :func:`_vocab_fit_frame`)."""
    present = [c for c in CATEGORICAL_COLS if c in df.columns]
    return E.label_encode(df, present, assume_bounded=True, fit_df=fit_df)


def _vocab_fit_frame(df: DataFrame) -> DataFrame:
    """A bare projection of the RAW weather frame whose per-column distinct
    non-null value sets equal the repaired pipeline frame's — so the eager
    vocab-fit job scans this instead of the full window+join repair plan
    (r9: the fit was the largest single piece of construction latency).
    Why the sets match: mode imputation only FILLS nulls with a value that
    already occurs in the column (fit ignores nulls on both sides);
    weather_description is never imputed; time_of_day derives
    deterministically from timestamp, untouched by repair; repair drops no
    rows (the only row filter — null targets — runs after encoding)."""
    cols = [F.col(c) for c in ("weather_main", "weather_description") if c in df.columns]
    cols.append(scalar.time_feature_exprs("timestamp")["time_of_day"].alias("time_of_day"))
    return df.select(*cols)


def add_targets(df: DataFrame, horizon: int = 24) -> DataFrame:
    """Targets (reference `data_processor.py:246-270`): temperature_future =
    lead(horizon); temp_change_category bins; will_rain forward flag.
    Two analysis passes (lead+diff read raw columns; the category bin and
    the rain flag read pass 1 / raw) — column order matches the old
    sequential chain exactly."""
    w = weather_window()
    out = df.withColumns(
        {
            "temperature_future": F.lead(F.col("temperature"), horizon).over(w),
            "temp_change": F.col("temperature")
            - F.lag(F.col("temperature"), 1).over(w),
        }
    )
    second = {
        "temp_change_category": scalar.temp_change_category(F.col("temp_change"))
    }
    if "rain_1h" in df.columns:
        frame = w.rowsBetween(1, horizon)
        fwd_n = F.count(F.lit(1)).over(frame)
        fwd_sum = F.sum(F.coalesce(F.col("rain_1h"), F.lit(0.0))).over(frame)
        second["will_rain"] = F.when(fwd_n > 0, (fwd_sum > 0).cast("int"))
    return out.withColumns(second)


def _repaired_features(df: DataFrame) -> DataFrame:
    """Stages time-features → … → missing-value repair (everything before
    categorical encoding), shared by the two pipeline entry points below.

    All six pre-repair stages read only RAW input columns (the cyclical
    encodings derive from `timestamp` inside the same expression dict, the
    indices/interactions from the raw measurements, the lag/rolling/diff
    windows from the raw measurement columns over the shared city window),
    so they merge into ONE ``withColumns`` — one eager Catalyst analysis
    pass instead of six over a plan that is ~70 columns wide by the end.
    Construction latency is analysis passes, not expression building (r9
    measured: the sequential version spent ~1.3 s per warm construction
    here); values and column order are unchanged."""
    w = weather_window()
    merged: dict = {}
    merged.update(scalar.time_feature_exprs("timestamp"))
    merged.update(W.lag_exprs(w, LAG_COLS, LAGS))
    merged.update(W.rolling_mean_exprs(w, LAG_COLS, ROLLING_WINDOW, exact=True))
    merged.update(
        W.rolling_std_exprs(w, LAG_COLS, ROLLING_WINDOW, min_periods=2, exact=True)
    )
    merged.update(
        scalar.weather_index_exprs(
            temp_max_col="temp_max" if "temp_max" in df.columns else None,
            temp_min_col="temp_min" if "temp_min" in df.columns else None,
        )
    )
    merged["pressure_change"] = F.col("pressure") - F.lag(
        F.col("pressure"), 1
    ).over(w)
    merged.update(
        scalar.interaction_exprs(
            [(a, b) for a, b in INTERACTIONS if a in df.columns and b in df.columns]
        )
    )
    return handle_missing_values(df.withColumns(merged))


def full_feature_pipeline(df: DataFrame, horizon: int = 24) -> DataFrame:
    """The reference's end-to-end `process_pipeline` as one lazy plan.
    Input: a weather-shaped table (WEATHER_TABLE_SCHEMA columns).
    Output: ~70 columns, rows with null target dropped."""
    out = _repaired_features(df)
    out = encode_categoricals(out, fit_df=_vocab_fit_frame(df))
    out = add_targets(out, horizon)
    return out.where(F.col("temperature_future").isNotNull())


def training_feature_pipeline_unencoded(df: DataFrame, horizon: int = 24) -> DataFrame:
    """``full_feature_pipeline`` minus categorical encoding — for callers
    that cap AND materialize the frame first and then encode the bounded
    result: the label-encode vocab fit (an eager job) then scans the
    materialized cap instead of re-running the whole window pipeline over
    the full table. Encoding neither feeds nor reads target construction,
    so values match ``full_feature_pipeline`` whenever every category
    appears inside the cap (encoded columns land after the targets instead
    of before them)."""
    out = _repaired_features(df)
    out = add_targets(out, horizon)
    return out.where(F.col("temperature_future").isNotNull())


def events_as_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weather-shaped view over the driver's `events` table so
    the full pipeline can run on provided test data (no weather table is
    shipped): city from user_id, measurements derived from value."""
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    return ev.select(
        F.concat(F.lit("city_"), (F.col("user_id") % 20).cast("string")).alias("city"),
        F.col("ts").alias("timestamp"),
        (F.col("value") / 10.0).alias("temperature"),
        ((F.col("user_id") * 7) % 100).cast("int").alias("humidity"),
        (F.lit(1000) + (F.col("user_id") % 50)).cast("int").alias("pressure"),
        (F.col("value") / 50.0).alias("wind_speed"),
        ((F.col("user_id") * 13) % 100).cast("int").alias("cloudiness"),
        # rare rain so the will_rain label is non-degenerate (~20% positive)
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
