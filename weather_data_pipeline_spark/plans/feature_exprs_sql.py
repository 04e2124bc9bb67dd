"""Spark-SQL string twins of the feature-pipeline expression builders.

Why this exists (r11 optimization, guide §1.2 "per-task work" applied to
the DRIVER): cProfile of a warm `full_feature_pipeline` construction shows
~7.9k py4j round trips — ~2.3 s per fresh session — almost all of it the
Column-API assembly of the ~60 window/scalar expressions (socket
`recv_into` waiting on the JVM dominates the profile). Building the same
expressions as SQL strings and parsing each with ONE `F.expr()` call cuts
the round trips to ~one per column; the analyzed plan is the same.

Equivalence contract (how the strings are kept value-identical to the
Column builders in `operators/windows.py` / `functions/scalar.py`):

- every float literal carries the ``D`` suffix, parsing as DOUBLE exactly
  like ``F.lit(<python float>)`` (a bare ``1.5`` in Spark SQL is DECIMAL);
- integer literals parse as INT, matching Python int operands;
- ``CASE WHEN`` chains mirror ``F.when`` chains (no ELSE → NULL);
- operator association mirrors the Column expressions (Python's ``*``/``/``
  precedence equals SQL's; explicit parens where the builders had them);
- decimal accumulators use the same explicit CAST types.

`tests/test_feature_exprs_sql_parity.py` pins every twin to its Column
builder by exact value comparison on fixture data, and the pipeline's
DuckDB oracle hash pins the composition end to end.
"""

from __future__ import annotations

from typing import Sequence

TWO_PI = "6.283185307179586D"  # repr(2.0 * math.pi), as a DOUBLE literal

# the one window every pipeline stage shares (plans/features.weather_window)
OVER_W = "PARTITION BY city ORDER BY timestamp"


def time_feature_sql(ts: str = "timestamp") -> dict[str, str]:
    """Twin of functions/scalar.time_feature_exprs."""
    hour = f"hour({ts})"
    dow = f"(dayofweek({ts}) + 5) % 7"  # pandas 0=Monday shim
    month = f"month({ts})"
    return {
        "hour": hour,
        "day_of_week": dow,
        "month": month,
        "quarter": f"quarter({ts})",
        "day_of_year": f"dayofyear({ts})",
        "hour_sin": f"sin({TWO_PI} * {hour} / 24.0D)",
        "hour_cos": f"cos({TWO_PI} * {hour} / 24.0D)",
        "month_sin": f"sin({TWO_PI} * {month} / 12.0D)",
        "month_cos": f"cos({TWO_PI} * {month} / 12.0D)",
        "day_of_week_sin": f"sin({TWO_PI} * ({dow}) / 7.0D)",
        "day_of_week_cos": f"cos({TWO_PI} * ({dow}) / 7.0D)",
        "time_of_day": (
            f"CASE WHEN {hour} <= 6 THEN 'Night' "
            f"WHEN {hour} <= 12 THEN 'Morning' "
            f"WHEN {hour} <= 18 THEN 'Afternoon' "
            f"ELSE 'Evening' END"
        ),
        "is_weekend": f"CAST(({dow}) >= 5 AS INT)",
    }


def lag_sql(
    cols: Sequence[str], lags: Sequence[int], over: str = OVER_W
) -> dict[str, str]:
    """Twin of operators/windows.lag_exprs."""
    return {
        f"{c}_lag_{n}": f"lag({c}, {n}) OVER ({over})" for c in cols for n in lags
    }


def rolling_mean_sql(
    cols: Sequence[str], window: int = 24, over: str = OVER_W
) -> dict[str, str]:
    """Twin of operators/windows.rolling_mean_exprs (exact=True: DECIMAL
    accumulation, one divide)."""
    frame = f"{over} ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW"
    return {
        f"{c}_rolling_mean_{window}": (
            f"CAST(sum(CAST({c} AS DECIMAL(18,6))) OVER ({frame}) AS DOUBLE)"
            f" / count({c}) OVER ({frame})"
        )
        for c in cols
    }


def rolling_std_sql(
    cols: Sequence[str],
    window: int = 24,
    min_periods: int = 2,
    over: str = OVER_W,
) -> dict[str, str]:
    """Twin of operators/windows.rolling_std_exprs (exact=True closed form
    sqrt(greatest((Σx² − (Σx)²/n)/(n−1), 0)) with DECIMAL sums)."""
    frame = f"{over} ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW"
    out = {}
    for c in cols:
        n_obs = f"count({c}) OVER ({frame})"
        sx = f"CAST(sum(CAST({c} AS DECIMAL(18,6))) OVER ({frame}) AS DOUBLE)"
        sxx = (
            f"CAST(sum(CAST({c} * {c} AS DECIMAL(18,6))) OVER ({frame}) AS DOUBLE)"
        )
        n = f"CAST({n_obs} AS DOUBLE)"
        var = f"greatest(({sxx} - {sx} * {sx} / {n}) / ({n} - 1.0D), 0.0D)"
        out[f"{c}_rolling_std_{window}"] = (
            f"CASE WHEN {n_obs} >= {min_periods} THEN sqrt({var}) END"
        )
    return out


def weather_index_sql(
    temp: str = "temperature",
    humidity: str = "humidity",
    wind: str = "wind_speed",
    temp_max: str | None = None,
    temp_min: str | None = None,
) -> dict[str, str]:
    """Twin of functions/scalar.weather_index_exprs (heat index 9-term
    Rothfusz polynomial, wind chill with <10 °C gate, Thom discomfort)."""
    t = f"({temp} * 9.0D / 5.0D + 32.0D)"
    h = humidity
    hi_f = (
        f"-42.379D + 2.04901523D * {t} + 10.14333127D * {h}"
        f" - 0.22475541D * {t} * {h}"
        f" - 0.00683783D * {t} * {t}"
        f" - 0.05481717D * {h} * {h}"
        f" + 0.00122874D * {t} * {t} * {h}"
        f" + 0.00085282D * {t} * {h} * {h}"
        f" - 0.00000199D * {t} * {t} * {h} * {h}"
    )
    v16 = f"POWER({wind} * 3.6D, 0.16D)"
    wc = f"13.12D + 0.6215D * {temp} - 11.37D * {v16} + 0.3965D * {temp} * {v16}"
    out = {
        "heat_index": f"(({hi_f}) - 32.0D) * 5.0D / 9.0D",
        "wind_chill": f"CASE WHEN {temp} < 10.0D THEN {wc} ELSE {temp} END",
        "discomfort_index": (
            f"{temp} - 0.55D * (1.0D - 0.01D * {h}) * ({temp} - 14.5D)"
        ),
    }
    if temp_max and temp_min:
        out["temp_range"] = f"{temp_max} - {temp_min}"
    return out


def interaction_sql(pairs: Sequence[tuple[str, str]]) -> dict[str, str]:
    """Twin of functions/scalar.interaction_exprs."""
    return {f"{a}_x_{b}": f"{a} * {b}" for a, b in pairs}


def ffill_limited_sql(
    cols: Sequence[str],
    rn_col: str,
    limit: int = 3,
    suffix: str = "_ffill",
    over: str = OVER_W,
) -> dict[str, str]:
    """Twin of operators/windows.ffill_limited_exprs."""
    cum = f"{over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    out = {}
    for c in cols:
        last_val = f"last({c}, true) OVER ({cum})"
        last_rn = (
            f"last(CASE WHEN {c} IS NOT NULL THEN {rn_col} END, true)"
            f" OVER ({cum})"
        )
        out[f"{c}{suffix}"] = (
            f"CASE WHEN {c} IS NOT NULL THEN {c} "
            f"WHEN ({last_rn}) IS NOT NULL AND ({rn_col} - ({last_rn})) <= {limit} "
            f"THEN {last_val} END"
        )
    return out


def interpolate_linear_sql(
    cols: Sequence[str],
    rn_col: str,
    suffix: str = "_interp",
    partition: str = "city",
    order: str = "timestamp",
) -> dict[str, str]:
    """Twin of operators/windows.interpolate_linear_exprs — the
    "next non-null" side is last(...) over the REVERSED-order growing frame
    (same O(n) streaming argument as the Column builder)."""
    back = (
        f"PARTITION BY {partition} ORDER BY {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    fwd = (
        f"PARTITION BY {partition} ORDER BY {order} DESC "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    out = {}
    for c in cols:
        prev_val = f"last({c}, true) OVER ({back})"
        prev_rn = (
            f"last(CASE WHEN {c} IS NOT NULL THEN {rn_col} END, true)"
            f" OVER ({back})"
        )
        next_val = f"last({c}, true) OVER ({fwd})"
        next_rn = (
            f"last(CASE WHEN {c} IS NOT NULL THEN {rn_col} END, true)"
            f" OVER ({fwd})"
        )
        frac = (
            f"CAST({rn_col} - ({prev_rn}) AS DOUBLE)"
            f" / CAST(({next_rn}) - ({prev_rn}) AS DOUBLE)"
        )
        out[f"{c}{suffix}"] = (
            f"CASE WHEN {c} IS NOT NULL THEN CAST({c} AS DOUBLE) "
            f"WHEN ({prev_val}) IS NULL THEN CAST({next_val} AS DOUBLE) "
            f"WHEN ({next_val}) IS NULL THEN CAST({prev_val} AS DOUBLE) "
            f"ELSE ({prev_val}) + (({next_val}) - ({prev_val})) * ({frac}) END"
        )
    return out


def targets_first_sql(horizon: int = 24, over: str = OVER_W) -> dict[str, str]:
    """Twin of plans/features.add_targets pass 1 (lead target + diff)."""
    return {
        "temperature_future": f"lead(temperature, {horizon}) OVER ({over})",
        "temp_change": f"temperature - lag(temperature, 1) OVER ({over})",
    }


def targets_second_sql(
    horizon: int = 24, rain_col: str | None = "rain_1h", over: str = OVER_W
) -> dict[str, str]:
    """Twin of add_targets pass 2 (category bin + forward rain flag)."""
    out = {
        "temp_change_category": (
            "CASE WHEN temp_change IS NULL THEN CAST(NULL AS STRING) "
            "WHEN temp_change <= -2.0D THEN 'Decrease' "
            "WHEN temp_change <= 2.0D THEN 'Stable' "
            "ELSE 'Increase' END"
        )
    }
    if rain_col:
        frame = f"{over} ROWS BETWEEN 1 FOLLOWING AND {horizon} FOLLOWING"
        fwd_n = f"count(1) OVER ({frame})"
        fwd_sum = f"sum(coalesce({rain_col}, 0.0D)) OVER ({frame})"
        out["will_rain"] = (
            f"CASE WHEN {fwd_n} > 0 THEN CAST(({fwd_sum}) > 0 AS INT) END"
        )
    return out


def events_as_weather_sql() -> list[str]:
    """Twin of plans/features.events_as_weather's projection list (reads
    the loaded events frame's columns: ts, user_id, event_type, value)."""
    return [
        "concat('city_', CAST(user_id % 20 AS STRING)) AS city",
        "ts AS timestamp",
        "value / 10.0D AS temperature",
        "CAST((user_id * 7) % 100 AS INT) AS humidity",
        "CAST(1000 + (user_id % 50) AS INT) AS pressure",
        "value / 50.0D AS wind_speed",
        "CAST((user_id * 13) % 100 AS INT) AS cloudiness",
        "CASE WHEN event_type = 'error' AND value > 100.0D "
        "THEN value / 100.0D ELSE 0.0D END AS rain_1h",
        "value / 10.0D + 1.0D AS temp_max",
        "value / 10.0D - 1.0D AS temp_min",
        "event_type AS weather_main",
        "concat(event_type, ' conditions') AS weather_description",
    ]
