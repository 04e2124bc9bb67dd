"""DuckDB twin of the FULL 69-column feature pipeline (plans/features.py).

Generated stage by stage in the pipeline's own order — weather view → time
features → lags → exact-decimal rolling stats → indices → pressure diff →
interactions → limited ffill → linear interpolation → per-city mode fill →
label encodes → targets → target-null drop — each fragment copied verbatim
from the already-hash-matched single-stage oracles (lag/rolling/ffill/
interpolate/time-features/indices/encode/forward-flag) and re-based onto the
per-city window.

Determinism contract (same rules as the per-stage oracles):
- value-copy / lag / lead / diff columns are exact;
- rolling mean/std use DECIMAL-accumulated closed forms (order-free);
- scalar index chains replicate the Spark expression's association exactly;
- only libm-dependent outputs (sin/cos, pow-based wind_chill) are rounded
  to 6 dp — in BOTH engines, at the final projection;
- int-typed columns are emitted as BIGINT on both sides.
"""

from __future__ import annotations

MEAS = ["temperature", "humidity", "pressure", "wind_speed"]
LAGS = (1, 3, 6, 12, 24)
H = 24  # target horizon / rolling window

# columns rounded at the final projection (libm-backed)
ROUND6_COLS = (
    "hour_sin", "hour_cos", "month_sin", "month_cos",
    "day_of_week_sin", "day_of_week_cos", "wind_chill",
)
# int columns emitted as BIGINT (Spark side casts int -> long)
LONG_COLS = (
    "hour", "day_of_week", "month", "quarter", "day_of_year", "is_weekend",
    "cloudiness", "pressure_change", "humidity_x_pressure",
    "weather_main_encoded", "weather_description_encoded",
    "time_of_day_encoded", "will_rain",
    *[f"humidity_lag_{n}" for n in LAGS],
    *[f"pressure_lag_{n}" for n in LAGS],
)


def _weather_view() -> str:
    return """
w AS (SELECT
  'city_' || CAST(user_id % 20 AS VARCHAR) AS city,
  ts AS w_ts,
  value / 10.0e0 AS temperature,
  CAST((user_id * 7) % 100 AS INTEGER) AS humidity,
  CAST(1000 + (user_id % 50) AS INTEGER) AS pressure,
  value / 50.0e0 AS wind_speed,
  CAST((user_id * 13) % 100 AS INTEGER) AS cloudiness,
  CASE WHEN event_type = 'error' AND value > 100.0e0
       THEN value / 100.0e0 ELSE 0.0e0 END AS rain_1h,
  value / 10.0e0 + 1.0e0 AS temp_max,
  value / 10.0e0 - 1.0e0 AS temp_min,
  event_type AS weather_main,
  event_type || ' conditions' AS weather_description
FROM events)"""


def _time_features() -> str:
    # mirrors functions/scalar.add_time_features (incl. the pandas dayofweek
    # shim); sin/cos kept raw here, rounded at the final projection
    return """
tf AS (SELECT w.*,
  hour(w_ts) AS hour,
  (dayofweek(w_ts) + 6) % 7 AS day_of_week,
  month(w_ts) AS month,
  quarter(w_ts) AS quarter,
  dayofyear(w_ts) AS day_of_year,
  sin(2 * pi() * hour(w_ts) / 24.0e0) AS hour_sin,
  cos(2 * pi() * hour(w_ts) / 24.0e0) AS hour_cos,
  sin(2 * pi() * month(w_ts) / 12.0e0) AS month_sin,
  cos(2 * pi() * month(w_ts) / 12.0e0) AS month_cos,
  sin(2 * pi() * ((dayofweek(w_ts) + 6) % 7) / 7.0e0) AS day_of_week_sin,
  cos(2 * pi() * ((dayofweek(w_ts) + 6) % 7) / 7.0e0) AS day_of_week_cos,
  CASE WHEN hour(w_ts) <= 6 THEN 'Night'
       WHEN hour(w_ts) <= 12 THEN 'Morning'
       WHEN hour(w_ts) <= 18 THEN 'Afternoon'
       ELSE 'Evening' END AS time_of_day,
  CAST((dayofweek(w_ts) + 6) % 7 >= 5 AS INT) AS is_weekend
FROM w)"""


def _lags_rolling() -> str:
    lags = ",\n  ".join(
        f"lag({c}, {n}) OVER lw AS {c}_lag_{n}" for c in MEAS for n in LAGS
    )
    means = ",\n  ".join(
        f"CAST(SUM(CAST({c} AS DECIMAL(18,6))) OVER cw AS DOUBLE)"
        f" / COUNT({c}) OVER cw AS {c}_rolling_mean_{H}"
        for c in MEAS
    )
    stds = ",\n  ".join(
        f"""CASE WHEN COUNT({c}) OVER cw >= 2 THEN
    sqrt(GREATEST((CAST(SUM(CAST({c} * {c} AS DECIMAL(18,6))) OVER cw AS DOUBLE)
       - CAST(SUM(CAST({c} AS DECIMAL(18,6))) OVER cw AS DOUBLE)
         * CAST(SUM(CAST({c} AS DECIMAL(18,6))) OVER cw AS DOUBLE)
         / CAST(COUNT({c}) OVER cw AS DOUBLE))
      / (CAST(COUNT({c}) OVER cw AS DOUBLE) - 1.0e0), 0.0e0)) END
    AS {c}_rolling_std_{H}"""
        for c in MEAS
    )
    return f"""
l AS (SELECT tf.*,
  {lags},
  {means},
  {stds},
  pressure - lag(pressure, 1) OVER lw AS pressure_change,
  row_number() OVER lw AS rn
FROM tf
WINDOW lw AS (PARTITION BY city ORDER BY w_ts),
       cw AS (PARTITION BY city ORDER BY w_ts
              ROWS BETWEEN {H - 1} PRECEDING AND CURRENT ROW))"""


def _indices_interactions() -> str:
    # expression association copied from functions/scalar.py (heat_index /
    # wind_chill / discomfort_index) — identical term order, so the pure
    # +,-,* chains are bit-exact; wind_chill's pow() is rounded at the end
    t = "(temperature * 9.0e0 / 5.0e0 + 32.0e0)"
    v16 = "pow(wind_speed * 3.6e0, 0.16e0)"
    return f"""
ix AS (SELECT l.*,
  ((-42.379e0 + 2.04901523e0 * {t} + 10.14333127e0 * humidity
    - 0.22475541e0 * {t} * humidity
    - 0.00683783e0 * {t} * {t}
    - 0.05481717e0 * humidity * humidity
    + 0.00122874e0 * {t} * {t} * humidity
    + 0.00085282e0 * {t} * humidity * humidity
    - 0.00000199e0 * {t} * {t} * humidity * humidity
   ) - 32.0e0) * 5.0e0 / 9.0e0 AS heat_index,
  CASE WHEN temperature < 10.0e0
       THEN 13.12e0 + 0.6215e0 * temperature - 11.37e0 * {v16}
            + 0.3965e0 * temperature * {v16}
       ELSE temperature END AS wind_chill,
  temperature - 0.55e0 * (1.0e0 - 0.01e0 * humidity) * (temperature - 14.5e0)
    AS discomfort_index,
  temp_max - temp_min AS temp_range,
  temperature * humidity AS temperature_x_humidity,
  temperature * wind_speed AS temperature_x_wind_speed,
  humidity * pressure AS humidity_x_pressure,
  wind_speed * cloudiness AS wind_speed_x_cloudiness
FROM l)"""


def _repair() -> str:
    # W7 limited ffill then W8 linear interpolation, per measurement column
    # (fragments from the hash-matched ffill_limited/interpolate oracles)
    lv = ",\n  ".join(
        f"last_value({c} IGNORE NULLS) OVER rb AS {c}_lv,\n  "
        f"last_value(CASE WHEN {c} IS NOT NULL THEN rn END IGNORE NULLS)"
        f" OVER rb AS {c}_lr"
        for c in MEAS
    )
    ff = ",\n  ".join(
        f"CASE WHEN {c} IS NOT NULL THEN {c}\n       "
        f"WHEN {c}_lr IS NOT NULL AND rn - {c}_lr <= 3 THEN {c}_lv END"
        f" AS {c}_ff"
        for c in MEAS
    )
    pn = ",\n  ".join(
        f"last_value({c}_ff IGNORE NULLS) OVER rb2 AS {c}_pv,\n  "
        f"last_value(CASE WHEN {c}_ff IS NOT NULL THEN rn END IGNORE NULLS)"
        f" OVER rb2 AS {c}_pr,\n  "
        f"first_value({c}_ff IGNORE NULLS) OVER rf AS {c}_nv,\n  "
        f"first_value(CASE WHEN {c}_ff IS NOT NULL THEN rn END IGNORE NULLS)"
        f" OVER rf AS {c}_nr"
        for c in MEAS
    )
    fin = ",\n  ".join(
        f"""COALESCE(
    CASE WHEN {c}_ff IS NOT NULL THEN CAST({c}_ff AS DOUBLE)
         WHEN {c}_pv IS NULL THEN CAST({c}_nv AS DOUBLE)
         WHEN {c}_nv IS NULL THEN CAST({c}_pv AS DOUBLE)
         ELSE {c}_pv + ({c}_nv - {c}_pv)
              * (CAST(rn - {c}_pr AS DOUBLE) / CAST({c}_nr - {c}_pr AS DOUBLE))
    END, CAST({c} AS DOUBLE)) AS {c}_fin"""
        for c in MEAS
    )
    return f"""
r1 AS (SELECT ix.*,
  {lv}
FROM ix
WINDOW rb AS (PARTITION BY city ORDER BY rn
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
r2 AS (SELECT r1.*,
  {ff}
FROM r1),
r3 AS (SELECT r2.*,
  {pn}
FROM r2
WINDOW rb2 AS (PARTITION BY city ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       rf AS (PARTITION BY city ORDER BY rn
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
r4 AS (SELECT r3.*,
  {fin}
FROM r3)"""


def _mode_encode() -> str:
    # per-city mode of weather_main (tie: count desc, value asc) from the
    # PRE-repair frame, then sklearn-LabelEncoder codes (sorted distinct ->
    # dense codes) over the post-fill categoricals, before the target drop
    return """
mo AS (SELECT city, weather_main AS mode_wm FROM (
         SELECT city, weather_main,
                row_number() OVER (PARTITION BY city
                                   ORDER BY COUNT(*) DESC, weather_main) AS mrn
         FROM ix WHERE weather_main IS NOT NULL
         GROUP BY city, weather_main)
       WHERE mrn = 1),
m AS (SELECT r4.*, COALESCE(r4.weather_main, mo.mode_wm) AS wm2
      FROM r4 LEFT JOIN mo USING (city)),
e AS (SELECT m.*,
  dense_rank() OVER (ORDER BY wm2) - 1 AS weather_main_encoded,
  dense_rank() OVER (ORDER BY weather_description) - 1
    AS weather_description_encoded,
  dense_rank() OVER (ORDER BY time_of_day) - 1 AS time_of_day_encoded
FROM m)"""


def _targets() -> str:
    return f"""
tg AS (SELECT e.*,
  lead(temperature_fin, {H}) OVER lw2 AS temperature_future,
  temperature_fin - lag(temperature_fin, 1) OVER lw2 AS temp_change,
  CASE WHEN COUNT(*) OVER f24 > 0
       THEN CAST(SUM(COALESCE(rain_1h, 0.0e0)) OVER f24 > 0 AS INT)
  END AS will_rain
FROM e
WINDOW lw2 AS (PARTITION BY city ORDER BY w_ts),
       f24 AS (PARTITION BY city ORDER BY w_ts
               ROWS BETWEEN 1 FOLLOWING AND {H} FOLLOWING))"""


def _final_select() -> str:
    cols = []

    def emit(name: str, expr: str | None = None) -> None:
        expr = expr or name
        if name in ROUND6_COLS:
            cols.append(f"ROUND({expr}, 6) + 0.0e0 AS {name}")
        elif name in LONG_COLS:
            cols.append(f"CAST({expr} AS BIGINT) AS {name}")
        else:
            cols.append(f"{expr} AS {name}" if expr != name else name)

    emit("city")
    cols.append('w_ts AS "timestamp"')
    for c in MEAS:
        emit(c, f"{c}_fin")
    emit("cloudiness")
    emit("rain_1h")
    emit("temp_max")
    emit("temp_min")
    emit("weather_main", "wm2")
    emit("weather_description")
    for c in ("hour", "day_of_week", "month", "quarter", "day_of_year",
              "hour_sin", "hour_cos", "month_sin", "month_cos",
              "day_of_week_sin", "day_of_week_cos", "time_of_day",
              "is_weekend"):
        emit(c)
    for c in MEAS:
        for n in LAGS:
            emit(f"{c}_lag_{n}")
    for c in MEAS:
        emit(f"{c}_rolling_mean_{H}")
    for c in MEAS:
        emit(f"{c}_rolling_std_{H}")
    for c in ("heat_index", "wind_chill", "discomfort_index", "temp_range",
              "pressure_change", "temperature_x_humidity",
              "temperature_x_wind_speed", "humidity_x_pressure",
              "wind_speed_x_cloudiness", "weather_main_encoded",
              "weather_description_encoded", "time_of_day_encoded",
              "temperature_future", "temp_change"):
        emit(c)
    cols.append(
        "CASE WHEN temp_change IS NULL THEN NULL "
        "WHEN temp_change <= -2.0e0 THEN 'Decrease' "
        "WHEN temp_change <= 2.0e0 THEN 'Stable' "
        "ELSE 'Increase' END AS temp_change_category"
    )
    emit("will_rain")
    body = ",\n  ".join(cols)
    return f"""
SELECT
  {body}
FROM tg
WHERE temperature_future IS NOT NULL"""


def feature_pipeline_sql() -> str:
    # note the trailing space: ev_sql() splices its ev_us CTE by detecting a
    # leading "WITH " prefix
    return (
        "WITH "
        + ",".join(
            [
                _weather_view(),
                _time_features(),
                _lags_rolling(),
                _indices_interactions(),
                _repair(),
                _mode_encode(),
                _targets(),
            ]
        )
        + _final_select()
    )
