"""Full feature pipeline: column contract, formula spot checks, edge cases.

Mirrors the reference's operator-correctness layer
(`tests/test_data_processor.py`): exact formula assertions on tiny frames,
plus edge cases (single row, single group, constant category, gap > ffill
limit) as dedicated cases.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators import windows as W
from weather_data_pipeline_spark.plans import features as FP


def test_pipeline_runs_and_widens_schema(spark, sf_dir):
    base = FP.events_as_weather(spark, sf_dir)
    out = FP.full_feature_pipeline(base)
    cols = out.columns
    # contract: every stage contributed its columns
    assert "hour_sin" in cols and "time_of_day" in cols  # time
    assert "temperature_lag_24" in cols  # lags ×20
    assert sum(c.startswith("temperature_lag_") for c in cols) == 5
    assert "temperature_rolling_mean_24" in cols and "humidity_rolling_std_24" in cols
    assert "heat_index" in cols and "discomfort_index" in cols and "temp_range" in cols
    assert "pressure_change" in cols
    assert "temperature_x_humidity" in cols
    assert "weather_main_encoded" in cols and "time_of_day_encoded" in cols
    assert "temperature_future" in cols and "will_rain" in cols
    assert len(cols) >= 60
    n = out.count()
    assert n > 0
    assert out.where(F.col("temperature_future").isNull()).count() == 0


def test_pipeline_is_deterministic(spark, sf_dir):
    base = FP.events_as_weather(spark, sf_dir)
    a = FP.full_feature_pipeline(base).agg(
        F.sum(F.hash(*sorted(FP.full_feature_pipeline(base).columns))).alias("h")
    ).first()["h"]
    b = FP.full_feature_pipeline(base).agg(
        F.sum(F.hash(*sorted(FP.full_feature_pipeline(base).columns))).alias("h")
    ).first()["h"]
    assert a == b


def _tiny(spark, rows):
    return spark.createDataFrame(
        rows, "city string, timestamp string, v double"
    ).withColumn("timestamp", F.to_timestamp("timestamp"))


def test_lag_first_row_null_and_shift(spark):
    df = _tiny(
        spark,
        [("a", "2024-01-01 00:00:00", 1.0), ("a", "2024-01-01 01:00:00", 2.0),
         ("a", "2024-01-01 02:00:00", 3.0)],
    )
    w = W.entity_window("city", "timestamp")
    got = (
        W.add_lags(df, w, ["v"], lags=(1,))
        .orderBy("timestamp")
        .select("v_lag_1")
        .collect()
    )
    assert [r.v_lag_1 for r in got] == [None, 1.0, 2.0]


def test_ffill_does_not_bridge_long_gaps(spark):
    # reference test_data_processor.py:158-170 — limit=3 must not fill a 4-gap
    rows = [("a", f"2024-01-01 0{i}:00:00", None if 1 <= i <= 4 else float(i))
            for i in range(7)]
    df = _tiny(spark, rows)
    w = W.entity_window("city", "timestamp")
    got = (
        W.add_ffill_limited(df, w, ["v"], limit=3)
        .orderBy("timestamp")
        .select("v_ffill")
        .collect()
    )
    vals = [r.v_ffill for r in got]
    assert vals == [0.0, 0.0, 0.0, 0.0, None, 5.0, 6.0]


def test_interpolation_linear_and_edges(spark):
    rows = [
        ("a", "2024-01-01 00:00:00", None),   # head → backfill
        ("a", "2024-01-01 01:00:00", 10.0),
        ("a", "2024-01-01 02:00:00", None),   # interior → linear
        ("a", "2024-01-01 03:00:00", None),
        ("a", "2024-01-01 04:00:00", 40.0),
        ("a", "2024-01-01 05:00:00", None),   # tail → ffill
    ]
    df = _tiny(spark, rows)
    got = (
        W.add_interpolate_linear(df, "city", "timestamp", ["v"])
        .orderBy("timestamp")
        .select("v_interp")
        .collect()
    )
    vals = [r.v_interp for r in got]
    assert vals == [10.0, 10.0, 20.0, 30.0, 40.0, 40.0]


def test_rolling_std_min_periods(spark):
    df = _tiny(
        spark,
        [("a", "2024-01-01 00:00:00", 1.0), ("a", "2024-01-01 01:00:00", 3.0)],
    )
    w = W.entity_window("city", "timestamp")
    got = (
        W.add_rolling_std(df, w, ["v"], window=24, min_periods=2)
        .orderBy("timestamp")
        .select("v_rolling_std_24")
        .collect()
    )
    assert got[0].v_rolling_std_24 is None  # < min_periods
    assert abs(got[1].v_rolling_std_24 - math.sqrt(2.0)) < 1e-12  # ddof=1


def test_single_row_city_all_window_features_null_but_present(spark):
    df = _tiny(spark, [("solo", "2024-01-01 00:00:00", 5.0)])
    w = W.entity_window("city", "timestamp")
    out = W.add_lags(df, w, ["v"], lags=(1,))
    row = out.collect()[0]
    assert row.v_lag_1 is None


def test_forward_flag_null_tail(spark):
    df = _tiny(
        spark,
        [("a", "2024-01-01 00:00:00", 0.0), ("a", "2024-01-01 01:00:00", 2.0)],
    )
    w = W.entity_window("city", "timestamp")
    got = (
        W.add_forward_rolling_sum_positive(df, w, "v", 24, "flag")
        .orderBy("timestamp")
        .collect()
    )
    assert [r.flag for r in got] == [1, None]  # pandas NaN-tail parity


def test_quality_report_and_warnings(spark, sf_dir):
    from weather_data_pipeline_spark.operators.quality import (
        WEATHER_VALID_RANGES,
        quality_report,
        quality_warnings,
    )
    from weather_data_pipeline_spark.plans import features as FP2

    base = FP2.events_as_weather(spark, sf_dir)
    row = quality_report(
        base, ["city", "timestamp"], "timestamp", WEATHER_VALID_RANGES
    ).first()
    assert row.n_rows == base.count()
    assert row.duplicate_key_rows == 0
    assert row.nulls_temperature == 0
    warnings = quality_warnings(row)
    assert isinstance(warnings, list)


def test_dashboard_panels_collectable(spark, sf_dir):
    from weather_data_pipeline_spark.plans.dashboard import dashboard_panels

    panels = dashboard_panels(spark, sf_dir)
    assert set(panels) == {
        "current_stats",
        "entity_comparison",
        "type_distribution",
        "latest_per_user",
        "hourly_profile",
    }
    stats = panels["current_stats"].first()
    assert stats.n_rows > 0 and stats.n_users > 0
    assert panels["type_distribution"].count() == 5
    assert panels["latest_per_user"].count() == stats.n_users


def test_pipeline_empty_input_keeps_schema(spark, sf_dir):
    # reference edge-case matrix: empty frame in -> empty frame out with the
    # full widened schema (test_data_processor.py:367-423 analog)
    base = FP.events_as_weather(spark, sf_dir).where(F.lit(False))
    out = FP.full_feature_pipeline(base)
    assert out.count() == 0
    assert "temperature_future" in out.columns and len(out.columns) >= 60


def test_single_city_constant_category(spark, sf_dir):
    base = FP.events_as_weather(spark, sf_dir).where(F.col("city") == "city_1")
    base = base.withColumn("weather_main", F.lit("constant"))
    out = FP.full_feature_pipeline(base)
    assert out.select("weather_main_encoded").distinct().count() == 1
    assert out.count() > 0


def test_label_encode_semantics_sorted_codes_unseen_and_all_null(spark):
    """E1 sklearn-parity contract on the r7 single-scan map-literal path:
    codes follow SORTED distinct order (string cast), nulls and unseen
    values map to -1, an all-null column yields -1 everywhere (empty
    vocab branch), and multi-column fit shares one scan without
    cross-contaminating vocabularies."""
    from pyspark.sql import functions as F

    from weather_data_pipeline_spark.operators import encoding as E

    df = spark.createDataFrame(
        [("b", None, 10), ("a", None, 20), ("c", None, 10), (None, None, 30)],
        "cat string, allnull string, num int",
    )
    out = E.label_encode(df, ["cat", "allnull"]).orderBy("num", "cat")
    rows = {(r["cat"], r["num"]): (r["cat_encoded"], r["allnull_encoded"])
            for r in out.collect()}
    # sorted distinct of cat = [a, b, c] -> codes 0,1,2; null cat -> -1
    assert rows[("b", 10)] == (1, -1)
    assert rows[("c", 10)] == (2, -1)
    assert rows[("a", 20)] == (0, -1)
    assert rows[(None, 30)] == (-1, -1)

    # unseen at transform: fit on df, apply to a frame with a new value
    vocab = E.fit_label_encoding_multi(df, ["cat"])
    v = {r["_k"]: r["_code"] for r in vocab.collect()}
    assert v == {"a": 0, "b": 1, "c": 2}
    other = spark.createDataFrame([("zz",), ("a",)], "cat string")
    enc = E.apply_label_encoding(
        other, E.fit_label_encoding(df, "cat"), "cat"
    )
    got = {r["cat"]: r["cat_encoded"] for r in enc.collect()}
    assert got == {"zz": -1, "a": 0}


def test_label_encode_high_cardinality_fallback(spark):
    """VERDICT r07 #2 cardinality guard: a column above ``max_literal_vocab``
    distinct values must never ship its vocabulary to the driver or bake it
    into a plan-sized ``create_map`` literal — it is encoded through the
    distributed join fallback with identical sorted-code/unseen=-1
    semantics, while small columns keep the map-literal fast path."""
    from weather_data_pipeline_spark.operators import encoding as E

    rows = [(f"id_{i:04d}", ["x", "y"][i % 2], i) for i in range(40)]
    rows.append((None, None, 99))
    df = spark.createDataFrame(rows, "big string, small string, num int")
    out = E.label_encode(df, ["big", "small"], max_literal_vocab=10)

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # the 40-value vocab must not appear as literals anywhere in the plan
    assert "id_00" not in plan
    # the small column still takes the literal fast path (no join for it) —
    # and the fallback path shows up as the plan's only join
    assert plan.count("Join") >= 1

    got = {r["num"]: (r["big_encoded"], r["small_encoded"]) for r in out.collect()}
    assert len(got) == 41
    for i in range(40):
        # sorted distinct of big = id_0000..id_0039 -> code == i
        assert got[i] == (i, i % 2)
    assert got[99] == (-1, -1)


def test_label_encode_assume_bounded_wrong_assertion_still_driver_safe(spark):
    """``assume_bounded=True`` skips the cardinality census (the feature
    pipeline's single-scan fast path) — but a WRONG boundedness assertion
    must still never ship an over-cap vocabulary to the driver or bake it
    into the plan: the executor-side size check nulls the array and the
    column degrades to the distributed join fallback."""
    from weather_data_pipeline_spark.operators import encoding as E

    rows = [(f"id_{i:04d}",) for i in range(40)]
    df = spark.createDataFrame(rows, "big string")
    out = E.label_encode(df, ["big"], max_literal_vocab=10, assume_bounded=True)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "id_00" not in plan
    codes = sorted(r["big_encoded"] for r in out.collect())
    assert codes == list(range(40))


def test_label_encode_map_lookup_is_ansi_safe(spark):
    """ADVICE r07: under ANSI mode (default-on in PySpark 4.1),
    ``element_at(map, key)`` throws MAP_KEY_DOES_NOT_EXIST for a non-null
    missing key, making the unseen→-1 contract unreachable on any
    fit/apply divergence. The map-literal path must use ``try_element_at``
    (NULL for missing keys regardless of ANSI)."""
    from weather_data_pipeline_spark.operators import encoding as E

    df = spark.createDataFrame([("a", 1), ("b", 2)], "cat string, num int")
    out = E.label_encode(df, ["cat"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # try_element_at compiles to element_at(..., failOnError=false): the
    # physical expression renders as `element_at(map(...), key, None, false)`
    assert "element_at(map" in plan
    assert ", None, false)" in plan
    assert ", None, true)" not in plan


def test_fit_label_encoding_scalable_rank_matches_sorted_order(spark):
    """The fit's global dense rank is computed as range-partition +
    within-slice rank + per-partition offsets (no single-partition global
    window — that task would be the straggler for the 100k+-distinct
    fallback columns). Codes must still be exactly sorted-order 0..n-1
    over distinct non-null values, independent of input partitioning."""
    from weather_data_pipeline_spark.operators import encoding as E

    vals = [f"v{i:03d}" for i in range(200)]
    rows = [(v,) for v in reversed(vals)] + [(None,), ("v000",), ("v150",)]
    df = spark.createDataFrame(rows, "cat string").repartition(8)
    fit = E.fit_label_encoding(df, "cat")
    got = {r["cat"]: r["cat_encoded"] for r in fit.collect()}
    assert got == {v: i for i, v in enumerate(vals)}


def test_vocab_fit_frame_distinct_set_parity_with_nulls(spark):
    """ADVICE r09: encode_categoricals fits its vocab on _vocab_fit_frame's
    RAW projection instead of the repaired pipeline frame — valid only while
    the two yield identical per-column distinct non-null value sets. Pins
    that invariant on a fixture with nulls in weather_main (mode imputation
    fills them with an already-occurring value, so the sets must not move);
    any future handle_missing_values change that drops rows or synthesizes
    new categorical values must fail here."""
    rows = [
        ("a", "2024-01-01 00:30:00", 1.0, 10, 1000, 0.5, 20, "Rain", "light rain"),
        ("a", "2024-01-01 06:30:00", None, 11, 1001, 0.6, 21, None, "clear sky"),
        ("a", "2024-01-01 12:30:00", 2.0, 12, 1002, 0.7, 22, "Clear", "clear sky"),
        ("a", "2024-01-01 19:30:00", 3.0, None, 1003, 0.8, 23, None, None),
        ("b", "2024-01-02 02:30:00", 4.0, 14, None, 0.9, 24, "Snow", "heavy snow"),
        ("b", "2024-01-02 14:30:00", 5.0, 15, 1005, None, 25, "Rain", None),
        ("b", "2024-01-02 22:30:00", None, 16, 1006, 1.0, 26, None, "mist"),
    ]
    df = spark.createDataFrame(
        rows,
        "city string, timestamp string, temperature double, humidity int, "
        "pressure int, wind_speed double, cloudiness int, "
        "weather_main string, weather_description string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    fit = FP._vocab_fit_frame(df)
    repaired = FP._repaired_features(df)
    for c in FP.CATEGORICAL_COLS:
        got = {
            r[0]
            for r in fit.select(c).where(F.col(c).isNotNull()).distinct().collect()
        }
        want = {
            r[0]
            for r in repaired.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .collect()
        }
        assert got == want, f"{c}: fit-frame vocab {got} != repaired {want}"


def test_literal_fit_matches_fallback_composition(spark, sf_dir):
    # r12 (VERDICT r11 #3): the one-job literal fit (vocab maps + per-city
    # mode map) must produce bit-identical values to the old composition
    # (label_encode fit job + mode_per_group broadcast join)
    base = FP.events_as_weather(spark, sf_dir)
    lit_path = FP.full_feature_pipeline(base)
    old = FP._repaired_features(base)  # mode_fill=None -> join path
    old = FP.encode_categoricals(old, fit_df=FP._vocab_fit_frame(base))
    old = FP.add_targets(old, 24).where(F.col("temperature_future").isNotNull())
    assert lit_path.columns == old.columns
    a = sorted(map(repr, lit_path.collect()))
    b = sorted(map(repr, old.collect()))
    assert a == b


def test_pipeline_plan_has_no_join(spark, sf_dir):
    # the literal fit removed the last two join shapes from the executed
    # plan (encode broadcast joins went in r7, the mode join in r12): a
    # Join reappearing means a fit fell back or a regression reintroduced
    # the per-action subtree
    base = FP.events_as_weather(spark, sf_dir)
    plan = FP.full_feature_pipeline(base)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
