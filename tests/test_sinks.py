"""Sinks: CSV export (S11), partitioned parquet write + partition pruning
(S6 — the Spark analog of the reference's (city,timestamp) index)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from weather_data_pipeline_spark.plans import features as FP
from weather_data_pipeline_spark.sources.tables import load_events, write_partitioned


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    # S11 (reference dashboard.py:580-586): export displayed rows as CSV
    out = str(tmp_path / "export")
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "value").limit(100)
    ev.coalesce(1).write.option("header", True).csv(out)
    back = spark.read.option("header", True).csv(out, inferSchema=True)
    assert back.count() == 100
    assert set(back.columns) == {"event_id", "user_id", "value"}


def test_partitioned_write_enables_partition_pruning(spark, sf_dir, tmp_path):
    # S6: partitionBy(city) write = the reference's B-tree index analog;
    # a city-filtered read must scan only that city's directory
    out = str(tmp_path / "weather_by_city")
    base = FP.events_as_weather(spark, sf_dir)
    write_partitioned(base, out, "city")
    dirs = glob.glob(f"{out}/city=*")
    assert len(dirs) == base.select("city").distinct().count()
    df = spark.read.parquet(out).where(F.col("city") == "city_3")
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # partition filter handled at planning: only one partition dir survives
    assert "PartitionFilters: [isnotnull(city" in plan
    assert df.count() > 0
    assert df.select("city").distinct().collect()[0][0] == "city_3"
