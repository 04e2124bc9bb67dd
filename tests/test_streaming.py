"""Structured Streaming: windowed agg equals the batch answer; foreachBatch
upsert lands exactly-once per key."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_spark.sources.tables import load_events
from weather_data_pipeline_spark.streaming import jobs as SJ


def test_streaming_hourly_agg_matches_batch(spark, sf_dir):
    got = SJ.streaming_hourly_event_counts(spark, sf_dir)
    batch = (
        load_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )
    g = {(str(r.hour_start), r.event_type): (r.n_events, r.sum_value) for r in got.collect()}
    b = {(str(r.hour_start), r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    assert g == b


def test_stream_upsert_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_tbl")
    SJ.stream_upsert_events(spark, sf_dir, path)
    n1 = spark.read.parquet(path).count()
    src_n = load_events(spark, sf_dir).count()
    assert n1 == src_n
    # replay the whole stream: the key-merge keeps counts stable
    SJ.stream_upsert_events(spark, sf_dir, path)
    assert spark.read.parquet(path).count() == src_n
