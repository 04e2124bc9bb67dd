"""SCD2 merge: history correctness, idempotency, point-in-time views."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators import scd


def _snap(spark, rows):
    df = spark.createDataFrame(rows, "city string, ts string, segment string")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_scd2_lifecycle(spark):
    h = scd.scd2_init(_snap(spark, [("a", "2024-01-01 00:00:00", "north"),
                                    ("b", "2024-01-01 00:00:00", "south")]), "ts")
    # a changes segment; c is brand new; b unchanged
    upd = _snap(spark, [("a", "2024-02-01 00:00:00", "east"),
                        ("b", "2024-02-01 00:00:00", "south"),
                        ("c", "2024-02-01 00:00:00", "west")])
    h2 = scd.scd2_merge(h, upd, "city", ["segment"], "ts")

    cur = {r.city: r.segment for r in scd.scd2_current(h2).collect()}
    assert cur == {"a": "east", "b": "south", "c": "west"}

    hist_a = sorted(
        [(str(r.valid_from), r.valid_to and str(r.valid_to), r.segment)
         for r in h2.where(F.col("city") == "a").collect()]
    )
    assert hist_a == [
        ("2024-01-01 00:00:00", "2024-02-01 00:00:00", "north"),
        ("2024-02-01 00:00:00", None, "east"),
    ]

    # point-in-time: January sees the old world
    asof = {r.city: r.segment
            for r in scd.scd2_as_of(h2, "2024-01-15 00:00:00").collect()}
    assert asof == {"a": "north", "b": "south"}

    # idempotency: replaying the same batch changes nothing
    h3 = scd.scd2_merge(h2, upd, "city", ["segment"], "ts")
    assert sorted(map(tuple, h3.collect())) == sorted(map(tuple, h2.collect()))
