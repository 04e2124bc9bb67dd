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


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    from weather_data_pipeline_spark.sources.tables import compact_parquet, load_table

    src = str(tmp_path / "fragmented")
    # simulate an epoch-fragmented table: 32 tiny files
    load_table(spark, sf_dir, "orders").repartition(32).write.parquet(src)
    dest = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dest, target_file_bytes=64 * 1024 * 1024)
    import glob

    out_files = glob.glob(f"{dest}/*.parquet")
    assert len(out_files) == n <= 4
    assert spark.read.parquet(dest).count() == spark.read.parquet(src).count()


def test_range_sorted_write_has_disjoint_file_ranges(spark, sf_dir, tmp_path):
    # the data-skipping contract: each output file covers a disjoint range of
    # the sort key, so footer min/max stats prune files before any IO
    import glob

    import pyarrow.parquet as pq

    from weather_data_pipeline_spark.sources.tables import load_table, write_range_sorted

    path = str(tmp_path / "sorted")
    write_range_sorted(
        load_table(spark, sf_dir, "events").select("event_id", "user_id", "value"),
        path,
        "user_id",
        4,
    )
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["user_id"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # no overlap between consecutive files


def test_zorder_key_interleaves_bits(spark):
    from weather_data_pipeline_spark.sources.tables import zorder_key

    df = spark.createDataFrame([(3, 1), (0, 0), (255, 0)], "x long, y long")
    got = [
        r.k
        for r in df.select(
            zorder_key(F.col("x"), F.col("y"), bits=8).alias("k")
        ).collect()
    ]
    # x=0b11,y=0b01 -> bit0=x0,bit1=y0,bit2=x1,bit3=y1 = 0b0111
    assert got == [0b0111, 0, 0b0101010101010101]


def test_zorder_write_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    # for a box predicate selective on BOTH columns, z-order must overlap
    # no more files than a single-column range sort (whose second-column
    # stats span everything), and must actually skip some files
    import glob

    import pyarrow.parquet as pq

    from weather_data_pipeline_spark.sources.tables import (
        load_table,
        write_range_sorted,
        write_zorder_2d,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath, rpath = str(tmp_path / "zord"), str(tmp_path / "rsort")
    write_zorder_2d(ev, zpath, "user_id", "value", n_files=16, bits=8)
    write_range_sorted(ev, rpath, "user_id", 16)

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo = stats[0] + (stats[1] - stats[0]) * 2 // 5
    u_hi = stats[0] + (stats[1] - stats[0]) * 3 // 5
    v_lo = stats[2] + (stats[3] - stats[2]) * 2 / 5
    v_hi = stats[2] + (stats[3] - stats[2]) * 3 / 5

    def overlapping(path):
        n = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            span = {}
            for c in ("user_id", "value"):
                st = [
                    md.row_group(rg).column(idx[c]).statistics
                    for rg in range(md.num_row_groups)
                ]
                span[c] = (min(s.min for s in st), max(s.max for s in st))
            if span["user_id"][0] <= u_hi and span["user_id"][1] >= u_lo and \
               span["value"][0] <= v_hi and span["value"][1] >= v_lo:
                n += 1
        return n

    z_n, r_n = overlapping(zpath), overlapping(rpath)
    n_z_files = len(glob.glob(f"{zpath}/*.parquet"))
    assert spark.read.parquet(zpath).count() == ev.count()
    assert z_n <= r_n, (z_n, r_n)
    assert z_n < n_z_files, (z_n, n_z_files)


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """A table whose later files add a column must read as the union schema
    with nulls for old files (mergeSchema) — the parquet-lake evolution
    contract an ingest pipeline relies on when a source adds fields."""
    from pyspark.sql import functions as F

    from weather_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "evolving")
    ev.limit(100).write.parquet(out)
    ev.limit(50).withColumn("quality_flag", F.lit(1)).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "quality_flag" in merged.columns
    assert merged.count() == 150
    n_null = merged.where(F.col("quality_flag").isNull()).count()
    assert n_null == 100  # old files surface the new column as null
