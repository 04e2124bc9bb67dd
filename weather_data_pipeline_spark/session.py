"""SparkSession factory.

Local testing runs one JVM with N threads; the configs below are chosen so the
same code is correct on a real cluster (AQE, shuffle-partition sizing, Arrow
for pandas-UDF exchange, UTC session time so results are oracle-comparable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(
    app_name: str = "weather_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale notes: on a real cluster ``master`` comes from spark-submit and
    ``spark.sql.shuffle.partitions`` should be ~2-3× total cores (or left to
    AQE coalescing, which is enabled here). Locally we match the core count so
    tiny test data isn't over-parallelized.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Only force a master when none is configured (spark-submit on a cluster
    # sets it; local runs default to local[cpus]).
    if not os.environ.get("SPARK_MASTER") and "MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")

    # Diagnostics hook (VERDICT r07 next #4): SPARK_GRAFT_GC_LOG=<path>
    # turns on unified JVM GC logging for the local driver JVM so wall-time
    # outliers can be correlated with collector pauses. No effect unless set.
    gc_log = os.environ.get("SPARK_GRAFT_GC_LOG")
    if gc_log:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Xlog:gc*:file={gc_log}:time,uptime",
        )

    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Read every star-schema table under ``sf_dir`` as a DataFrame."""
    from .sources.tables import load_table

    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
