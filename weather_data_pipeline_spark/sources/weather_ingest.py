"""Weather-observation ingest: REST JSON → validated flat rows → upsert.

Spark-first re-expression of the reference collector
(`src/data_collection/weather_collector.py`): the HTTP/retry/rate-limit layer
stays a driver-side utility (S1-S3 — it is I/O to one API, not a data-plane
operator), while validation (S4), flattening (S5) and the upsert sink (S7)
are DataFrame transforms that run distributed over a batch of raw JSON
documents (e.g. a directory of API dumps read with `spark.read.json` or a
streaming source feeding `foreachBatch`).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Nested OpenWeatherMap-shaped schema (reference `tests/conftest.py:19-56`).
RAW_WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("dt", T.LongType()),
        T.StructField("timezone", T.IntegerType()),
        T.StructField("visibility", T.IntegerType()),
        T.StructField(
            "coord",
            T.StructType(
                [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
            ),
        ),
        T.StructField(
            "main",
            T.StructType(
                [
                    T.StructField("temp", T.DoubleType()),
                    T.StructField("feels_like", T.DoubleType()),
                    T.StructField("temp_min", T.DoubleType()),
                    T.StructField("temp_max", T.DoubleType()),
                    T.StructField("pressure", T.IntegerType()),
                    T.StructField("humidity", T.IntegerType()),
                ]
            ),
        ),
        T.StructField(
            "wind",
            T.StructType(
                [T.StructField("speed", T.DoubleType()), T.StructField("deg", T.IntegerType())]
            ),
        ),
        T.StructField("clouds", T.StructType([T.StructField("all", T.IntegerType())])),
        T.StructField(
            "weather",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("main", T.StringType()),
                        T.StructField("description", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("rain", T.StructType([T.StructField("1h", T.DoubleType())])),
        T.StructField("snow", T.StructType([T.StructField("1h", T.DoubleType())])),
        T.StructField(
            "sys",
            T.StructType([T.StructField("country", T.StringType())]),
        ),
    ]
)

# Flat table schema (reference DDL `weather_collector.py:133-159`).
WEATHER_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType(), False),
        T.StructField("country", T.StringType()),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("feels_like", T.DoubleType()),
        T.StructField("temp_min", T.DoubleType()),
        T.StructField("temp_max", T.DoubleType()),
        T.StructField("pressure", T.IntegerType()),
        T.StructField("humidity", T.IntegerType()),
        T.StructField("wind_speed", T.DoubleType()),
        T.StructField("wind_deg", T.IntegerType()),
        T.StructField("cloudiness", T.IntegerType()),
        T.StructField("visibility", T.IntegerType()),
        T.StructField("weather_main", T.StringType()),
        T.StructField("weather_description", T.StringType()),
        T.StructField("rain_1h", T.DoubleType()),
        T.StructField("snow_1h", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("timezone", T.IntegerType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)


def validate_raw(df: DataFrame) -> DataFrame:
    """S4 response validation (reference `weather_collector.py:255-286`):
    required fields present & non-null, as a pushdown-able filter."""
    return df.where(
        F.col("name").isNotNull()
        & F.col("dt").isNotNull()
        & F.col("main").isNotNull()
        & F.col("main.temp").isNotNull()
        & F.col("wind").isNotNull()
        & F.col("coord").isNotNull()
        & (F.size(F.coalesce(F.col("weather"), F.array())) > 0)
    )


def flatten_raw(df: DataFrame) -> DataFrame:
    """S5 JSON flatten (reference `parse_weather_data`,
    `weather_collector.py:288-312`): nested structs → 21 flat columns;
    rain/snow default 0.0; epoch seconds → timestamp."""
    return df.select(
        F.col("name").alias("city"),
        F.col("sys.country").alias("country"),
        F.timestamp_seconds(F.col("dt")).alias("timestamp"),
        F.col("main.temp").alias("temperature"),
        F.col("main.feels_like").alias("feels_like"),
        F.col("main.temp_min").alias("temp_min"),
        F.col("main.temp_max").alias("temp_max"),
        F.col("main.pressure").alias("pressure"),
        F.col("main.humidity").alias("humidity"),
        F.col("wind.speed").alias("wind_speed"),
        F.col("wind.deg").alias("wind_deg"),
        F.col("clouds.all").alias("cloudiness"),
        F.col("visibility"),
        F.col("weather")[0]["main"].alias("weather_main"),
        F.col("weather")[0]["description"].alias("weather_description"),
        F.coalesce(F.col("rain.1h"), F.lit(0.0)).alias("rain_1h"),
        F.coalesce(F.col("snow.1h"), F.lit(0.0)).alias("snow_1h"),
        F.col("coord.lat").alias("lat"),
        F.col("coord.lon").alias("lon"),
        F.col("timezone"),
        F.current_timestamp().alias("created_at"),
    )


def ingest_raw_json(df_raw: DataFrame) -> DataFrame:
    """validate → flatten, one lazy plan."""
    return flatten_raw(validate_raw(df_raw))


def upsert_parquet(
    new_rows: DataFrame,
    table_path: str,
    keys: tuple[str, ...] = ("city", "timestamp"),
    version_col: str = "created_at",
) -> None:
    """S7 upsert sink (reference `INSERT ... ON CONFLICT DO UPDATE`,
    `weather_collector.py:314-338`) on plain parquet: union with the existing
    table, keep the newest row per key (row_number over created_at DESC),
    write atomically via a temp dir + rename.

    Scale notes: on a real lake this is Delta `MERGE INTO`; the plain-parquet
    fallback rewrites the table, so partition it by a coarse key and merge
    only touched partitions. Kept simple here because the reference's whole
    table is one SQLite file anyway."""
    import os
    import shutil
    import uuid

    spark = new_rows.sparkSession
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        merged = existing.unionByName(new_rows, allowMissingColumns=True)
    else:
        merged = new_rows
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    deduped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    tmp = f"{table_path}__tmp_{uuid.uuid4().hex[:8]}"
    deduped.write.mode("overwrite").parquet(tmp)
    if os.path.exists(table_path):
        shutil.rmtree(table_path)
    os.rename(tmp, table_path)


def upsert_parquet_partitioned(
    new_rows: DataFrame,
    table_path: str,
    keys: tuple[str, ...] = ("city", "timestamp"),
    version_col: str = "created_at",
    partition_of: Column | None = None,
    partition_col: str = "part_day",
) -> None:
    """Partition-scoped S7 upsert: the 100 TB shape of `upsert_parquet`.

    The target is laid out `partitionBy(partition_col)` with the partition
    value derived from each row (`partition_of`, default `to_date(timestamp)`).
    A merge then:

    1. computes the (small, bounded) set of partitions the batch touches,
    2. reads ONLY those partitions of the existing table (partition pruning —
       untouched partitions are never opened),
    3. dedups per key keeping the newest `version_col`,
    4. rewrites only the touched partition directories via dynamic partition
       overwrite.

    A daily micro-batch against a year-partitioned 100 TB table therefore
    reads and writes ~1/365th of it instead of all of it — this replaces the
    full-table rewrite the plain `upsert_parquet` does (kept for the tiny
    reference-parity path; on a lakehouse this whole function is Delta
    `MERGE INTO` with partition pruning).

    Requirement: `partition_of` must be a deterministic function of the
    row's key fields (same key ⇒ same partition), otherwise two versions of
    a key could land in different partitions and both survive.
    """
    import os

    from pyspark.sql import Window

    spark = new_rows.sparkSession
    if partition_of is None:
        partition_of = F.to_date(F.col("timestamp"))
    batch = new_rows.withColumn(partition_col, partition_of.cast("string"))
    touched = [r[0] for r in batch.select(partition_col).distinct().collect()]
    if os.path.exists(table_path):
        existing = (
            spark.read.parquet(table_path)
            # partition-type inference may give date; normalize to string
            .withColumn(partition_col, F.col(partition_col).cast("string"))
            .where(F.col(partition_col).isin(touched))
        )
        merged = existing.unionByName(batch, allowMissingColumns=True)
    else:
        merged = batch
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    deduped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    (
        deduped.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )


# --- driver-side HTTP utilities (S1-S3) ------------------------------------
class RateLimiter:
    """Sliding-window rate limiter (reference `weather_collector.py:68-95`):
    at most `max_calls` in any `window_seconds`, thread-safe."""

    def __init__(self, max_calls: int = 60, window_seconds: float = 60.0):
        self.max_calls = max_calls
        self.window = window_seconds
        self._calls: deque[float] = deque()
        self._lock = threading.Lock()

    def wait_if_needed(self, now: Callable[[], float] = time.monotonic, sleep=time.sleep):
        with self._lock:
            t = now()
            while self._calls and t - self._calls[0] >= self.window:
                self._calls.popleft()
            if len(self._calls) >= self.max_calls:
                wait = self.window - (t - self._calls[0])
                if wait > 0:
                    sleep(wait)
                t = now()
                while self._calls and t - self._calls[0] >= self.window:
                    self._calls.popleft()
            self._calls.append(now())


def fetch_with_retry(
    fetch: Callable[[], dict],
    max_retries: int = 3,
    base_delay: float = 1.0,
    sleep=time.sleep,
    retryable: Callable[[Exception], bool] | None = None,
) -> dict | None:
    """S2 retrying fetch (reference `weather_collector.py:171-229`): ≤3
    retries with exponential backoff 1s/2s/4s; retry only on retryable errors
    (5xx/timeout/connection), never on 4xx. `fetch` is injected so the policy
    is testable without a network."""

    def default_retryable(e: Exception) -> bool:
        status = getattr(e, "status_code", None)
        return status is None or status >= 500

    retryable = retryable or default_retryable
    attempt = 0
    while True:
        try:
            return fetch()
        except Exception as e:  # noqa: BLE001 — policy layer
            if not retryable(e) or attempt >= max_retries:
                return None
            sleep(base_delay * (2**attempt))
            attempt += 1


def observed_flatten(df: DataFrame):
    """Validate + flatten with in-flight quality metrics (`df.observe`).

    The reference counts rejects with a second pass over the batch
    (`weather_collector.py:255-286` logs per-record); at scale a second scan
    of every micro-batch doubles ingest IO. `Observation` accumulates the
    counters ON the task side during the one real pass — after the first
    action, `obs.get` carries n_raw / n_invalid / n_null_temp for the
    data-quality ledger, at zero extra jobs.

    Returns (flattened_df, observation); metrics are available after the
    caller's first action on flattened_df.
    """
    from pyspark.sql import Observation

    obs = Observation("ingest_quality")
    valid_pred = (
        F.col("name").isNotNull()
        & F.col("dt").isNotNull()
        & F.col("main").isNotNull()
        & F.col("main.temp").isNotNull()
        & F.col("wind").isNotNull()
        & F.col("coord").isNotNull()
        & (F.size(F.coalesce(F.col("weather"), F.array())) > 0)
    )
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(~valid_pred, 1).otherwise(0)).alias("n_invalid"),
        F.sum(F.when(F.col("main.temp").isNull(), 1).otherwise(0)).alias(
            "n_null_temp"
        ),
    )
    return flatten_raw(validate_raw(observed)), obs
