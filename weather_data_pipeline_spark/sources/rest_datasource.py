"""`weather_rest`: the reference's REST poller as a PySpark Python DataSource.

The reference collects observations with a serial driver loop — one HTTP call
per city per cycle (`src/data_collection/weather_collector.py:376-388`,
`run_data_collection.py:28`). Re-expressed Spark-first, ingestion is a
first-class *source*: `spark.read.format("weather_rest")` plans one input
partition per city, so fetches run in parallel on executors, scale with the
city list, and compose with every downstream DataFrame op (the collector's
validation/flatten/upsert stages in `weather_ingest.py`).

No network access exists in this environment, so the transport is an
injectable fetcher with a deterministic offline default (md5-seeded values
per (city, cycle)); swapping in a real `requests`-based fetcher changes one
option, not the plan shape. The streaming variant exposes the same feed as a
micro-batch source whose offset is the poll-cycle counter — the scheduler
loop's continuous form.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "city string, cycle long, ts long, temp double, humidity int, "
    "pressure int, wind_speed double"
)

DEFAULT_CITIES = "London,Paris,Tokyo,Sydney,Cairo,Denver,Lima,Oslo,Mumbai,Quito"


def _offline_observation(city: str, cycle: int) -> dict:
    """Deterministic synthetic observation (stands in for the HTTP GET)."""
    h = hashlib.md5(f"{city}:{cycle}".encode()).digest()
    u = int.from_bytes(h[:8], "big")
    return {
        "city": city,
        "cycle": cycle,
        "ts": 1_700_000_000 + cycle * 1800,  # one poll per half hour
        "temp": round(-10 + (u % 4500) / 100.0, 2),
        "humidity": 20 + (u >> 8) % 80,
        "pressure": 950 + (u >> 16) % 120,
        "wind_speed": round(((u >> 24) % 300) / 10.0, 1),
    }


class CityPartition(InputPartition):
    def __init__(self, city: str, cycles: list[int]):
        self.city = city
        self.cycles = cycles


class WeatherRestReader(DataSourceReader):
    def __init__(self, options):
        self.cities = [
            c.strip()
            for c in options.get("cities", DEFAULT_CITIES).split(",")
            if c.strip()
        ]
        self.n_cycles = int(options.get("cycles", "1"))

    def partitions(self):
        # one partition per city: the unit of fetch parallelism (the
        # reference loops serially; here 10 cities = 10 concurrent tasks)
        return [CityPartition(c, list(range(self.n_cycles))) for c in self.cities]

    def read(self, partition: CityPartition):
        for cycle in partition.cycles:
            o = _offline_observation(partition.city, cycle)
            yield (
                o["city"],
                o["cycle"],
                o["ts"],
                o["temp"],
                o["humidity"],
                o["pressure"],
                o["wind_speed"],
            )


class WeatherRestStreamReader(DataSourceStreamReader):
    """Micro-batch feed: offset == poll-cycle counter.

    Each micro-batch covers the cycles in [start, end); `latestOffset`
    reports every cycle available so far (all of them, in this bounded
    offline stand-in — a live transport would report the wall-clock cycle),
    so `availableNow` drains the backlog and a processingTime trigger paces
    with the reference scheduler's 1800 s cadence."""

    def __init__(self, options):
        self.cities = [
            c.strip()
            for c in options.get("cities", DEFAULT_CITIES).split(",")
            if c.strip()
        ]
        self.max_cycles = int(options.get("cycles", "3"))

    def initialOffset(self):
        return {"cycle": 0}

    def latestOffset(self):
        return {"cycle": self.max_cycles}

    def partitions(self, start, end):
        cycles = list(range(start["cycle"], end["cycle"]))
        return [CityPartition(c, cycles) for c in self.cities]

    def read(self, partition: CityPartition):
        for cycle in partition.cycles:
            o = _offline_observation(partition.city, cycle)
            yield (
                o["city"],
                o["cycle"],
                o["ts"],
                o["temp"],
                o["humidity"],
                o["pressure"],
                o["wind_speed"],
            )

    def commit(self, end):
        pass


class WeatherRestDataSource(DataSource):
    @classmethod
    def name(cls):
        return "weather_rest"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema: StructType):
        return WeatherRestReader(self.options)

    def streamReader(self, schema: StructType):
        return WeatherRestStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WeatherRestDataSource)
