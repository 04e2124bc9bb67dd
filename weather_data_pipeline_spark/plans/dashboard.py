"""Serving-layer query surface (reference `dashboard.py`, SURVEY.md §3.3).

The reference's Streamlit dashboard reruns a fixed set of pandas
aggregations per interaction; here each panel is a small Spark query over
the engine's tables, collected with `toPandas()` ONLY on the final tiny
aggregate (never on raw rows). A caller (any BI layer) gets one dict of
small frames per refresh; `df.persist()` + re-read replaces the reference's
st.cache TTLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relational as R
from ..sources.tables import load_events


def dashboard_panels(spark: SparkSession, sf_dir: str, hours: int = 24 * 30) -> dict[str, DataFrame]:
    """All dashboard panels as lazy frames (reference `dashboard.py:160-280`):
    current metrics, per-entity comparison, distribution, correlations,
    latest rows. Each is collectable in milliseconds."""
    ev = load_events(spark, sf_dir)
    max_ts = ev.agg(F.max("ts")).first()[0]
    window_start = F.lit(max_ts) - F.expr(f"INTERVAL {hours} HOURS")
    recent = ev.where(F.col("ts") >= window_start)

    return {
        # headline metric tiles (A3/A4/A14)
        "current_stats": recent.agg(
            F.avg("value").alias("avg_value"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
        # per-entity comparison bar chart (A1)
        "entity_comparison": R.group_means(recent, "event_type", ["value"]),
        # distribution pie (A5)
        "type_distribution": R.value_counts(recent, "event_type"),
        # latest reading per entity (A6)
        "latest_per_user": R.latest_per_group(recent, "user_id", "ts", "event_id"),
        # correlation heatmap feed (A13) — value vs time-of-day proxies
        "hourly_profile": recent.groupBy(F.hour("ts").alias("hour"))
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .orderBy("hour"),
    }


def export_csv(df: DataFrame, path: str) -> None:
    """Download button analog (reference `dashboard.py:580-586`)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
