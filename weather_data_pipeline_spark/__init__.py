"""weather_data_pipeline_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference `Cabe22/weather-data-pipeline` (single-node pandas/SQLite ETL + ML
pipeline), re-expressed Spark-first: lazy DataFrame plans, Catalyst
optimization, partition-aware windows, broadcast joins, Arrow-batched pandas
UDFs only where built-ins can't express the semantics.

Modules
-------
- ``session``   : SparkSession factory tuned for local[N] and cluster use.
- ``io``        : sources/sinks — star-schema parquet tables, weather-JSON
                  flatten + validation, dedup-upsert parquet writer.
- ``ops``       : relational / window / quality / join / dedup / similarity /
                  text / multimodal operators, each a pure DataFrame→DataFrame
                  function.
- ``features``  : the reference's ~45-derived-column feature pipeline
                  (time, lag, rolling, indices, interactions, repair, encode).
- ``ml``        : temporal splits, walk-forward CV, regressor suite,
                  rain classifier, stacking, JSON model registry.
- ``streaming`` : Structured Streaming jobs (watermarked windowed aggs,
                  foreachBatch upsert).
"""

__version__ = "0.1.0"
