"""Registry-wide empty-input smoke (VERDICT r03 next-round #5).

The reference's own test matrix runs its processor over empty frames
(`tests/test_data_processor.py:367-423` in the reference tree); the Spark
engine's analog: EVERY registered query must execute against an empty star
schema without raising, returning an empty or otherwise well-defined result.
A 100 TB pipeline routinely sees empty partitions/day-slices; an operator
that throws on zero rows is a production incident.

The five ML *training* feeds are the documented exception: fitting a model
on zero rows is a caller error, and they raise a CLEAR, typed error
(EmptyTrainingData) rather than an opaque JVM stack — asserted here too.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from weather_data_pipeline_spark.plans.queries import REGISTRY

# training on zero rows is a defined ERROR, not a defined result
ML_TRAIN = {
    "ml_train_eval_metrics",
    "ml_rain_classifier_metrics",
    "ml_calibration_feed",
    "ml_model_comparison_feed",
    "ml_feature_importance_feed",
}

TABLES = [
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
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    """Empty parquet star schema with the REAL fixture schemas."""
    out = tmp_path_factory.mktemp("empty_sf")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_empty_star_schema(spark, empty_dir, name):
    if name in ML_TRAIN:
        from weather_data_pipeline_spark.ml.models import EmptyTrainingData

        with pytest.raises(EmptyTrainingData):
            REGISTRY[name].spark(spark, empty_dir).count()
        return
    df = REGISTRY[name].spark(spark, empty_dir)
    # well-defined: executes, has a schema, row count is a number
    n = df.count()
    assert n >= 0
    assert len(df.schema) > 0
