"""Registry-wide degenerate-input matrix beyond empty (VERDICT r04 #3).

The reference's edge matrix (`tests/test_data_processor.py:367-423` in the
reference tree) covers empty, single row, single city, and uniform-category
frames; `tests/test_empty_tables.py` already sweeps all registered queries
over the empty star schema. This module adds the other three legs, each as a
full parquet star schema derived from the real sf0.001 fixtures:

  - single_row : every table sliced to its FIRST row (FK edges may dangle —
                 joins must come back empty, not throw)
  - single_group : constant grouping keys on the behavioral tables (one
                 user + one event_type; one lang + one source; one label) —
                 the uniform-category case where encoders, chi-square
                 contingencies, per-group windows and stratified samplers
                 all collapse to a single cell
  - all_null   : every VALUE/payload column nulled (events.value/props,
                 documents.text, embeddings.embedding) with keys intact —
                 the all-missing-measurements day a 100 TB pipeline will
                 eventually ingest

Contract: every query must execute and return a well-defined frame. The ML
training feeds may alternatively raise the typed EmptyTrainingData (a
degenerate input can legally starve the temporal split); nothing may throw
anything else.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from weather_data_pipeline_spark.plans.queries import REGISTRY

SRC = "/root/testdata/sf0.001"

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

# training on a degenerate split is a defined ERROR (EmptyTrainingData), not
# necessarily a defined result — same carve-out as the empty sweep
ML_TRAIN = {
    "ml_train_eval_metrics",
    "ml_rain_classifier_metrics",
    "ml_calibration_feed",
    "ml_model_comparison_feed",
    "ml_feature_importance_feed",
}


def _const_col(table: pa.Table, name: str) -> pa.Table:
    i = table.schema.get_field_index(name)
    field = table.schema.field(i)
    first = table.column(name)[0].as_py()
    arr = pa.array([first] * len(table), type=field.type)
    return table.set_column(i, field, arr)


def _null_col(table: pa.Table, name: str) -> pa.Table:
    i = table.schema.get_field_index(name)
    field = table.schema.field(i)
    return table.set_column(i, field, pa.nulls(len(table), type=field.type))


def _write_schema(out_dir, transform) -> str:
    for t in TABLES:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(transform(t, tab), str(out_dir / f"{t}.parquet"))
    return str(out_dir)


@pytest.fixture(scope="module")
def single_row_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("single_row_sf")
    return _write_schema(out, lambda _t, tab: tab.slice(0, 1))


@pytest.fixture(scope="module")
def single_group_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("single_group_sf")

    def tf(t, tab):
        if t == "events":
            tab = _const_col(_const_col(tab, "user_id"), "event_type")
        elif t == "documents":
            tab = _const_col(_const_col(tab, "lang"), "source")
        elif t == "embeddings":
            tab = _const_col(tab, "label")
        return tab

    return _write_schema(out, tf)


@pytest.fixture(scope="module")
def all_null_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("all_null_sf")

    def tf(t, tab):
        if t == "events":
            tab = _null_col(_null_col(tab, "value"), "props")
        elif t == "documents":
            tab = _null_col(tab, "text")
        elif t == "embeddings":
            tab = _null_col(tab, "embedding")
        return tab

    return _write_schema(out, tf)


def _run(spark, name: str, sf_dir: str) -> None:
    if name in ML_TRAIN:
        from weather_data_pipeline_spark.ml.models import EmptyTrainingData

        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            assert df.count() >= 0
        except EmptyTrainingData:
            pass  # a degenerate split may legally starve training
        return
    df = REGISTRY[name].spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_single_row(spark, single_row_dir, name):
    _run(spark, name, single_row_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_single_group(spark, single_group_dir, name):
    _run(spark, name, single_group_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_survives_all_null_values(spark, all_null_dir, name):
    _run(spark, name, all_null_dir)
