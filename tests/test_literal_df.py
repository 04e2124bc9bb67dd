"""literal_df (functions/localrel): the LocalRelation twin of
``createDataFrame(rows, ddl)``.

Contract pinned here: identical schema (names + types) and identical values
to the createDataFrame path for every shape the query paths feed it
(None-bearing timestamps/longs, array<double> cells, pyspark Rows), an
executed plan with NO Python-RDD scan (the whole point — an ExistingRDD
scan re-runs Python-worker tasks on every action of every consumer), and
the empty-input fallback.
"""

from __future__ import annotations

import datetime

from weather_data_pipeline_spark.functions.localrel import (
    _split_ddl,
    literal_df,
)

CASES = [
    (
        [(0, "a b", "c", "abc", 5), (1, "x", "y z", "xyz", 2)],
        "step long, sym_left string, sym_right string, merged string, "
        "pair_count long",
    ),
    (
        [
            (1, 10, 20, datetime.datetime(2024, 1, 2, 3, 4, 5), None),
            (2, 0, 0, None, datetime.datetime(2024, 5, 6)),
        ],
        "fold int, train_rows long, test_rows long, max_train_ts timestamp, "
        "min_test_ts timestamp",
    ),
    (
        [("rf", 0.5, 0.25, 0.9, 0.8, 0.1)],
        "model string, train_mse double, test_mse double, train_r2 double, "
        "test_r2 double, test_mae double",
    ),
    ([(3, [1.0, 2.5]), (4, [])], "code_0 int, _cent0 array<double>"),
    ([(7, 1, 2, 0.125)], "query_id long, j int, code int, d2 double"),
]


def _shape(df):
    return (
        [(f.name, f.dataType.simpleString()) for f in df.schema],
        sorted(tuple(r) for r in df.collect()),
    )


def test_parity_with_create_dataframe(spark):
    for rows, ddl in CASES:
        assert _shape(literal_df(spark, rows, ddl)) == _shape(
            spark.createDataFrame(rows, ddl)
        )


def test_accepts_pyspark_rows(spark):
    src = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", None)], "k long, s string, v double"
    )
    rows = src.collect()
    assert _shape(literal_df(spark, rows, "k long, s string, v double")) == _shape(src)


def test_no_python_rdd_scan(spark):
    df = literal_df(spark, [(1, "x")], "k long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_empty_rows_fall_back(spark):
    df = literal_df(spark, [], "k long, s string")
    assert df.count() == 0
    assert [(f.name, f.dataType.simpleString()) for f in df.schema] == [
        ("k", "bigint"),
        ("s", "string"),
    ]


def test_ddl_split_keeps_nested_commas():
    assert _split_ddl(
        "a decimal(20,9), b array<double>, c map<string,int>, d int"
    ) == ["a decimal(20,9)", "b array<double>", "c map<string,int>", "d int"]


def test_literal_df_accepts_colon_form_ddl(spark):
    # ADVICE r11: createDataFrame accepts "a:int" DDL too; the pandas
    # column-name derivation must not produce names like "a:int"
    got = literal_df(spark, [(1, "x"), (2, None)], "a:int, b:string")
    ref = spark.createDataFrame([(1, "x"), (2, None)], "a:int, b:string")
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
