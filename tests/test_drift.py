"""Behavioral tests for distribution-drift checks (operators/drift.py),
char-entropy quality (text.add_char_entropy), and passage-level boilerplate
dedup (dedup.passage_dedup_stats). Formula-level assertions in the
reference's test style (`tests/test_data_processor.py`)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators import dedup as D
from weather_data_pipeline_spark.operators import drift as DR
from weather_data_pipeline_spark.operators import text as X

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, value double, event_type string")


def _mirrored(spark, values):
    """Same value multiset in both time halves (hour 0 vs hour 10)."""
    rows = [(T0 + dt.timedelta(hours=0, seconds=i), v, "a") for i, v in enumerate(values)]
    rows += [(T0 + dt.timedelta(hours=10, seconds=i), v, "a") for i, v in enumerate(values)]
    return _ev(spark, rows)


def test_split_time_halves_midpoint(spark):
    df = _ev(spark, [(T0, 1.0, "a"), (T0 + dt.timedelta(hours=4), 2.0, "a")])
    tagged = {r["value"]: r["is_a"] for r in DR.split_time_halves(df).collect()}
    assert tagged == {1.0: True, 2.0: False}


def test_psi_zero_for_identical_halves(spark):
    df = _mirrored(spark, [10.0, 60.0, 110.0, 260.0, 450.0] * 4)
    rows = DR.psi_table(df).collect()
    assert all(r["psi"] == 0.0 for r in rows)
    assert all(r["n_a"] == r["n_b"] for r in rows)


def test_psi_large_for_shifted_half(spark):
    rows = [(T0 + dt.timedelta(seconds=i), 10.0, "a") for i in range(50)]
    rows += [(T0 + dt.timedelta(hours=10, seconds=i), 260.0, "a") for i in range(50)]
    out = DR.psi_table(_ev(spark, rows)).collect()
    assert out[0]["psi"] > 1.0  # disjoint bins -> severe drift


def test_psi_bin_clamped_to_last(spark):
    df = _mirrored(spark, [10_000.0])
    assert [r["bin"] for r in DR.psi_table(df).collect()] == [9]


def test_ks_zero_for_identical_halves(spark):
    df = _mirrored(spark, [float(i) for i in range(30)])
    row = DR.ks_table(df).collect()[0]
    assert row["ks_stat"] == 0.0
    assert row["n_a"] == row["n_b"] == 30


def test_ks_one_for_disjoint_supports(spark):
    rows = [(T0 + dt.timedelta(seconds=i), float(i), "a") for i in range(20)]
    rows += [
        (T0 + dt.timedelta(hours=10, seconds=i), 1000.0 + i, "a") for i in range(20)
    ]
    assert DR.ks_table(_ev(spark, rows)).collect()[0]["ks_stat"] == 1.0


def test_chisq_independent_uniform_is_zero(spark):
    # 2 types x 2 weekdays (Mon/Tue), perfectly uniform counts -> chisq 0
    rows = []
    for d in (0, 1):  # Jan 1 2024 is a Monday
        for t in ("a", "b"):
            rows += [(T0 + dt.timedelta(days=d, seconds=i), 1.0, t) for i in range(5)]
    out = DR.chisq_table(_ev(spark, rows)).collect()
    assert len(out) == 4
    assert all(r["chisq"] == 0.0 for r in out)
    assert all(r["e_cnt"] == 5.0 for r in out)


def test_chisq_matches_hand_computation(spark):
    # contingency [[30, 10], [10, 30]]: chisq = sum (o-e)^2/e with e=20 -> 20.0
    rows = []
    for d, t, n in ((0, "a", 30), (1, "a", 10), (0, "b", 10), (1, "b", 30)):
        rows += [(T0 + dt.timedelta(days=d, seconds=i), 1.0, t) for i in range(n)]
    out = DR.chisq_table(_ev(spark, rows)).collect()
    assert out[0]["chisq"] == pytest.approx(20.0)
    assert {r["dow"] for r in out} == {0, 1}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_char_entropy_degenerate_and_uniform(spark):
    out = {
        r["doc_id"]: r
        for r in X.add_char_entropy(_docs(spark, ["aaaa", "ab", "1234!"])).collect()
    }
    assert out[0]["char_entropy"] == 0.0 and out[0]["n_counted_chars"] == 4
    assert out[1]["char_entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out[2]["n_counted_chars"] == 0 and out[2]["char_entropy"] == 0.0


def test_char_entropy_case_insensitive(spark):
    a, b = X.add_char_entropy(_docs(spark, ["AbAb", "abab"])).collect()
    assert a["char_entropy"] == b["char_entropy"]


def test_passage_chunks_tail_and_short_doc(spark):
    df = _docs(spark, ["w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", "tiny doc"])
    out = {
        r["doc_id"]: r["chunks"]
        for r in df.select(
            "doc_id", D.passage_chunks(F.col("text")).alias("chunks")
        ).collect()
    }
    assert out[0] == ["w0 w1 w2 w3 w4 w5 w6 w7", "w8 w9"]
    assert out[1] == ["tiny doc"]


def test_passage_dedup_flags_shared_boilerplate(spark):
    header = "this is the standard shared license header block"  # 8 words
    uniq = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight"]
    df = _docs(spark, [f"{header} {uniq[0]}", f"{header} {uniq[1]}", uniq[0]])
    out = {r["doc_id"]: r for r in D.passage_dedup_stats(df).collect()}
    # docs 0/1 share the header chunk; doc 0's unique tail == doc 2's text
    assert out[0]["n_chunks"] == 2 and out[0]["n_dup_chunks"] == 2
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 1
    assert out[1]["boilerplate_ratio"] == 0.5
    assert out[2]["n_dup_chunks"] == 1  # matches doc 0's second chunk


def test_baseline_value_props_smoothed_and_normalized(spark):
    from weather_data_pipeline_spark.streaming.jobs import baseline_value_props

    df = _ev(spark, [(T0, 10.0, "a"), (T0, 60.0, "a"), (T0, 10_000.0, "a")])
    props = baseline_value_props(df)
    assert len(props) == 10
    assert all(p > 0 for p in props)  # Laplace smoothing: empty bins nonzero
    assert sum(props) == pytest.approx(1.0)
    # bins 0, 1 and the clamped last bin hold one observation each
    assert props[0] == props[1] == props[9] == pytest.approx(1.5 / 8.0)


def test_drift_ops_empty_and_degenerate_inputs(spark):
    # reference test style: empty frame, single row (data_processor edge matrix)
    empty = spark.createDataFrame([], "ts timestamp, value double, event_type string")
    assert DR.psi_table(empty).collect() == []
    assert DR.chisq_table(empty).collect() == []
    ks_empty = DR.ks_table(empty).collect()[0]
    assert ks_empty["ks_stat"] is None  # undefined, never a crash

    one = _ev(spark, [(T0, 10.0, "a")])
    # single event: half B empty -> KS undefined (NULL), PSI still finite
    assert DR.ks_table(one).collect()[0]["ks_stat"] is None
    psi1 = DR.psi_table(one).collect()
    assert len(psi1) == 1 and psi1[0]["psi"] is not None


def test_semantic_dedup_keep_list_clusters_identical_vectors(spark):
    import random

    from weather_data_pipeline_spark.operators.similarity import (
        semantic_dedup_keep_list,
    )

    rng = random.Random(7)
    v1 = [rng.gauss(0, 1) for _ in range(64)]
    v2 = [rng.gauss(0, 1) for _ in range(64)]
    emb = spark.createDataFrame(
        [(0, v1), (1, v1), (2, v2), (3, [x * 0.5 for x in v1])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["from_dup_cluster"]
           for r in semantic_dedup_keep_list(emb).collect()}
    # 0/1/3 are cosine-1 duplicates (scaling preserves cosine): the min id
    # survives as cluster rep; v2 stays an untouched singleton
    assert out == {0: True, 2: False}


def test_mixture_allocation_sums_to_budget(spark, sf_dir):
    from weather_data_pipeline_spark.plans.queries import REGISTRY

    rows = REGISTRY["mixture_allocation_documents"].spark(spark, sf_dir).collect()
    assert sum(r["alloc_tokens"] for r in rows) == 1_000_000
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    # temperature alpha=0.5 flattens: the smallest source gets a larger
    # budget share than its token share
    smallest = min(rows, key=lambda r: r["n_tokens"])
    tok_total = sum(r["n_tokens"] for r in rows)
    assert smallest["alloc_tokens"] / 1_000_000 > smallest["n_tokens"] / tok_total


def test_bpe_merges_learn_frequent_pair_first(spark, tmp_path):
    import pyspark.sql.functions as SF

    from weather_data_pipeline_spark.plans.queries import REGISTRY

    # corpus where 'ab' is by far the most frequent adjacent pair
    docs = spark.createDataFrame(
        [(0, "abab abab cd"), (1, "abab ab cd")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "documents.parquet")
    docs.withColumn("lang", SF.lit("en")).withColumn(
        "source", SF.lit("s")
    ).withColumn("n_chars", SF.length("text")).write.parquet(path)
    out = REGISTRY["bpe_merge_rules_documents"].spark(spark, str(tmp_path)).collect()
    # tiny corpus exhausts its pairs before 6 rounds — steps stay contiguous
    assert [r["step"] for r in out] == list(range(len(out))) and len(out) >= 2
    assert (out[0]["sym_left"], out[0]["sym_right"], out[0]["merged"]) == ("a", "b", "ab")
    # second merge joins the new 'ab' symbol with an adjacent symbol
    assert "ab" in (out[1]["sym_left"], out[1]["sym_right"])
