"""Property-based parity: our window closed-forms vs pandas itself.

The reference computes these with pandas Series methods
(`data_processor.py:86-190`); hypothesis generates adversarial null/value
patterns and we assert the Spark closed-form matches pandas exactly —
stronger than the reference's hand-picked fixtures (SURVEY.md §5).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weather_data_pipeline_spark.operators import windows as W

# quantized to 3 decimals like the real measurement data: hypothesis found
# that at subnormal magnitudes (~1e-38) PANDAS' rolling-std returns noise
# (~3e-7) while the decimal closed form stays near truth — semantic parity
# (nulls, min_periods, ddof) is the property under test, not subnormal FP
values = st.lists(
    st.one_of(
        st.none(),
        st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 3)),
    ),
    min_size=1,
    max_size=12,
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, vals):
    rows = [("g", i, None if v is None else float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, i long, v double")


def _col(df, name):
    return [r[name] for r in df.orderBy("i").collect()]


def _eq(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


@given(values)
@SET
def test_ffill_limit_matches_pandas(spark, vals):
    got = _col(
        W.add_ffill_limited(_df(spark, vals), W.entity_window("g", "i"), ["v"], limit=3),
        "v_ffill",
    )
    want = pd.Series(vals, dtype="float64").ffill(limit=3)
    want = [None if pd.isna(x) else float(x) for x in want]
    assert all(_eq(g, w) for g, w in zip(got, want)), (vals, got, want)


@given(values)
@SET
def test_interpolate_matches_pandas(spark, vals):
    got = _col(
        W.add_interpolate_linear(_df(spark, vals), "g", "i", ["v"]), "v_interp"
    )
    want = pd.Series(vals, dtype="float64").interpolate(
        method="linear", limit_direction="both"
    )
    want = [None if pd.isna(x) else float(x) for x in want]
    assert all(_eq(g, w) for g, w in zip(got, want)), (vals, got, want)


@given(values)
@SET
def test_rolling_std_matches_pandas(spark, vals):
    got = _col(
        W.add_rolling_std(
            _df(spark, vals), W.entity_window("g", "i"), ["v"], window=4, min_periods=2
        ),
        "v_rolling_std_4",
    )
    want = pd.Series(vals, dtype="float64").rolling(window=4, min_periods=2).std()
    want = [None if pd.isna(x) else float(x) for x in want]
    assert all(_eq(g, w) for g, w in zip(got, want)), (vals, got, want)


@given(values)
@SET
def test_rolling_mean_matches_pandas(spark, vals):
    got = _col(
        W.add_rolling_mean(_df(spark, vals), W.entity_window("g", "i"), ["v"], window=4),
        "v_rolling_mean_4",
    )
    want = pd.Series(vals, dtype="float64").rolling(window=4, min_periods=1).mean()
    want = [None if pd.isna(x) else float(x) for x in want]
    assert all(_eq(g, w) for g, w in zip(got, want)), (vals, got, want)


@pytest.mark.parametrize("hour,expected", [(0, "Night"), (6, "Night"), (7, "Morning"),
                                           (12, "Morning"), (13, "Afternoon"),
                                           (18, "Afternoon"), (19, "Evening"), (23, "Evening")])
def test_time_of_day_bin_edges_match_pd_cut(hour, expected):
    # pd.cut([h], [0,6,12,18,24], labels=..., include_lowest=True) parity
    got = pd.cut(
        [hour],
        bins=[0, 6, 12, 18, 24],
        labels=["Night", "Morning", "Afternoon", "Evening"],
        include_lowest=True,
    )[0]
    assert str(got) == expected  # our F.when chain encodes exactly these edges


# --- winnowing / simhash near-dup property tests ---------------------------
def _py_portable_hash(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = 5, w: int = 4) -> set[int]:
    t = text.strip().lower()
    if len(t) < k:
        return set()
    hs = [_py_portable_hash(t[i : i + k]) for i in range(len(t) - k + 1)]
    if len(hs) < w:
        return set()
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.text(alphabet="abc d", min_size=0, max_size=40), min_size=1, max_size=6
    )
)
def test_winnowing_matches_python_reference(spark, texts):
    from pyspark.sql import functions as F

    from weather_data_pipeline_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnowing_fingerprints(F.col("text")).alias("fps")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), (i, t)


def test_simhash_near_dup_finds_small_perturbations(spark):
    # documents differing by one word must land within small hamming
    # distance; the banded candidate generation must FIND every pair the
    # exact filter would pass (pigeonhole guarantee, verified empirically
    # by comparing against the brute-force all-pairs filter)
    import itertools

    from pyspark.sql import functions as F

    from weather_data_pipeline_spark.operators.dedup import (
        simhash_expr,
        simhash_near_dup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base.replace("lazy", "hazy"), base.replace("dog", "cat"),
             "completely different words entirely unrelated content here now",
             base.replace("quick", "slow")]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(df, max_hamming=1, bits=48, n_bands=2).collect()
    }
    # brute force: exact simhash per doc, all pairs with hamming <= 1
    sh = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", simhash_expr(F.col("text"), 48).alias("sh")
        ).collect()
    }
    want = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for a, b in itertools.combinations(sorted(sh), 2)
        if bin(sh[a] ^ sh[b]).count("1") <= 1
    }
    assert got == want


# --- drift statistics vs a straight numpy/pandas reference ------------------
import datetime as _dt

import numpy as _np

from weather_data_pipeline_spark.operators import drift as DR

_T0 = _dt.datetime(2024, 1, 1)

drift_halves = st.tuples(
    st.lists(st.floats(0, 500, allow_nan=False).map(lambda v: round(v, 2)),
             min_size=1, max_size=25),
    st.lists(st.floats(0, 500, allow_nan=False).map(lambda v: round(v, 2)),
             min_size=1, max_size=25),
)


def _drift_df(spark, half_a, half_b):
    rows = [(_T0 + _dt.timedelta(seconds=i), float(v), "x")
            for i, v in enumerate(half_a)]
    rows += [(_T0 + _dt.timedelta(hours=10, seconds=i), float(v), "x")
             for i, v in enumerate(half_b)]
    return spark.createDataFrame(rows, "ts timestamp, value double, event_type string")


def _ref_ks(a, b):
    a, b = _np.sort(_np.asarray(a)), _np.sort(_np.asarray(b))
    pooled = _np.unique(_np.concatenate([a, b]))
    ca = _np.searchsorted(a, pooled, side="right") / len(a)
    cb = _np.searchsorted(b, pooled, side="right") / len(b)
    return float(_np.max(_np.abs(ca - cb)))


def _ref_psi(a, b, width=50.0, n_bins=10, alpha=0.5):
    ha = _np.minimum(_np.floor(_np.asarray(a) / width), n_bins - 1).astype(int)
    hb = _np.minimum(_np.floor(_np.asarray(b) / width), n_bins - 1).astype(int)
    out = 0.0
    for i in sorted(set(ha) | set(hb)):
        pa = ((ha == i).sum() + alpha) / (len(a) + alpha * n_bins)
        pb = ((hb == i).sum() + alpha) / (len(b) + alpha * n_bins)
        out += round((pa - pb) * math.log(pa / pb), 6)
    return out


@given(drift_halves)
@SET
def test_ks_matches_numpy_reference(spark, halves):
    a, b = halves
    got = DR.ks_table(_drift_df(spark, a, b)).collect()[0]
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert math.isclose(got["ks_stat"], _ref_ks(a, b), abs_tol=1e-6)


@given(drift_halves)
@SET
def test_psi_matches_numpy_reference(spark, halves):
    a, b = halves
    rows = DR.psi_table(_drift_df(spark, a, b)).collect()
    assert math.isclose(rows[0]["psi"], round(_ref_psi(a, b), 6), abs_tol=2e-6)
    assert sum(r["n_a"] for r in rows) == len(a)
    assert sum(r["n_b"] for r in rows) == len(b)
