"""Shared fixtures: session-scoped SparkSession + DuckDB oracle helpers.

Mirrors the driver's correctness gate: run the Spark query and the oracle SQL
on the same parquet, sort columns by name, compare values order-insensitively.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_pipeline_spark.session import TABLES, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wdp-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype("int64").astype("object")
            out.loc[s.isna(), c] = None
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64", errors="ignore")
    # order-insensitive: sort rows by stringified tuple
    key = out.apply(lambda r: tuple(str(v) for v in r), axis=1)
    out = out.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)
    return out


def assert_frames_match(spark_df, duck_pdf: pd.DataFrame, name: str = "?"):
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row counts {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            ok = (g.isna() & w.isna()) | (g == w)
            bad = ~ok
            assert not bad.any(), (
                f"{name}: column {c} mismatch at {int(bad.sum())} rows, e.g. "
                f"{list(zip(g[bad].head(3), w[bad].head(3)))}"
            )
        else:
            ga = g.where(pd.notna(g), None).astype("object")
            wa = w.where(pd.notna(w), None).astype("object")
            neq = ga.ne(wa) & ~(ga.isna() & wa.isna())
            assert not neq.any(), (
                f"{name}: column {c} mismatch at {int(neq.sum())} rows, e.g. "
                f"{list(zip(ga[neq].head(3), wa[neq].head(3)))}"
            )
