"""Shared pytest fixtures: one SparkSession per test session, plus a
DuckDB-backed oracle comparator that mirrors the driver's t2 check
(row count + schema-compatible columns + order-insensitive values).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from timeseriesdb_spark.session import get_spark
from timeseriesdb_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_TSDB_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="spark-tsdb-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values; unify dtypes the way
    an order-insensitive value hash would see them."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # dates come back as objects from some paths
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def assert_matches_oracle(spark_df, duck_con, sql: str) -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(duck_con.execute(sql).fetch_df())
    assert list(got.columns) == list(exp.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count differs: spark={len(got)} oracle={len(exp)}"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if g.dtype.kind == "f":
            # bit-exact is the bar (the driver hashes values); NaN==NaN
            mism = ~((g == e) | (np.isnan(g) & np.isnan(e)))
        elif g.dtype.kind == "M":
            # the driver hashes repr(NaT) == repr(NaT); mirror that
            mism = ~((g == e) | (np.isnat(g) & np.isnat(e)))
        else:
            mism = g != e
        bad = int(mism.sum())
        assert bad == 0, (
            f"column {c}: {bad}/{len(g)} mismatches; "
            f"first: spark={g[mism][:3]} oracle={e[mism][:3]}"
        )
