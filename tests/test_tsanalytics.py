"""Properties for the monitoring analytics: the EWMA kernel matches
pandas' reference recurrence exactly, and counter-rate increase is
non-negative by construction."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.tsanalytics import (
    EWMA_ALPHA,
    q_counter_rate,
    q_ewma,
)
from timeseriesdb_spark.tables import load_table


def test_ewma_matches_pandas_recurrence(spark):
    out = q_ewma(spark, SF_DIR)
    one_user = out.limit(1).collect()[0]["user_id"]
    got = (
        out.filter(out.user_id == one_user)
        .orderBy("ts", "event_id")
        .toPandas()
    )
    raw = (
        load_table(spark, SF_DIR, "events")
        .filter(f"user_id = {one_user}")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    want = (
        raw["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean().round(6)
    )
    pd.testing.assert_series_equal(
        got["ewma"].reset_index(drop=True),
        want.reset_index(drop=True),
        check_names=False,
    )
    # s_0 = v_0 (adjust=False seed)
    assert got["ewma"].iloc[0] == round(raw["value"].iloc[0], 6)


def test_counter_rate_increase_nonnegative(spark):
    pdf = q_counter_rate(spark, SF_DIR).toPandas()
    assert (pdf["increase"] >= 0).all()
    assert (pdf["span_sec"] >= 0).all()
