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
    want = raw["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean()
    pd.testing.assert_series_equal(
        got["ewma"].reset_index(drop=True),
        want.reset_index(drop=True),
        check_names=False,
    )
    # s_0 = v_0 (adjust=False seed)
    assert got["ewma"].iloc[0] == raw["value"].iloc[0]


def test_holt_forecast_exact_on_linear_series(spark, tmp_path):
    """A perfectly linear series v_t = a + b·t must forecast exactly on
    the line: Holt's recurrence is exact for linear signals (level
    tracks the line, trend converges to b immediately with the
    v1−v0 seed)."""
    import pandas as pd

    from timeseriesdb_spark.operators.tsanalytics import (
        HOLT_H,
        q_holt_forecast,
    )

    n = 50
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "user_id": [7] * n,
            "event_type": ["view"] * n,
            "value": [10.0 + 2.5 * t for t in range(n)],
            "props": ["{}"] * n,
        }
    )
    d = str(tmp_path / "lin")
    spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
    out = (
        q_holt_forecast(spark, d)
        .toPandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    assert len(out) == HOLT_H
    last = 10.0 + 2.5 * (n - 1)
    for _, row in out.iterrows():
        assert abs(row["forecast"] - (last + 2.5 * row["h"])) < 1e-6
        assert abs(row["trend"] - 2.5) < 1e-6


def test_counter_rate_increase_nonnegative(spark):
    pdf = q_counter_rate(spark, SF_DIR).toPandas()
    assert (pdf["increase"] >= 0).all()
    assert (pdf["span_sec"] >= 0).all()

def test_recurrences_bit_identical_across_tiny_arrow_chunks(spark):
    """The O(1)-carry contract of stateful_grouped_scan: with Arrow
    batches forced down to 7 rows, every signal straddles many chunks,
    so the kernels run almost entirely off carried state — and the
    output must be BIT-identical to the large-batch run (the same
    guarantee the streaming kernels pin for micro-batches)."""
    from timeseriesdb_spark.operators.tsanalytics import q_holt_forecast

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)

    def snap(fn, cols):
        return sorted(
            tuple(row[c] for c in cols) for row in fn(spark, SF_DIR).collect()
        )

    big_e = snap(q_ewma, ["user_id", "event_id", "ewma"])
    big_h = snap(q_holt_forecast, ["user_id", "h", "forecast", "level", "trend"])
    try:
        spark.conf.set(key, "7")
        small_e = snap(q_ewma, ["user_id", "event_id", "ewma"])
        small_h = snap(
            q_holt_forecast, ["user_id", "h", "forecast", "level", "trend"]
        )
    finally:
        spark.conf.set(key, old)
    assert small_e == big_e
    assert small_h == big_h
