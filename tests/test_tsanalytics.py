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


def _write_events(spark, tmp_path, pdf, name="ev"):
    d = str(tmp_path / name)
    spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
    return d


def test_theilsen_exact_on_linear_series(spark, tmp_path):
    """On v_t = 10 + 2.5·t/min every pairwise slope is the SAME
    rational (2.5 units / 60 s), so the median must hit its exact
    micro-unit quantization: floor(250·10¹⁰ / 6·10⁷) = 41_666."""
    import pandas as pd

    from timeseriesdb_spark.operators.tsanalytics import (
        THEILSEN_SAMPLE_CAP,
        q_theilsen_trend,
    )

    n = 40
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
    out = q_theilsen_trend(spark, _write_events(spark, tmp_path, pdf)).collect()
    assert len(out) == 1
    k = min(n, THEILSEN_SAMPLE_CAP)
    assert out[0]["n_pairs"] == k * (k - 1) // 2
    assert out[0]["slope_micro"] == 41_666
    assert abs(out[0]["slope_per_s"] - 0.041666) < 1e-12


def test_theilsen_shrugs_off_outliers(spark, tmp_path):
    """20% of points spiked by +1000 leaves 0.8² = 64% of pairs clean
    — the median slope must still be the clean line's (the breakdown
    robustness OLS lacks; this is the reason the operator exists)."""
    import pandas as pd

    from timeseriesdb_spark.operators.tsanalytics import q_theilsen_trend

    n = 40
    vals = [10.0 + 2.5 * t for t in range(n)]
    for t in range(0, n, 5):  # every 5th point is wrecked
        vals[t] += 1000.0
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "user_id": [7] * n,
            "event_type": ["view"] * n,
            "value": vals,
            "props": ["{}"] * n,
        }
    )
    out = q_theilsen_trend(spark, _write_events(spark, tmp_path, pdf)).collect()
    assert out[0]["slope_micro"] == 41_666


def test_theilsen_hot_signal_pair_fanout_is_capped(spark, tmp_path):
    """A hot signal with 10× the cap's history must produce exactly
    K·(K−1)/2 pairs (K = THEILSEN_SAMPLE_CAP), and the sample must be
    the deterministic md5-window one — recomputed here in pure Python
    (hashlib.md5 of the decimal event_id string, the same bytes both
    engines hash), the capped median must equal Theil-Sen run directly
    on that recomputed sample."""
    import hashlib

    import pandas as pd

    from timeseriesdb_spark.operators.tsanalytics import (
        THEILSEN_SAMPLE_CAP,
        q_theilsen_trend,
    )

    n = THEILSEN_SAMPLE_CAP * 10
    rng_vals = [10.0 + 0.37 * t + (7.0 if t % 11 == 0 else 0.0) for t in range(n)]
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "user_id": [3] * n,
            "event_type": ["view"] * n,
            "value": rng_vals,
            "props": ["{}"] * n,
        }
    )
    out = q_theilsen_trend(spark, _write_events(spark, tmp_path, pdf)).collect()
    assert len(out) == 1
    k = THEILSEN_SAMPLE_CAP
    assert out[0]["n_pairs"] == k * (k - 1) // 2

    # replay the md5-window sample and the integer slope median in Python
    order = sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    sample = sorted(order[:k])  # event_id ascending == us ascending here
    us = [int(pd.Timestamp("2024-01-01").value // 1000) + 60_000_000 * i for i in sample]
    vu = [round(rng_vals[i] * 100) for i in sample]
    slopes = []
    for a in range(k):
        for b in range(a + 1, k):
            num, den = (vu[b] - vu[a]) * 10_000_000_000, us[b] - us[a]
            slopes.append(num // den)  # Python // is floor — same identity
    slopes.sort()
    assert out[0]["slope_micro"] == slopes[(len(slopes) + 1) // 2 - 1]


def test_theilsen_span_overflow_fails_loud(spark, tmp_path):
    """A pair whose value span exceeds THEILSEN_SPAN_CENTS must raise
    (raise_error in the plan) rather than silently wrap — pinning the
    cross-engine overflow contract from the docstring."""
    import pandas as pd
    import pytest

    from timeseriesdb_spark.operators.tsanalytics import q_theilsen_trend

    pdf = pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": pd.date_range("2024-01-01", periods=2, freq="1min"),
            "user_id": [5, 5],
            "event_type": ["view", "view"],
            "value": [0.0, 2e7],  # 2e9 cents > THEILSEN_SPAN_CENTS
            "props": ["{}", "{}"],
        }
    )
    with pytest.raises(Exception, match="int64-safe bound"):
        q_theilsen_trend(spark, _write_events(spark, tmp_path, pdf)).collect()


def test_watermark_lateness_matches_pandas_cummax(spark, tmp_path):
    """Arrival order = event_id; lateness = cummax(event time) − own
    event time. Recompute the whole profile in pandas on a crafted
    out-of-order stream and compare every column, and pin that an
    in-order stream reports all-zero lateness."""
    import math

    import pandas as pd

    from timeseriesdb_spark.operators.tsanalytics import (
        WM_PCTS,
        q_watermark_lateness,
    )

    n = 200
    ts = list(pd.date_range("2024-01-01", periods=n, freq="30s"))
    # swap a known 10% of adjacent-ish pairs 3 slots apart
    for i in range(10, n - 5, 20):
        ts[i], ts[i + 3] = ts[i + 3], ts[i]
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": [i % 7 for i in range(n)],
            "event_type": ["view" if i % 2 else "click" for i in range(n)],
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    )
    out = (
        q_watermark_lateness(spark, _write_events(spark, tmp_path, pdf))
        .toPandas()
        .set_index("event_type")
    )
    us = pdf["ts"].astype("int64") // 1000
    late = us.cummax() - us
    for et, g in pd.DataFrame(
        {"et": pdf["event_type"], "late": late}
    ).groupby("et"):
        row = out.loc[et]
        lat = g["late"].sort_values().reset_index(drop=True)
        n_t = len(lat)
        assert row["n_events"] == n_t
        assert row["n_late"] == int((g["late"] > 0).sum())
        assert row["max_late_us"] == int(g["late"].max())
        assert row["share_late_ppm"] == int((g["late"] > 0).sum()) * 10**6 // n_t
        for p in WM_PCTS:
            r = math.ceil(n_t * p / 100)
            assert row[f"p{p}_late_us"] == int(lat.iloc[r - 1]), (et, p)
    # fully in-order stream → zero lateness everywhere
    pdf2 = pdf.copy()
    pdf2["ts"] = list(pd.date_range("2024-01-01", periods=n, freq="30s"))
    out2 = q_watermark_lateness(
        spark, _write_events(spark, tmp_path, pdf2, "inorder")
    ).toPandas()
    assert (out2["n_late"] == 0).all()
    assert (out2["max_late_us"] == 0).all()


def test_bigram_backoff_bounds(spark):
    """Stupid-backoff scores are probabilities ≤ 1 (c12 ≤ c1 for the
    seen branch; α·(c2+1)/(N+V) < 1 for the backoff branch), so every
    mean log10 is ≤ 0, and the backoff count is bounded by the bigram
    count."""
    from timeseriesdb_spark.operators.text import q_bigram_backoff

    pdf = q_bigram_backoff(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    assert (pdf["mean_lp10"] <= 0).all()
    assert (pdf["n_backoff"] <= pdf["n_bigrams"]).all()
    assert (pdf["n_backoff"] >= 0).all()


def test_holt_winters_periodic_series_forecasts_the_pattern(spark, tmp_path):
    """On a pure m-periodic series the HW state is invariant (level
    stays the seed mean, trend 0, seasonals the seed offsets), so the
    one-season-ahead forecast must reproduce the pattern itself."""
    import pandas as pd

    from timeseriesdb_spark.operators.tsanalytics import (
        HW_H,
        HW_M,
        q_holt_winters,
    )

    pattern = [10.0, 40.0, 25.0, 5.0, 60.0, 35.0, 20.0]
    n_days = HW_M * 6
    pdf = pd.DataFrame(
        {
            "event_id": range(n_days),
            "ts": pd.date_range("2024-01-01", periods=n_days, freq="1D"),
            "user_id": [3] * n_days,
            "event_type": ["view"] * n_days,
            "value": [pattern[d % HW_M] for d in range(n_days)],
            "props": ["{}"] * n_days,
        }
    )
    d = str(tmp_path / "per")
    spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
    out = (
        q_holt_winters(spark, d)
        .orderBy("h")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(out) == HW_H
    assert (out["trend"].abs() < 1e-9).all()
    for _, row in out.iterrows():
        want = pattern[(n_days + int(row["h"]) - 1) % HW_M]
        assert abs(row["forecast"] - want) < 1e-9, (row["h"], want)


def test_holt_winters_chunk_seams_bit_identical(spark):
    """7-row Arrow chunks: the (level, trend, s1..s7) carry must make
    chunked execution bit-identical (the q_ewma discipline)."""
    from timeseriesdb_spark.operators.tsanalytics import q_holt_winters

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)

    def snap():
        return sorted(
            tuple(row[c] for c in ["user_id", "h", "forecast", "level",
                                   "trend", "seasonal"])
            for row in q_holt_winters(spark, SF_DIR).collect()
        )

    big = snap()
    try:
        spark.conf.set(key, "7")
        small = snap()
    finally:
        spark.conf.set(key, old)
    assert small == big
