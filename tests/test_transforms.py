"""Round-trip error-bound tests for the lossy transforms — the
reference's own oracle style (compare_vectors: mean error < 0.1,
segment.rs:882-906): lossy answers must stay close to the original,
and structural invariants must hold exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.registry import QUERIES


def test_fft_recon_error_bounded(spark):
    """Keeping 10% of coefficients must reconstruct with small
    relative error on the energy scale of the signal."""
    pdf = QUERIES["q_fft_recon"](spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    for uid, g in pdf.groupby("user_id"):
        x = g.sort_values("pos")["value"].to_numpy()
        y = g.sort_values("pos")["recon"].to_numpy()
        scale = np.sqrt((x**2).mean()) or 1.0
        rel = np.abs(x - y).mean() / scale
        assert rel < 0.5, (uid, rel)
    # reconstruction preserves the mean (DC coefficient always kept:
    # it is among the largest by magnitude for these signals)
    means = pdf.groupby("user_id").agg(v=("value", "mean"), r=("recon", "mean"))
    assert np.allclose(means["v"], means["r"], atol=1e-6)


def test_pla_lttb_invariants(spark):
    """LTTB keeps endpoints, emits ~ratio·n points, and output values
    are a subset of input values per signal."""
    out = QUERIES["q_pla_lttb"](spark, SF_DIR).toPandas()
    from timeseriesdb_spark.tables import load_table

    full = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "value"
    ).toPandas()
    for uid, g in full.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        kept = out[out.user_id == uid].sort_values(["ts", "event_id"])
        n, k = len(g), len(kept)
        assert 3 <= k <= max(3, int(n * 0.1) + 1), (uid, n, k)
        # endpoints kept
        assert kept["event_id"].iloc[0] == g["event_id"].iloc[0]
        assert kept["event_id"].iloc[-1] == g["event_id"].iloc[-1]
        # subset of original rows
        assert set(kept["event_id"]) <= set(g["event_id"])


def test_paa_means_reduce_error_with_chunk(spark):
    """PAA chunk means average the chunk exactly: reconstruct by
    repeat and check against the direct chunk means."""
    paa = QUERIES["q_paa"](spark, SF_DIR)
    # chunk_avg must equal avg of the chunk's values — already oracle-
    # checked; here pin the structural bound: |chunks| == ceil(n/chunk)
    from timeseriesdb_spark.operators.windows import PAA_CHUNK
    from timeseriesdb_spark.tables import load_table

    counts = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    got = paa.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    for uid in counts.index:
        assert got[uid] == -(-counts[uid] // PAA_CHUNK), uid


def test_matrix_profile_planted_motif(spark):
    """A planted repeated motif must produce near-zero profile values
    at both sites, each pointing (mp_idx) at the other; a signal of
    otherwise-noise has higher profile elsewhere."""
    import numpy as np
    import pandas as pd

    from timeseriesdb_spark.operators.transforms import MP_WINDOW

    rng = np.random.default_rng(7)
    n = 200
    x = rng.normal(0, 1, n)
    motif = rng.normal(0, 1, MP_WINDOW)
    a, b = 30, 140
    x[a : a + MP_WINDOW] = motif
    x[b : b + MP_WINDOW] = motif
    ts = pd.date_range("2024-01-01", periods=n, freq="1min")
    pdf = pd.DataFrame(
        {
            "user_id": np.int64(1),
            "ts": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "value": x,
        }
    )
    src = spark.createDataFrame(pdf)

    from timeseriesdb_spark.operators.transforms import packed_grouped_map, q_matrix_profile  # noqa: F401
    # Drive the same kernel through the declared query path by writing
    # a one-signal events frame to parquet and pointing the query at it
    import tempfile, os

    d = tempfile.mkdtemp()
    src.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = q_matrix_profile(spark, d).toPandas().sort_values("pos")

    row_a = out[out.pos == a].iloc[0]
    row_b = out[out.pos == b].iloc[0]
    assert row_a["mp"] < 1e-5, row_a
    assert row_b["mp"] < 1e-5, row_b
    assert row_a["mp_idx"] == b and row_b["mp_idx"] == a
    # discord side: the median profile over noise is clearly larger
    assert out["mp"].median() > 1.0
    # profile length = n - m + 1
    assert len(out) == n - MP_WINDOW + 1


def test_rolling_quantile_selection_invariants(spark):
    """q_rolling_quantile's type-1 (selection) contract: med and p90
    are EXISTING samples from the signal, med ≤ p90, and the frame
    count ramps 1..RQ_ROWS then saturates."""
    from timeseriesdb_spark.operators.windows import RQ_ROWS
    from timeseriesdb_spark.tables import load_table

    out = QUERIES["q_rolling_quantile"](spark, SF_DIR).toPandas()
    full = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "value")
        .toPandas()
    )
    assert len(out) == len(full)
    assert (out["med"] <= out["p90"]).all()
    assert out["n_frame"].between(1, RQ_ROWS).all()
    vals = full.groupby("user_id")["value"].agg(set)
    for uid, g in out.groupby("user_id"):
        s = vals[uid]
        assert set(g["med"]) <= s and set(g["p90"]) <= s


def test_fft_twiddle_table_matches_kernel_inline():
    """fft_twiddles_int (the oracle factory's table) must equal the
    kernel's inline computation for every series length in play —
    they are deliberately separate code paths (a kernel closure may
    not reference module functions), so pin the identity directly."""
    from timeseriesdb_spark.operators.transforms import (
        FFT_TWS,
        fft_twiddles_int,
    )

    for n in (45, 49, 63, 64, 86, 99):
        ang = 2.0 * np.pi * np.arange(n, dtype=np.float64) / float(n)
        ca, sa = np.cos(ang), np.sin(ang)
        c = (np.sign(ca) * np.floor(np.abs(ca) * FFT_TWS + 0.5)).astype(
            np.int64
        )
        s = (np.sign(sa) * np.floor(np.abs(sa) * FFT_TWS + 0.5)).astype(
            np.int64
        )
        fc, fs = fft_twiddles_int(n)
        assert (fc == c).all() and (fs == s).all()
        assert fc[0] == FFT_TWS and fs[0] == 0  # DC exactness


def test_pla_recon_reproduces_kept_points_and_interpolates(spark):
    """r12: q_pla_recon must (a) cover every original position exactly
    once, (b) reproduce each LTTB-kept point's value to the cents
    grid exactly, and (c) keep every interpolated value inside the
    cents interval of its bracketing kept points (a line segment never
    leaves its endpoints' range)."""
    rec = QUERIES["q_pla_recon"](spark, SF_DIR).toPandas()
    kept = QUERIES["q_pla_lttb"](spark, SF_DIR).toPandas()
    from timeseriesdb_spark.tables import load_table

    full = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
    )
    for uid, g in full.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        r = rec[rec.user_id == uid].sort_values("pos").reset_index(drop=True)
        assert len(r) == len(g)  # (a) full coverage
        assert (r["pos"].to_numpy() == np.arange(len(g))).all()
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5)
        k = kept[kept.user_id == uid].sort_values(["ts", "event_id"])
        kpos = np.sort(
            g.reset_index().merge(k[["event_id"]], on="event_id")["index"].to_numpy()
        )
        rc = r["recon"].to_numpy() * 100.0  # recon in cents (exact 1e-6 grid)
        # (b) kept points exact on the cents grid
        assert np.abs(rc[kpos] - cents[kpos]).max() < 1e-6, uid
        # (c) interp bounded by bracketing endpoints
        for a, b in zip(kpos[:-1], kpos[1:]):
            lo, hi = min(cents[a], cents[b]), max(cents[a], cents[b])
            seg = rc[a : b + 1]
            assert (seg >= lo - 1e-6).all() and (seg <= hi + 1e-6).all(), uid
