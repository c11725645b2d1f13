"""Numerical-property tests for the kernel operators (the reference's
loose-oracle strategy, segment.rs:882-906: assert bounded error /
invariants rather than SQL equality).
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import mlkernels
from timeseriesdb_spark.registry import QUERIES


def test_ncc_self_is_one():
    x = np.sin(np.linspace(0, 20, 500))
    c, lag = mlkernels._ncc_max(x, x)
    assert abs(c - 1.0) < 1e-9
    assert lag == 0


def test_ncc_detects_shift():
    rng = np.random.default_rng(0)
    x = rng.normal(size=400)
    y = np.roll(x, 7)  # y lags x by 7
    c, lag = mlkernels._ncc_max(x, y)
    assert c > 0.9
    assert abs(lag) == 7


def test_lcce_dictionary_members_self_correlate(spark):
    df = QUERIES["q_lcce"](spark, SF_DIR)
    rows = df.filter(
        (df.user_id < mlkernels.DICT_K) & (df.user_id == df.dict_id)
    ).collect()
    assert len(rows) == mlkernels.DICT_K
    for r in rows:
        # a dictionary member matched against itself: nccc == 1, lag 0
        assert abs(r.nccc - 1.0) < 1e-6, r
        assert r.best_lag == 0, r


def test_grail_embedding_shape_and_determinism(spark):
    df = QUERIES["q_grail_embed"](spark, SF_DIR)
    pdf = df.toPandas()
    n_signals = pdf["user_id"].nunique()
    assert len(pdf) == n_signals * mlkernels.EMBED_DIM
    assert pdf["coeff"].notna().all()
    # deterministic across runs
    pdf2 = QUERIES["q_grail_embed"](spark, SF_DIR).toPandas()
    a = pdf.sort_values(["user_id", "dim"]).reset_index(drop=True)
    b = pdf2.sort_values(["user_id", "dim"]).reset_index(drop=True)
    assert np.allclose(a["coeff"], b["coeff"])
