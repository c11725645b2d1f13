"""Model-scoring drift checks (the lossyML matrix): degradation with
chunk=1 is the identity, so agreement must be exactly 1.0; real PAA
degradation keeps agreement a valid, deterministic rate.
"""

from __future__ import annotations

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import mlscoring


def _rates(df):
    return {
        r.user_id: (r.n_segments, r.n_agree, r.agree_rate) for r in df.collect()
    }


import pytest

FAMILIES = ["q_kmeans_drift", "q_tree_drift", "q_knn_drift", "q_forest_drift"]


@pytest.mark.parametrize("family", FAMILIES)
def test_drift_identity_degradation(spark, monkeypatch, family):
    monkeypatch.setattr(mlscoring, "PAA_CHUNK", 1)
    rows = _rates(mlscoring.QUERIES[family](spark, SF_DIR))
    assert rows
    for n, agree, rate in rows.values():
        if n:
            assert agree == n and rate == 1.0


@pytest.mark.parametrize("family", FAMILIES)
def test_drift_agreement_bounded_and_deterministic(spark, family):
    a = _rates(mlscoring.QUERIES[family](spark, SF_DIR))
    assert a
    for n, agree, rate in a.values():
        assert 0 <= agree <= n
        if n:
            assert 0.0 <= rate <= 1.0
    assert a == _rates(mlscoring.QUERIES[family](spark, SF_DIR))


def test_tree_model_is_deterministic_and_bounded(spark):
    t1 = mlscoring._train_tree(spark, SF_DIR)
    mlscoring._TREE_CACHE.clear()
    t2 = mlscoring._train_tree(spark, SF_DIR)
    assert t1 == t2
    assert len(t1) == 3  # root + two children: a broadcast-sized model
    for j, thr in t1:
        assert 0 <= j < 4 and isinstance(thr, float)


FFT_FAMILIES = [
    f"q_{f}_drift_{t}"
    for f in ("kmeans", "tree", "knn", "forest")
    for t in ("fft", "pla")
]


@pytest.mark.parametrize("family", FFT_FAMILIES)
def test_fft_drift_agreement_bounded_and_deterministic(spark, family):
    a = _rates(mlscoring.QUERIES[family](spark, SF_DIR))
    assert a
    for n, agree, rate in a.values():
        assert 0 <= agree <= n
        if n:
            assert 0.0 <= rate <= 1.0
    assert a == _rates(mlscoring.QUERIES[family](spark, SF_DIR))


def test_fft_tier_segments_match_paa_tier(spark):
    """The FFT tier buckets by q_fft_recon's pos, the PAA tier by its
    own row_number — both over (ts, event_id) per signal, so every
    signal must report the SAME number of complete segments. This is
    the alignment claim that makes raw labels comparable across
    tiers."""
    paa = _rates(mlscoring.QUERIES["q_kmeans_drift"](spark, SF_DIR))
    fft = _rates(mlscoring.QUERIES["q_kmeans_drift_fft"](spark, SF_DIR))
    pla = _rates(mlscoring.QUERIES["q_kmeans_drift_pla"](spark, SF_DIR))
    assert set(paa) == set(fft) == set(pla)
    for u in paa:
        assert paa[u][0] == fft[u][0] == pla[u][0], u
