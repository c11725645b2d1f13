"""ANN correctness properties: IVF with full probing is exact
(== brute force), partial probing trades recall for the scan skip.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import similarity
from timeseriesdb_spark.registry import QUERIES


def _topk_ids(df):
    return [r.vec_id for r in df.collect()]


def test_ivf_full_probe_is_exact(spark, monkeypatch):
    monkeypatch.setattr(similarity, "IVF_NPROBE", similarity.IVF_CELLS)
    brute = _topk_ids(QUERIES["q_ann_topk"](spark, SF_DIR))
    ivf = _topk_ids(similarity.q_ann_ivf(spark, SF_DIR))
    assert ivf == brute


def test_ivf_partial_probe_recall(spark):
    brute = set(_topk_ids(QUERIES["q_ann_topk"](spark, SF_DIR)))
    ivf = set(_topk_ids(QUERIES["q_ann_ivf"](spark, SF_DIR)))
    assert len(ivf) == similarity.TOP_K
    recall = len(brute & ivf) / len(brute)
    # nprobe/cells = 2/8; cosine-homogeneous synthetic corpus → recall
    # well above the 25% scan fraction
    assert recall >= 0.3, recall


def test_ivf_results_are_real_neighbors(spark):
    rows = QUERIES["q_ann_ivf"](spark, SF_DIR).collect()
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)
