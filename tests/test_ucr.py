"""UCR-format 1-NN harness parity (BASELINE.md row 1): the committed
fixture pins accuracy under the reference's exact harness semantics —
skip the first file line, squared-L2 argmin with first-minimum
tie-break in train file order, accuracy = correct/n_test
(knn/main.rs:51-63, knn/mod.rs:25-52,310-316)."""

from __future__ import annotations

import os

import numpy as np

from timeseriesdb_spark.operators.ucr import (
    read_ucr_test,
    read_ucr_train,
    ucr_accuracy,
    ucr_classify,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
TRAIN = os.path.join(FIX, "ucr_synth_TRAIN.csv")
TEST = os.path.join(FIX, "ucr_synth_TEST.csv")
L = 32

# pinned constants (scripts/make_ucr_fixture.py, seed 20260814):
PINNED_L2 = (30, 26)    # (n_test, n_correct) → accuracy 0.8666..
PINNED_DTW8 = (30, 26)


def _numpy_oracle():
    tl, tm = read_ucr_train(TRAIN)
    sl, sm = read_ucr_train(TEST)  # same slurp semantics for the oracle
    d2 = ((sm[:, None, :] - tm[None, :, :]) ** 2).sum(axis=2)
    pred = tl[d2.argmin(axis=1)]
    return sl, pred


def test_skip_first_line_both_sides(spark):
    # files have 31 lines; the harness must see 30 rows (slurp_file
    # .skip(1) — knn_buff.csv's ACSF1 row is 53/99, not 53/100)
    with open(TEST) as f:
        assert len(f.readlines()) == 31
    assert read_ucr_test(spark, TEST, L).count() == 30
    labels, mat = read_ucr_train(TRAIN)
    assert mat.shape == (30, L)


def test_l2_accuracy_pinned(spark):
    row = ucr_accuracy(spark, TRAIN, TEST, L).collect()[0]
    assert (row.n_test, row.n_correct) == PINNED_L2
    assert abs(row.accuracy - PINNED_L2[1] / PINNED_L2[0]) < 1e-12


def test_dtw_accuracy_pinned(spark):
    row = ucr_accuracy(spark, TRAIN, TEST, L, band=8).collect()[0]
    assert (row.n_test, row.n_correct) == PINNED_DTW8


def test_per_row_predictions_match_reference_semantics(spark):
    # Spark pipeline vs a direct-difference numpy oracle (the exact
    # distance_sqr form of knn/mod.rs:303): every prediction equal,
    # not just the aggregate.
    sl, pred = _numpy_oracle()
    got = ucr_classify(spark, TRAIN, TEST, L).toPandas()
    # mapInPandas may reorder rows across partitions; compare as
    # multisets of (true, pred) — with per-class noise the pairs are
    # unique enough, and the aggregate pins the rest
    want = sorted(zip(sl.tolist(), pred.tolist()))
    have = sorted(zip(got.true_label.tolist(), got.pred_label.tolist()))
    assert have == want


def test_tiebreak_first_train_row_wins(spark, tmp_path):
    # two identical train rows with different labels: the FIRST (file
    # order) must win, as in Rust's min_by first-minimum contract
    train = tmp_path / "tb_TRAIN.csv"
    test = tmp_path / "tb_TEST.csv"
    vec = ",".join(["0.5"] * 4)
    train.write_text(
        f"9,{vec}\n"   # dropped first line
        f"7,{vec}\n"   # first real row — must win the tie
        f"3,{vec}\n"
    )
    test.write_text(f"9,{vec}\n7,{vec}\n")
    got = ucr_classify(spark, str(train), str(test), 4).collect()
    assert len(got) == 1  # test skip(1) applied
    assert got[0].pred_label == 7
