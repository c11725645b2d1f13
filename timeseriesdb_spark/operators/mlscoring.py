"""ML-model scoring over segments (SURVEY.md §2.9): the reference
scores classic-ML models — smartcore kmeans, decision tree, knn and
random forest — on each segment's values to measure how lossy
compression shifts predicted labels (buffer_pool.rs:798-938,
lossyML/src/main.rs:26-120). All four families are covered here.

Spark-first shape shared by every family: the model is TRAINED ONCE
driver-side on a bounded sample (the reference trains on a dictionary
file), broadcast, and SCORED distributed via a grouped-map UDF —
training data never exceeds the sample, scoring never touches the
driver. The drift measurement is the reference's actual experiment:
label each segment under raw values and under PAA-degraded values and
report the agreement rate — "does lossy aging change downstream ML
answers", which is what lossyML exists to quantify.

Scoring is vectorized per signal: all segments reshape into one
(n_seg, seg_rows) matrix, features come from axis reductions, and each
family's labeler maps the whole (n_seg, 4) feature matrix to labels in
one numpy pass — no per-segment Python loop. Labelers are built inside
each query function (closures ship by value; executors never import
this module).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

SEG_ROWS = 64     # rows per scored segment (ref segment_size scaled down)
N_CLUSTERS = 4
KMEANS_ITERS = 20
SAMPLE_SIGNALS = 8  # training sample: the dictionary-sized subset
PAA_CHUNK = 8
FOREST_TREES = 4  # bagged depth-2 trees (rforest analog)

DRIFT_SCHEMA = "user_id bigint, n_segments bigint, n_agree bigint, agree_rate double"


def _features(values: np.ndarray) -> np.ndarray:
    """Fixed feature vector per segment: (mean, std, min, max)."""
    return np.array(
        [values.mean(), values.std(), values.min(), values.max()]
    )


_CENTERS_CACHE: dict[str, np.ndarray] = {}
_TREE_CACHE: dict[str, tuple] = {}


def _sample_features(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Segment features of the bounded training sample (the
    dictionary-sized subset the reference trains smartcore models on,
    lossyML/src/main.rs:26-64): SAMPLE_SIGNALS signals, SEG_ROWS
    segments, one (mean, std, min, max) row each."""
    ev = load_table(spark, sf_dir, "events")
    pdf = (
        ev.filter(F.col("user_id") < SAMPLE_SIGNALS)
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    feats = []
    for _, g in pdf.groupby("user_id", sort=True):
        v = g["value"].to_numpy(dtype=np.float64)
        for s in range(0, len(v) - SEG_ROWS + 1, SEG_ROWS):
            feats.append(_features(v[s : s + SEG_ROWS]))
    return np.array(feats)


def _train_kmeans(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Deterministic Lloyd's iterations on segment features of the
    sample signals; init = evenly spaced sorted-by-mean features (no
    RNG → reproducible across runs/partitionings). Cached per sf_dir —
    the training sample is immutable input."""
    if sf_dir in _CENTERS_CACHE:
        return _CENTERS_CACHE[sf_dir]
    X = _sample_features(spark, sf_dir)
    order = np.argsort(X[:, 0], kind="stable")
    centers = X[order[np.linspace(0, len(X) - 1, N_CLUSTERS).astype(int)]]
    for _ in range(KMEANS_ITERS):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for k in range(N_CLUSTERS):
            if (lab == k).any():
                centers[k] = X[lab == k].mean(axis=0)
    _CENTERS_CACHE[sf_dir] = centers
    return centers


def _kmeans_labels(X: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Cluster assignment of feature rows — the shared label space the
    supervised families (knn, forest) train against, standing in for
    the reference's dictionary class labels."""
    return ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)


def _train_tree(spark: SparkSession, sf_dir: str) -> tuple:
    """Depth-2 threshold tree on the sample's segment features — the
    decision-tree family of the reference's per-segment scoring matrix
    (buffer_pool.rs:798-938; lossyML/src/main.rs:66-120). Unsupervised
    k-d-style training, fully deterministic: each node splits on the
    highest-variance feature at its median; the 4 leaves are the
    labels. Returns ((j0,t0),(jL,tL),(jR,tR)) — three (feature_idx,
    threshold) pairs, a broadcast-sized model like the kmeans
    centers."""
    if sf_dir in _TREE_CACHE:
        return _TREE_CACHE[sf_dir]
    X = _sample_features(spark, sf_dir)

    def split(rows: np.ndarray) -> tuple[int, float]:
        j = int(rows.var(axis=0).argmax())
        return j, float(np.median(rows[:, j]))

    j0, t0 = split(X)
    left, right = X[X[:, j0] <= t0], X[X[:, j0] > t0]
    jl, tl = split(left) if len(left) else (j0, t0)
    jr, tr = split(right) if len(right) else (j0, t0)
    tree = ((j0, t0), (jl, tl), (jr, tr))
    _TREE_CACHE[sf_dir] = tree
    return tree


def _train_forest(spark: SparkSession, sf_dir: str) -> list:
    """Bagged depth-2 classifier trees — the rforest analog. Each tree
    trains on a deterministic stride slice of the sample (X[i::T], the
    RNG-free bootstrap), splits like _train_tree, and each LEAF
    predicts the majority kmeans label of its training rows (ties →
    smallest label), so all trees vote in one shared label space.
    Returns [((j0,t0),(jL,tL),(jR,tr), leaf_labels[4]), ...]."""
    X_all = _sample_features(spark, sf_dir)
    y_all = _kmeans_labels(X_all, _train_kmeans(spark, sf_dir))
    forest = []
    for i in range(FOREST_TREES):
        X, y = X_all[i::FOREST_TREES], y_all[i::FOREST_TREES]
        if not len(X):
            X, y = X_all, y_all

        def split(rows: np.ndarray) -> tuple[int, float]:
            j = int(rows.var(axis=0).argmax())
            return j, float(np.median(rows[:, j]))

        j0, t0 = split(X)
        left = X[:, j0] <= t0
        jl, tl = split(X[left]) if left.any() else (j0, t0)
        jr, tr = split(X[~left]) if (~left).any() else (j0, t0)
        leaves = []
        for leaf_mask in (
            left & (X[:, jl] <= tl),
            left & (X[:, jl] > tl),
            ~left & (X[:, jr] <= tr),
            ~left & (X[:, jr] > tr),
        ):
            if leaf_mask.any():
                counts = np.bincount(y[leaf_mask], minlength=N_CLUSTERS)
                leaves.append(int(counts.argmax()))  # tie → smallest label
            else:
                leaves.append(0)
        forest.append(((j0, t0), (jl, tl), (jr, tr), tuple(leaves)))
    return forest


def _drift_query(
    spark: SparkSession, sf_dir: str, bc, make_labeler
) -> DataFrame:
    """Shared drift harness: one grouped-map pass per signal; segments
    reshape to a matrix, features are axis reductions, raw and
    PAA-degraded labels come from the family's vectorized labeler.
    `make_labeler(model) -> (feats (n,4)) -> labels (n,)` must be a
    closure local to the calling query so cloudpickle ships it by
    value (executors cannot import this package)."""
    seg_rows, paa_chunk = SEG_ROWS, PAA_CHUNK

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        label = make_labeler(bc.value)
        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["value"].to_numpy(dtype=np.float64)
        uid = int(pdf["user_id"].iloc[0])
        n_seg = len(v) // seg_rows
        if n_seg == 0:
            return pd.DataFrame(
                {"user_id": [uid], "n_segments": [0], "n_agree": [0],
                 "agree_rate": [None]}
            )
        S = v[: n_seg * seg_rows].reshape(n_seg, seg_rows)
        # PAA degrade: chunk means repeated (paa_compress → decode,
        # segment.rs:516-555)
        D = np.repeat(
            S.reshape(n_seg, seg_rows // paa_chunk, paa_chunk).mean(axis=2),
            paa_chunk,
            axis=1,
        )

        def fmat(M: np.ndarray) -> np.ndarray:
            return np.stack(
                [M.mean(axis=1), M.std(axis=1), M.min(axis=1), M.max(axis=1)],
                axis=1,
            )

        agree = int((label(fmat(S)) == label(fmat(D))).sum())
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_segments": [n_seg],
                "n_agree": [agree],
                "agree_rate": [round(agree / n_seg, 6)],
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return ev.groupBy("user_id").applyInPandas(score, DRIFT_SCHEMA)


def q_kmeans_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal kmeans label agreement between raw and PAA-degraded
    segments (the lossyML measurement). Emits
    (user_id, n_segments, n_agree, agree_rate)."""
    bc = spark.sparkContext.broadcast(_train_kmeans(spark, sf_dir))

    def make_labeler(C):
        def label(feats):
            return ((feats[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)

        return label

    return _drift_query(spark, sf_dir, bc, make_labeler)


def q_tree_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal threshold-tree label agreement between raw and
    PAA-degraded segments — the dtree row of the reference's lossyML
    matrix (buffer_pool.rs:798-938), same harness as q_kmeans_drift:
    train once on the bounded sample, broadcast the 3-node model,
    score distributed in one grouped-map pass."""
    bc = spark.sparkContext.broadcast(_train_tree(spark, sf_dir))

    def make_labeler(tree):
        (j0, t0), (jl, tl), (jr, tr) = tree

        def label(feats):
            left = feats[:, j0] <= t0
            import numpy as np

            return np.where(
                left,
                np.where(feats[:, jl] <= tl, 0, 1),
                np.where(feats[:, jr] <= tr, 2, 3),
            )

        return label

    return _drift_query(spark, sf_dir, bc, make_labeler)


def q_knn_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal 1-NN label agreement — the knn family of the lossyML
    matrix (buffer_pool.rs:798-938; the reference's knn classifies
    each segment against its training dictionary, knn/mod.rs:303).
    Model = the sample's feature rows + their kmeans labels; predict =
    label of the euclidean-nearest feature row, one GEMM-shaped
    distance matrix per signal (first-occurrence argmin = smallest
    train index tie-break)."""
    X = _sample_features(spark, sf_dir)
    y = _kmeans_labels(X, _train_kmeans(spark, sf_dir))
    bc = spark.sparkContext.broadcast((X, y))

    def make_labeler(model):
        Xt, yt = model

        def label(feats):
            d2 = ((feats[:, None, :] - Xt[None, :, :]) ** 2).sum(axis=2)
            return yt[d2.argmin(axis=1)]

        return label

    return _drift_query(spark, sf_dir, bc, make_labeler)


def q_forest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal random-forest label agreement — the rforest family
    of the lossyML matrix (buffer_pool.rs:798-938): FOREST_TREES
    bagged depth-2 classifier trees vote in the kmeans label space;
    majority vote, ties → smallest label (np.argmax first
    occurrence)."""
    bc = spark.sparkContext.broadcast(_train_forest(spark, sf_dir))

    def make_labeler(forest):
        def label(feats):
            import numpy as np

            votes = np.zeros((len(feats), N_CLUSTERS), dtype=np.int64)
            for (j0, t0), (jl, tl), (jr, tr), leaves in forest:
                left = feats[:, j0] <= t0
                leaf = np.where(
                    left,
                    np.where(feats[:, jl] <= tl, 0, 1),
                    np.where(feats[:, jr] <= tr, 2, 3),
                )
                votes[np.arange(len(feats)), np.asarray(leaves)[leaf]] += 1
            return votes.argmax(axis=1)

        return label

    return _drift_query(spark, sf_dir, bc, make_labeler)


QUERIES = {
    "q_kmeans_drift": q_kmeans_drift,
    "q_tree_drift": q_tree_drift,
    "q_knn_drift": q_knn_drift,
    "q_forest_drift": q_forest_drift,
}
ORACLES: dict[str, str] = {}  # iterative/model training → rows-only checks
