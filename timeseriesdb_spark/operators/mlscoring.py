"""ML-model scoring over segments (SURVEY.md §2.9): the reference
scores classic-ML models (smartcore kmeans/dtree/knn/rforest) on each
segment's values to measure how lossy compression shifts predicted
labels (buffer_pool.rs:798-938, lossyML/src/main.rs:26-120).

Spark-first shape: the model is TRAINED ONCE driver-side on a bounded
sample (the reference trains on a dictionary file), broadcast, and
SCORED distributed via a grouped-map UDF — training data never exceeds
the sample, scoring never touches the driver.

q_kmeans_drift is the reference's actual experiment: label each
segment under raw values and under PAA-degraded values and report the
agreement rate — the "does lossy aging change downstream ML answers"
measurement, which is what lossyML exists to quantify.
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


def q_kmeans_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal kmeans label agreement between raw and PAA-degraded
    segments (the lossyML measurement). Emits
    (user_id, n_segments, n_agree, agree_rate)."""
    centers = _train_kmeans(spark, sf_dir)
    bc = spark.sparkContext.broadcast(centers)
    seg_rows, paa_chunk = SEG_ROWS, PAA_CHUNK

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        C = bc.value

        def feats(v: np.ndarray) -> np.ndarray:
            return np.array([v.mean(), v.std(), v.min(), v.max()])

        def label(v: np.ndarray) -> int:
            f = feats(v)
            return int(((C - f[None, :]) ** 2).sum(axis=1).argmin())

        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["value"].to_numpy(dtype=np.float64)
        uid = int(pdf["user_id"].iloc[0])
        n, agree = 0, 0
        for s in range(0, len(v) - seg_rows + 1, seg_rows):
            seg = v[s : s + seg_rows]
            # PAA degrade: chunk means repeated (paa_compress →
            # decode, segment.rs:516-555)
            means = seg.reshape(-1, paa_chunk).mean(axis=1)
            degraded = np.repeat(means, paa_chunk)
            n += 1
            agree += int(label(seg) == label(degraded))
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_segments": [n],
                "n_agree": [agree],
                "agree_rate": [round(agree / n, 6) if n else None],
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return ev.groupBy("user_id").applyInPandas(
        score,
        "user_id bigint, n_segments bigint, n_agree bigint, agree_rate double",
    )


def _train_tree(spark: SparkSession, sf_dir: str) -> tuple:
    """Depth-2 threshold tree on the sample's segment features — the
    second model family of the reference's per-segment scoring matrix
    (buffer_pool.rs:798-938 scores kmeans AND a decision tree per
    segment; lossyML/src/main.rs:66-120). Unsupervised k-d-style
    training, fully deterministic: each node splits on the
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


def q_tree_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal threshold-tree label agreement between raw and
    PAA-degraded segments — the dtree row of the reference's lossyML
    matrix (buffer_pool.rs:798-938), same harness as q_kmeans_drift:
    train once on the bounded sample, broadcast the 3-node model,
    score distributed in one grouped-map pass. Emits
    (user_id, n_segments, n_agree, agree_rate)."""
    tree = _train_tree(spark, sf_dir)
    bc = spark.sparkContext.broadcast(tree)
    seg_rows, paa_chunk = SEG_ROWS, PAA_CHUNK

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        (j0, t0), (jl, tl), (jr, tr) = bc.value

        def label(v: np.ndarray) -> int:
            f = np.array([v.mean(), v.std(), v.min(), v.max()])
            if f[j0] <= t0:
                return 0 if f[jl] <= tl else 1
            return 2 if f[jr] <= tr else 3

        pdf = pdf.sort_values(["ts", "event_id"])
        v = pdf["value"].to_numpy(dtype=np.float64)
        uid = int(pdf["user_id"].iloc[0])
        n, agree = 0, 0
        for s in range(0, len(v) - seg_rows + 1, seg_rows):
            seg = v[s : s + seg_rows]
            means = seg.reshape(-1, paa_chunk).mean(axis=1)
            degraded = np.repeat(means, paa_chunk)
            n += 1
            agree += int(label(seg) == label(degraded))
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_segments": [n],
                "n_agree": [agree],
                "agree_rate": [round(agree / n, 6) if n else None],
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return ev.groupBy("user_id").applyInPandas(
        score,
        "user_id bigint, n_segments bigint, n_agree bigint, agree_rate double",
    )


QUERIES = {"q_kmeans_drift": q_kmeans_drift, "q_tree_drift": q_tree_drift}
ORACLES: dict[str, str] = {}  # iterative/model training → rows-only checks
