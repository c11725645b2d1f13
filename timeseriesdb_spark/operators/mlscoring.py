"""ML-model scoring over segments (SURVEY.md §2.9): the reference
scores classic-ML models — smartcore kmeans, decision tree, knn and
random forest — on each segment's values to measure how lossy
compression shifts predicted labels (buffer_pool.rs:798-938,
lossyML/src/main.rs:26-120). All four families are covered here.

Spark-first shape shared by every family: the model is TRAINED ONCE
driver-side on a bounded sample (the reference trains on a dictionary
file), broadcast as literals or a small broadcast variable, and SCORED
distributed. The drift measurement is the reference's actual
experiment: label each segment under raw values and under PAA-degraded
values and report the agreement rate — "does lossy aging change
downstream ML answers", which is what lossyML exists to quantify.

Scale architecture (v2 — the v1 harness shipped every raw value
through Arrow into a grouped-map UDF): segment features (mean, std,
min, max — raw and PAA-degraded) are computed ENTIRELY JVM-side as a
two-level aggregation (values → chunks → segments), so the data that
ever reaches Python is at most one 4-float row per segment — a
SEG_ROWS-fold reduction before any UDF. Three of the four families
(kmeans, tree, forest) label with pure Column expressions (the models
are a handful of literals), keeping the whole query inside
whole-stage codegen; only knn needs a pandas UDF, over the tiny
feature rows. The value→chunk→segment→signal aggregation chain reuses
the single user_id shuffle introduced by the row_number window —
partitioning on user_id clusters every downstream key, so Catalyst
inserts no further exchanges.

Determinism: chunk/segment sums route through DECIMAL(38,6) on values
pre-rounded to the same grid (operators/common.py discipline), so
features — and therefore labels and agreement rates — are bit-stable
under any partitioning. With PAA_CHUNK=1 the degraded path reproduces
the raw features exactly (chunk mean of one value is that value, and
both paths aggregate the same decimals), making identity degradation
⇒ agreement 1.0 a structural property, pinned by pytest for every
family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

SEG_ROWS = 64     # rows per scored segment (ref segment_size scaled down)
N_CLUSTERS = 4
KMEANS_ITERS = 20
SAMPLE_SIGNALS = 8  # training sample: the dictionary-sized subset
PAA_CHUNK = 8
FOREST_TREES = 4  # bagged depth-2 trees (rforest analog)

DEC = "decimal(38,6)"

_FEATS_RAW = ("f_mean", "f_std", "f_min", "f_max")
_FEATS_DEG = ("d_mean", "d_std", "d_min", "d_max")


def _features(values: np.ndarray) -> np.ndarray:
    """Fixed feature vector per segment: (mean, std, min, max)."""
    return np.array(
        [values.mean(), values.std(), values.min(), values.max()]
    )


_CENTERS_CACHE: dict[str, np.ndarray] = {}
_TREE_CACHE: dict[str, tuple] = {}
_SAMPLE_CACHE: dict[str, np.ndarray] = {}


def _sample_features(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Segment features of the bounded training sample (the
    dictionary-sized subset the reference trains smartcore models on,
    lossyML/src/main.rs:26-64): SAMPLE_SIGNALS signals, SEG_ROWS
    segments, one (mean, std, min, max) row each. Cached per sf_dir —
    each family's training starts from the same immutable sample."""
    if sf_dir in _SAMPLE_CACHE:
        return _SAMPLE_CACHE[sf_dir]
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
    X = np.array(feats)
    _SAMPLE_CACHE[sf_dir] = X
    return X


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


def _segment_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment feature rows, raw and PAA-degraded, computed fully
    JVM-side. Values are rounded to the DECIMAL(38,6) grid once at the
    scan, then aggregated twice: value→chunk (sum, sum², min, max) and
    chunk→segment, with the degraded features derived from the chunk
    means inside the same segment-level pass. std uses the one-pass
    E[x²]−E[x]² identity (clamped at 0) — exact on the decimal grid.
    Only complete segments (SEG_ROWS values) are scored, like the
    reference's fixed-size segment buffer."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w) - 1
    v = F.col("value").cast(DEC).cast("double")
    base = ev.select(
        "user_id",
        v.alias("v"),
        F.floor(rn / SEG_ROWS).alias("seg"),
        F.floor(rn / PAA_CHUNK).alias("chunk"),
    )
    chunks = base.groupBy("user_id", "seg", "chunk").agg(
        F.sum(F.col("v").cast(DEC)).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast(DEC)).alias("ss"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count("*").alias("n"),
    )
    cm = (F.col("s") / F.col("n")).cast(DEC)  # chunk mean, decimal-exact
    segs = (
        chunks.groupBy("user_id", "seg")
        .agg(
            F.sum("s").alias("S"),
            F.sum("ss").alias("SS"),
            F.min("mn").alias("f_min"),
            F.max("mx").alias("f_max"),
            F.sum("n").alias("N"),
            F.sum(cm).alias("CS"),
            F.sum((cm * cm).cast(DEC)).alias("CSS"),
            F.min(cm.cast("double")).alias("d_min"),
            F.max(cm.cast("double")).alias("d_max"),
            F.count("*").alias("n_chunks"),
        )
        .where(F.col("N") == SEG_ROWS)
    )
    mean = (F.col("S") / F.col("N")).cast("double")
    m2 = (F.col("SS") / F.col("N")).cast("double")
    dmean = (F.col("CS") / F.col("n_chunks")).cast("double")
    dm2 = (F.col("CSS") / F.col("n_chunks")).cast("double")
    std = F.sqrt(F.greatest(m2 - mean * mean, F.lit(0.0)))
    dstd = F.sqrt(F.greatest(dm2 - dmean * dmean, F.lit(0.0)))
    return segs.select(
        "user_id",
        "seg",
        mean.alias("f_mean"),
        std.alias("f_std"),
        F.col("f_min"),
        F.col("f_max"),
        dmean.alias("d_mean"),
        dstd.alias("d_std"),
        F.col("d_min"),
        F.col("d_max"),
    )


def _drift_result(
    spark: SparkSession, sf_dir: str, label_of
) -> DataFrame:
    """Shared drift rollup: label every segment under raw and degraded
    features via `label_of(feature_cols) -> Column`, then aggregate
    agreement per signal. Signals with no complete segment still emit
    a (user_id, 0, 0, null) row — every signal is accounted for."""
    feats = _segment_features(spark, sf_dir)
    labeled = feats.select(
        "user_id",
        label_of([F.col(c) for c in _FEATS_RAW]).alias("lr"),
        label_of([F.col(c) for c in _FEATS_DEG]).alias("ld"),
    )
    per_user = labeled.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum((F.col("lr") == F.col("ld")).cast("bigint")).alias("n_agree"),
    )
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    joined = users.join(per_user, "user_id", "left")
    n = F.coalesce(F.col("n_segments"), F.lit(0))
    a = F.coalesce(F.col("n_agree"), F.lit(0))
    return joined.select(
        "user_id",
        n.alias("n_segments"),
        a.alias("n_agree"),
        F.when(n > 0, F.round(a / n, 6)).alias("agree_rate"),
    )


def _argmin_label(dists: list[Column]) -> Column:
    """Index of the smallest distance, first-occurrence tie-break —
    np.argmin semantics as a CASE chain over literals-only exprs."""
    m = F.least(*dists)
    out = F.lit(len(dists) - 1)
    for k in range(len(dists) - 2, -1, -1):
        out = F.when(dists[k] == m, F.lit(k)).otherwise(out)
    return out


def _tree_label(f: list[Column], tree) -> Column:
    (j0, t0), (jl, tl), (jr, tr) = tree
    return (
        F.when(
            f[j0] <= t0, F.when(f[jl] <= tl, F.lit(0)).otherwise(F.lit(1))
        )
        .otherwise(F.when(f[jr] <= tr, F.lit(2)).otherwise(F.lit(3)))
    )


def q_kmeans_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal kmeans label agreement between raw and PAA-degraded
    segments (the lossyML measurement). The 4×4 center matrix folds
    into the plan as literals: distance + argmin are Column
    expressions, so scoring is pure JVM codegen — no Python anywhere.
    Emits (user_id, n_segments, n_agree, agree_rate)."""
    C = _train_kmeans(spark, sf_dir)

    def label_of(f: list[Column]) -> Column:
        dists = [
            sum(
                (f[j] - float(C[k, j])) * (f[j] - float(C[k, j]))
                for j in range(4)
            )
            for k in range(N_CLUSTERS)
        ]
        return _argmin_label(dists)

    return _drift_result(spark, sf_dir, label_of)


def q_tree_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal threshold-tree label agreement — the dtree family of
    the reference's lossyML matrix (buffer_pool.rs:798-938). The
    3-node model is three (index, threshold) literal pairs: labeling
    compiles to a nested CASE, fully inside codegen."""
    tree = _train_tree(spark, sf_dir)
    return _drift_result(spark, sf_dir, lambda f: _tree_label(f, tree))


def q_knn_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal 1-NN label agreement — the knn family of the lossyML
    matrix (the reference's knn classifies each segment against its
    training dictionary, knn/mod.rs:303). Model = the sample's feature
    rows + kmeans labels, broadcast; predict = label of the
    euclidean-nearest row (first-occurrence argmin). The only family
    needing Python — a vectorized pandas UDF over the per-segment
    feature rows (4 doubles/segment, never raw values)."""
    X = _sample_features(spark, sf_dir)
    y = _kmeans_labels(X, _train_kmeans(spark, sf_dir))
    bc = spark.sparkContext.broadcast((X, y))

    @F.pandas_udf("int")
    def knn_label(m: pd.Series, s: pd.Series, mn: pd.Series, mx: pd.Series) -> pd.Series:
        import numpy as np

        Xt, yt = bc.value
        feats = np.stack(
            [m.to_numpy(), s.to_numpy(), mn.to_numpy(), mx.to_numpy()], axis=1
        )
        if not len(feats):
            return pd.Series([], dtype="int32")
        d2 = ((feats[:, None, :] - Xt[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(yt[d2.argmin(axis=1)]).astype("int32")

    return _drift_result(spark, sf_dir, lambda f: knn_label(*f))


def q_forest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal random-forest label agreement — the rforest family
    of the lossyML matrix: FOREST_TREES bagged depth-2 classifier
    trees vote in the kmeans label space; majority vote, ties →
    smallest label (np.argmax first occurrence). Each tree's leaf
    table is literals, votes are integer sums, the argmax is a CASE
    chain — pure JVM codegen like kmeans/tree."""
    forest = _train_forest(spark, sf_dir)

    def label_of(f: list[Column]) -> Column:
        votes = []
        for k in range(N_CLUSTERS):
            total = F.lit(0)
            for (j0, t0), (jl, tl), (jr, tr), leaves in forest:
                leaf = (
                    F.when(
                        f[j0] <= t0,
                        F.when(f[jl] <= tl, F.lit(leaves[0])).otherwise(
                            F.lit(leaves[1])
                        ),
                    )
                    .otherwise(
                        F.when(f[jr] <= tr, F.lit(leaves[2])).otherwise(
                            F.lit(leaves[3])
                        )
                    )
                )
                total = total + (leaf == k).cast("int")
            votes.append(total)
        m = F.greatest(*votes)
        out = F.lit(N_CLUSTERS - 1)
        for k in range(N_CLUSTERS - 2, -1, -1):
            out = F.when(votes[k] == m, F.lit(k)).otherwise(out)
        return out

    return _drift_result(spark, sf_dir, label_of)


QUERIES = {
    "q_kmeans_drift": q_kmeans_drift,
    "q_tree_drift": q_tree_drift,
    "q_knn_drift": q_knn_drift,
    "q_forest_drift": q_forest_drift,
}
ORACLES: dict[str, str] = {}  # iterative/model training → rows-only checks
