"""Similarity search over `embeddings(vec_id, embedding float[64],
label)` — the ANN surface of an LLM-data pipeline, plus the
reference's 1-NN classifier (database/src/knn/mod.rs:303-316: argmin
squared-L2 over a train set).

Scale design:
- q_ann_topk: brute-force cosine against ONE broadcast query vector is
  a single scan + TakeOrderedAndProject — at 100 TB this is the
  correct baseline (it's bandwidth-bound and embarrassingly parallel).
- q_ann_lsh: the scale path for vector-vs-corpus search — random-
  hyperplane (SRP) bucketing; candidates only form inside a bucket
  (equi-join on bucket key), turning all-pairs from O(n²) into
  O(n·bucket_size). Deterministic seeded hyperplanes.
- q_knn_1nn: per-test-row argmin over the train side via join +
  window rank. For small train sets (the UCR shape) the train side
  broadcasts, so the plan is one scan of test.

Dot products run JVM-side via zip_with/aggregate on double-cast
arrays (no Python). Similarities are rounded (4-6 dp) before any
ordering/threshold so Spark and DuckDB agree despite float-sum
association order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

DIM = 64
QUERY_VEC_ID = 0     # the probe vector for top-k search
TOP_K = 10
NEARDUP_COS = 0.35   # near-dup threshold on rounded cosine (synthetic
                     # embeddings top out ~0.48; real corpora use ~0.95)
TEST_MOD = 5         # vec_id % 5 == 0 → test split, else train
SRP_BITS = 8         # random-hyperplane bits for the LSH variant


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _with_norm(df: DataFrame) -> DataFrame:
    e = _as_double(F.col("embedding"))
    return df.withColumn("e", e).withColumn("norm", F.sqrt(_dot(F.col("e"), F.col("e"))))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine neighbors of one probe vector (brute force)."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe"), F.col("norm").alias("qnorm")
    )
    sims = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                _dot(F.col("e"), F.col("qe")) / (F.col("norm") * F.col("qnorm")), 4
            ).alias("cos_sim"),
        )
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(TOP_K)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold).

    Blocked GEMM, not a pair join: each Arrow batch of the scan is one
    numpy matmul against a broadcast normalized corpus matrix — the
    O(n²·d) flops run in BLAS instead of millions of interpreted
    array lambdas. The broadcast side is the "dictionary" pattern
    (client.rs:346 read_dict → broadcast); when the corpus outgrows
    one broadcast, the same kernel runs per corpus block (union over
    B-chunks) or switches to the LSH bucket-join path
    (q_ann_lsh / q_minhash_lsh_pairs) — that is the 100 TB answer;
    exact all-pairs is inherently quadratic."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.toPandas()
    ids = corpus["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(corpus["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def gen(batches):
        bids, bmat, bnorms = bc.value
        for batch in batches:
            if not len(batch):
                continue
            amat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            anorms = np.sqrt((amat * amat).sum(axis=1))
            aids = batch["vec_id"].to_numpy(dtype=np.int64)
            # dot-then-divide, matching the oracle's round(dot/(na*nb), 4)
            sims = np.round((amat @ bmat.T) / np.outer(anorms, bnorms), 4)
            keep = (sims >= NEARDUP_COS) & (aids[:, None] < bids[None, :])
            ai, bi = np.nonzero(keep)
            if len(ai):
                yield pd.DataFrame(
                    {"vec_a": aids[ai], "vec_b": bids[bi], "cos_sim": sims[ai, bi]}
                )

    return emb.mapInPandas(gen, schema="vec_a bigint, vec_b bigint, cos_sim double")


def _srp_planes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG — no numpy
    at plan-build time, reproducible across sessions)."""
    state = 42
    planes = []
    for _ in range(SRP_BITS):
        row = []
        for _ in range(DIM):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: SRP-LSH bucketing. Emits (bucket, n_vecs) — the
    bucket histogram is the operator's observable output (bucket
    membership is what the candidate join keys on). Rows-only check:
    bucket codes depend on float sign computations that SQL can
    replicate but at excessive oracle complexity."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    planes = _srp_planes()
    bits = [
        F.when(
            _dot(F.col("e"), F.array(*[F.lit(v) for v in p])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return (
        emb.select(F.concat(*bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


IVF_CELLS = 8    # coarse-quantizer centroids
IVF_NPROBE = 2   # cells probed per query (≈ nprobe/cells recall knob)
IVF_ITERS = 15


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> "object":
    """Deterministic Lloyd's kmeans over the corpus (driver-side on the
    broadcast-scale matrix; at 100 TB: train on a sample — the coarse
    quantizer needs only representativeness, not the full corpus)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pdf = emb.toPandas().sort_values("vec_id")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    order = np.argsort(Xn[:, 0], kind="stable")
    C = Xn[order[np.linspace(0, len(Xn) - 1, IVF_CELLS).astype(int)]].copy()
    for _ in range(IVF_ITERS):
        sims = Xn @ C.T
        assign = sims.argmax(axis=1)
        for k in range(IVF_CELLS):
            m = assign == k
            if m.any():
                c = Xn[m].mean(axis=0)
                C[k] = c / (np.linalg.norm(c) or 1.0)
    return C


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: coarse-quantize the corpus into IVF_CELLS cells
    (max-cosine centroid), search only the IVF_NPROBE cells nearest the
    probe vector. The inverted-file structure is the DataFrame
    partitioning itself: cell assignment is a column, the probe is a
    pushed-down `isin` filter, so a 100 TB corpus scan skips
    (1 - nprobe/cells) of the data before any distance math."""
    import numpy as np
    import pandas as pd

    C = _ivf_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).toPandas()
    qv = np.asarray(q["embedding"].iloc[0], dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    probe_cells = [int(i) for i in np.argsort(qn @ C.T)[::-1][:IVF_NPROBE]]

    bc = spark.sparkContext.broadcast((C, qv))

    def assign_and_score(batches):
        for batch in batches:
            if not len(batch):
                continue
            Cb, qvb = bc.value
            M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(M, axis=1)
            Mn = M / norms[:, None]
            cell = (Mn @ Cb.T).argmax(axis=1)
            qnorm = np.linalg.norm(qvb)
            cos = np.round((M @ qvb) / (norms * qnorm), 4)
            yield pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].to_numpy(dtype=np.int64),
                    "label": batch["label"].to_numpy(dtype=np.int64),
                    "cell": cell.astype(np.int64),
                    "cos_sim": cos,
                }
            )

    scored = emb.filter(F.col("vec_id") != QUERY_VEC_ID).mapInPandas(
        assign_and_score,
        schema="vec_id bigint, label bigint, cell bigint, cos_sim double",
    )
    return (
        scored.filter(F.col("cell").isin(probe_cells))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", "cos_sim")
    )


def q_knn_1nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN classification (knn/mod.rs:303-316): for each test vector
    (vec_id % 5 == 0) the label of the squared-L2-argmin train vector.
    Distance rounded to 4dp; ties broken by train vec_id — the
    reference's scan order makes its tie-break implicit; ours is
    explicit and deterministic."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    train = emb.filter(F.col("vec_id") % TEST_MOD != 0).toPandas()
    tids = train["vec_id"].to_numpy(dtype=np.int64)
    tlabels = train["label"].to_numpy(dtype=np.int64)
    tmat = np.stack(train["embedding"].to_numpy()).astype(np.float64)
    # broadcast train matrix (the reference slurps the train CSV whole,
    # knn/main.rs:11-64; here it is the broadcast dictionary side)
    bc = spark.sparkContext.broadcast((tids, tlabels, tmat))

    def gen(batches):
        ids, labels, mat = bc.value
        for batch in batches:
            if not len(batch):
                continue
            out = []
            for _, row in batch.iterrows():
                a = np.asarray(row["embedding"], dtype=np.float64)
                diff = mat - a[None, :]
                d2 = np.round((diff * diff).sum(axis=1), 4)
                # argmin with the explicit (dist2, train_id) tie-break
                best = np.lexsort((ids, d2))[0]
                out.append(
                    (int(row["vec_id"]), int(row["label"]), int(labels[best]), d2[best])
                )
            yield pd.DataFrame(
                out, columns=["test_id", "true_label", "pred_label", "dist2"]
            )

    return (
        emb.filter(F.col("vec_id") % TEST_MOD == 0)
        .mapInPandas(
            gen,
            schema="test_id bigint, true_label bigint, pred_label bigint, dist2 double",
        )
    )


QUERIES = {
    "q_ann_topk": q_ann_topk,
    "q_embedding_neardup": q_embedding_neardup,
    "q_ann_lsh": q_ann_lsh,
    "q_ann_ivf": q_ann_ivf,
    "q_knn_1nn": q_knn_1nn,
}

# DuckDB-side vector math: positional explode via range(1, DIM+1) and
# 1-based list indexing; double math throughout, rounded like Spark.
_NORMS_SQL = f"""
    SELECT vec_id, label,
           sqrt(sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               AS norm
    FROM embeddings, range(1, {DIM + 1}) t(i)
    GROUP BY vec_id, label
"""

_DOT_PAIRS_SQL = f"""
    SELECT a.vec_id AS va, b.vec_id AS vb,
           sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
               AS dot
    FROM embeddings a, embeddings b, range(1, {DIM + 1}) t(i)
    WHERE a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
"""

ORACLES = {
    "q_ann_topk": f"""
        WITH norms AS ({_NORMS_SQL}),
        dots AS (
            SELECT e.vec_id, e.label,
                   sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))
                       AS dot
            FROM embeddings e,
                 (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q,
                 range(1, {DIM + 1}) t(i)
            WHERE e.vec_id != {QUERY_VEC_ID}
            GROUP BY e.vec_id, e.label
        )
        SELECT d.vec_id, d.label,
               round(d.dot / (n.norm * qn.norm), 4) AS cos_sim
        FROM dots d
        JOIN norms n ON n.vec_id = d.vec_id
        JOIN norms qn ON qn.vec_id = {QUERY_VEC_ID}
        ORDER BY cos_sim DESC, d.vec_id
        LIMIT {TOP_K}
    """,
    "q_embedding_neardup": f"""
        WITH norms AS ({_NORMS_SQL}), dots AS ({_DOT_PAIRS_SQL})
        SELECT d.va AS vec_a, d.vb AS vec_b,
               round(d.dot / (na.norm * nb.norm), 4) AS cos_sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.va
        JOIN norms nb ON nb.vec_id = d.vb
        WHERE round(d.dot / (na.norm * nb.norm), 4) >= {NEARDUP_COS}
    """,
    "q_knn_1nn": f"""
        WITH d2 AS (
            SELECT a.vec_id AS test_id, a.label AS true_label,
                   b.vec_id AS train_id, b.label AS pred_label,
                   round(sum((CAST(a.embedding[i] AS DOUBLE)
                              - CAST(b.embedding[i] AS DOUBLE))
                             * (CAST(a.embedding[i] AS DOUBLE)
                                - CAST(b.embedding[i] AS DOUBLE))), 4) AS dist2
            FROM embeddings a, embeddings b, range(1, {DIM + 1}) t(i)
            WHERE a.vec_id % {TEST_MOD} = 0 AND b.vec_id % {TEST_MOD} != 0
            GROUP BY a.vec_id, a.label, b.vec_id, b.label
        )
        SELECT test_id, true_label, pred_label, dist2 FROM (
            SELECT *, row_number() OVER (PARTITION BY test_id
                                         ORDER BY dist2, train_id) AS rn
            FROM d2
        ) WHERE rn = 1
    """,
}
