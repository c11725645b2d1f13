"""UCR-archive-format 1-NN classification harness — the reference's
one committed quantitative baseline is 1-NN accuracy over UCR CSV
files (database/script/data/knn_buff.csv:1-256, produced by
script/knn-UCR.sh driving src/knn/main.rs). This module reproduces
that harness's exact semantics on Spark so a committed UCR-shaped
fixture pins accuracy end to end:

- File format (knn/mod.rs:25-52 `slurp_file`): comma-separated
  `label,v1,...,vN`; the FIRST LINE OF EACH FILE IS SKIPPED
  (`.skip(1)` — the reference drops the first record; knn_buff.csv's
  0.5353.. for ACSF1 is 53/99, not 53/100). Labels parse as f64 then
  truncate to integer (`as isize`).
- Classifier (knn/mod.rs:310-316 `classify`): squared-L2 argmin over
  the train set, FIRST minimum wins — i.e. ties break to the earliest
  train row in file order.
- Accuracy (knn/main.rs:51-63): correct / n_test.

Spark mapping: the train file is the bounded dictionary side (the
reference slurps it whole), read on the driver in file order and
broadcast; the test side streams through the SAME GEMM / banded-DTW
kernels as q_knn_1nn / q_dtw_1nn (mapInPandas, Arrow batches). The
test-side skip(1) maps to the CSV reader's header option: with an
explicit schema, `header=True` skips the first line per file without
interpreting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

UCR_TRAIN_CAP = 65536  # broadcast-side guard (same role as KNN_TRAIN_CAP)


def _ucr_schema(n_pixels: int) -> T.StructType:
    return T.StructType(
        [T.StructField("label_raw", T.DoubleType())]
        + [T.StructField(f"p{i}", T.DoubleType()) for i in range(n_pixels)]
    )


def read_ucr_test(spark: SparkSession, path: str, n_pixels: int) -> DataFrame:
    """Distributed read of a UCR CSV: (row label, pixels array), first
    line of each file skipped exactly like slurp_file's `.skip(1)`."""
    raw = (
        spark.read.schema(_ucr_schema(n_pixels))
        .option("header", True)  # explicit schema → line 1 skipped, not parsed
        .csv(path)
    )
    return raw.select(
        F.col("label_raw").cast("long").alias("label"),
        F.array(*[F.col(f"p{i}") for i in range(n_pixels)]).alias("pixels"),
    )


def read_ucr_train(path: str) -> tuple["object", "object"]:
    """Driver-side read of the bounded train file IN FILE ORDER
    (tie-breaks depend on it). Returns (labels int64[n], mat f64[n,L])."""
    import numpy as np

    labels, rows = [], []
    with open(path) as f:
        if next(f, None) is None:  # slurp_file skips the first line
            raise ValueError(f"read_ucr_train: {path} is empty")
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            labels.append(int(float(parts[0])))
            rows.append([float(x) for x in parts[1:]])
    if len(rows) > UCR_TRAIN_CAP:
        raise ValueError(
            f"UCR train side exceeds UCR_TRAIN_CAP={UCR_TRAIN_CAP}; "
            "use the LSH/IVF candidate paths instead of broadcast 1-NN"
        )
    return np.asarray(labels, dtype=np.int64), np.asarray(rows, dtype=np.float64)


def ucr_classify(
    spark: SparkSession,
    train_path: str,
    test_path: str,
    n_pixels: int,
    band: int | None = None,
) -> DataFrame:
    """Per-test-row 1-NN classification of TEST against TRAIN:
    (true_label, pred_label, correct). band=None → squared-L2 exactly
    as knn/mod.rs:310 (first-minimum tie-break in train file order);
    band=r → Sakoe-Chiba banded DTW (the repo's q_dtw_1nn upgrade on
    the same harness; band=0 degenerates to L2)."""
    import numpy as np
    import pandas as pd

    tlabels, tmat = read_ucr_train(train_path)
    bc = spark.sparkContext.broadcast((tlabels, tmat, band))

    def gen(batches):
        labels, Tm, r = bc.value
        nt, L = Tm.shape
        tn2 = (Tm * Tm).sum(axis=1)
        for batch in batches:
            if not len(batch):
                continue
            A = np.stack(batch["pixels"].to_numpy()).astype(np.float64)
            if r is None:
                # direct rearranged GEMM; argmin keeps FIRST occurrence
                a2 = (A * A).sum(axis=1)
                d2 = np.maximum(a2[:, None] + tn2[None, :] - 2.0 * (A @ Tm.T), 0.0)
                best = d2.argmin(axis=1)
            else:
                best = np.empty(len(A), dtype=np.int64)
                for row, a in enumerate(A):
                    prev = np.full((L + 1, nt), np.inf)
                    prev[0, :] = 0.0
                    for i in range(1, L + 1):
                        cur = np.full((L + 1, nt), np.inf)
                        jlo, jhi = max(1, i - r), min(L, i + r)
                        for j in range(jlo, jhi + 1):
                            cost = (a[i - 1] - Tm[:, j - 1]) ** 2
                            cur[j] = cost + np.minimum(
                                np.minimum(prev[j], prev[j - 1]), cur[j - 1]
                            )
                        prev = cur
                    best[row] = int(prev[L].argmin())
            pred = labels[best]
            true = batch["label"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "true_label": true,
                    "pred_label": pred,
                    "correct": (pred == true).astype(np.int64),
                }
            )

    test = read_ucr_test(spark, test_path, n_pixels)
    n_slices = spark.sparkContext.defaultParallelism
    return test.repartition(n_slices).mapInPandas(
        gen, schema="true_label bigint, pred_label bigint, correct bigint"
    )


def ucr_accuracy(
    spark: SparkSession,
    train_path: str,
    test_path: str,
    n_pixels: int,
    band: int | None = None,
) -> DataFrame:
    """The knn/main.rs:62 output row: (n_test, n_correct, accuracy)."""
    per_row = ucr_classify(spark, train_path, test_path, n_pixels, band)
    return per_row.agg(
        F.count("*").alias("n_test"),
        F.sum("correct").alias("n_correct"),
        (F.sum("correct") / F.count("*")).alias("accuracy"),
    )


# --- driver-registered fixture queries ------------------------------
import os as _os

_FIX = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)
UCR_TRAIN_FIX = _os.path.join(_FIX, "ucr_synth_TRAIN.csv")
UCR_TEST_FIX = _os.path.join(_FIX, "ucr_synth_TEST.csv")
UCR_FIX_LEN = 32
UCR_DTW_BAND = 8


def q_ucr_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-NN L2 accuracy on the committed UCR-format fixture —
    BASELINE.md row 1's harness, driver-hash-checked against a DuckDB
    cross-join/arg_min oracle (sf_dir unused: the fixture IS the
    dataset, as in the reference's knn-UCR.sh runs)."""
    return ucr_accuracy(spark, UCR_TRAIN_FIX, UCR_TEST_FIX, UCR_FIX_LEN)


def q_ucr_dtw_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-DTW(8) 1-NN accuracy on the same fixture — hash-checked
    since r11 against a recursive-CTE oracle that replays the DP
    cell-exactly (_ucr_dtw_oracle_sql); pytest still pins the value."""
    return ucr_accuracy(
        spark, UCR_TRAIN_FIX, UCR_TEST_FIX, UCR_FIX_LEN, band=UCR_DTW_BAND
    )


def _ucr_oracle_sql() -> str:
    cols = ", ".join(
        [f"'label': 'DOUBLE'"] + [f"'p{i}': 'DOUBLE'" for i in range(UCR_FIX_LEN)]
    )
    d2 = " + ".join(
        f"(tr.p{i} - te.p{i}) * (tr.p{i} - te.p{i})" for i in range(UCR_FIX_LEN)
    )
    return f"""
        WITH tr AS (
            SELECT * FROM read_csv('{UCR_TRAIN_FIX}', skip=1, header=false,
                                   columns={{{cols}}})
        ), te AS (
            SELECT row_number() OVER () AS rid, *
            FROM read_csv('{UCR_TEST_FIX}', skip=1, header=false,
                          columns={{{cols}}})
        ), pred AS (
            SELECT te.rid,
                   CAST(te.label AS BIGINT) AS true_label,
                   arg_min(CAST(tr.label AS BIGINT), {d2}) AS pred_label
            FROM te CROSS JOIN tr
            GROUP BY te.rid, te.label
        )
        SELECT count(*) AS n_test,
               CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
        FROM pred
    """


QUERIES = {
    "q_ucr_knn_accuracy": q_ucr_knn_accuracy,
    "q_ucr_dtw_accuracy": q_ucr_dtw_accuracy,
}

def _ucr_dtw_oracle_sql() -> str:
    """Replay q_ucr_dtw_accuracy's banded-DTW DP as a DuckDB recursive
    CTE (the q_dtw_1nn conversion, similarity._dtw_oracle_sql, applied
    to the committed fixture): each DP cell is a fixed IEEE expression
    tree — no reduction reassociation — so row-stepping the identical
    ops reproduces the kernel's doubles bit-for-bit. The kernel argmins
    RAW doubles (no rounding), so the oracle ranks by the raw double
    with the train-file-order tie-break the kernel's first-occurrence
    argmin uses. The Sakoe-Chiba band is W = 2r+1 explicit slot
    columns; within-row cur[j−1] dependency = lateral column alias."""
    r, L = UCR_DTW_BAND, UCR_FIX_LEN
    W = 2 * r + 1
    inf = "CAST('infinity' AS DOUBLE)"
    cols = ", ".join(
        ["'label': 'DOUBLE'"] + [f"'p{i}': 'DOUBLE'" for i in range(L)]
    )
    arr = "[" + ", ".join(f"p{i}" for i in range(L)) + "]"
    tband_cols = ", ".join(
        f"CASE WHEN i.i - {r} + {k} BETWEEN 1 AND {L}"
        f" THEN tr.emb[i.i - {r} + {k}] ELSE NULL END AS t{k}"
        for k in range(W)
    )
    steps = []
    for k in range(W):
        j = f"(dp.i + 1 - {r} + {k})"
        prev_up = f"dp.s{k + 1}" if k + 1 < W else inf
        mins = f"LEAST({prev_up}, dp.s{k}" + (f", n{k - 1})" if k else ")")
        steps.append(
            f"CASE WHEN {j} BETWEEN 1 AND {L}"
            f" THEN (tf.ai - tb.t{k}) * (tf.ai - tb.t{k}) + {mins}"
            f" ELSE {inf} END AS n{k}"
        )
    step_cols = ",\n               ".join(steps)
    init = ", ".join(
        ("CAST(0.0 AS DOUBLE)" if k == r else inf) + f" AS s{k}"
        for k in range(W)
    )
    sel = ", ".join(f"n{k}" for k in range(W))
    return f"""
        WITH RECURSIVE
        te AS MATERIALIZED (
            SELECT row_number() OVER () AS rid,
                   CAST(label AS BIGINT) AS label, {arr} AS emb
            FROM read_csv('{UCR_TEST_FIX}', skip=1, header=false,
                          columns={{{cols}}})
        ),
        tr AS MATERIALIZED (
            SELECT row_number() OVER () AS tidx,
                   CAST(label AS BIGINT) AS label, {arr} AS emb
            FROM read_csv('{UCR_TRAIN_FIX}', skip=1, header=false,
                          columns={{{cols}}})
        ),
        te_flat AS MATERIALIZED (
            SELECT te.rid, i.i AS i, te.emb[i.i] AS ai
            FROM te CROSS JOIN
                 (SELECT CAST(range AS INT) AS i FROM range(1, {L + 1})) i
        ),
        tr_band AS MATERIALIZED (
            SELECT tr.tidx, i.i AS i, {tband_cols}
            FROM tr CROSS JOIN
                 (SELECT CAST(range AS INT) AS i FROM range(1, {L + 1})) i
        ),
        dp AS (
            SELECT te.rid, tr.tidx, 0 AS i, {init}
            FROM te CROSS JOIN tr
            UNION ALL
            SELECT dp.rid, dp.tidx, dp.i + 1 AS i, {sel}
            FROM (
                SELECT dp.rid, dp.tidx, dp.i,
                       {step_cols}
                FROM dp
                JOIN te_flat tf ON tf.rid = dp.rid AND tf.i = dp.i + 1
                JOIN tr_band tb ON tb.tidx = dp.tidx AND tb.i = dp.i + 1
                WHERE dp.i < {L}
            ) dp
        ),
        pick AS (
            SELECT rid, tidx, s{r} AS d2,
                   row_number() OVER (
                       PARTITION BY rid ORDER BY s{r}, tidx
                   ) AS rn
            FROM dp WHERE i = {L}
        ),
        pred AS (
            SELECT p.rid, te.label AS true_label, tr.label AS pred_label
            FROM pick p
            JOIN te ON te.rid = p.rid
            JOIN tr ON tr.tidx = p.tidx
            WHERE p.rn = 1
        )
        SELECT count(*) AS n_test,
               CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
        FROM pred
    """


ORACLES = {
    # The oracle computes d² in the direct-difference form while Spark
    # uses the rearranged GEMM; argmin can only diverge on float
    # near-ties (< ~1e-9 gaps), which the seeded fixture does not
    # contain.
    "q_ucr_knn_accuracy": _ucr_oracle_sql(),
    # DTW DP replayed cell-exactly by a recursive CTE (r11 conversion).
    "q_ucr_dtw_accuracy": _ucr_dtw_oracle_sql(),
}
