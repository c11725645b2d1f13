"""Streaming ANN: a stream of query vectors probes the STORED IVF
corpus (similarity.write_ivf_store) — the online half of the
similarity stack. A production retrieval/dedup service sees queries
arrive continuously; re-running a batch top-k per query is a
non-starter, and shipping the corpus to the stream is worse. The
shape here is the scale-correct one:

- Cell selection is a pure JVM expression over the tiny literal
  centroid matrix (no Python, no state): each streamed row computes
  its top-``nprobe`` IVF cells with the batch probe's selection rule
  (similarity.ivf_probe_stored — same descending-dot ranking, same
  higher-cell-first tie-break; the dots themselves are a sequential
  JVM fold vs numpy's BLAS summation, so a centroid pair whose
  scores agree to within summation-order ulps could in principle
  rank oppositely — agreement on real vectors is pinned by
  tests/test_streaming_annprobe.py).
- Candidate generation is a STATELESS stream-static equi-join on
  ``cell``: the streamed row explodes to ``nprobe`` rows, each
  meeting only its own inverted list. Nothing about the corpus is
  ever collected; per-micro-batch cost is |batch| · nprobe/cells of
  the store.
- Top-k finalization is an associative array-sort aggregation, run
  per micro-batch inside foreachBatch (the candidate stream itself
  stays append-legal for callers who want raw candidates). The
  foreachBatch runner prunes the store scan to the UNION of cells
  the batch probes — a collect bounded by the cell count (IVF_CELLS
  values), never by data size — so each micro-batch reads only the
  partitions it needs (write_ivf_store lays cells out as parquet
  partitions; the IN-filter becomes PartitionFilters).

Batch == stream: ``topk_per_query(ann_candidates(...))`` on a static
frame is bit-identical to ``similarity.ivf_probe_stored`` per query
(pinned in tests/test_streaming_annprobe.py), and the foreachBatch
path applies exactly those two functions per micro-batch.

Reference parity: the reference serves kNN over its buffered corpus
one query at a time (database/src/knn/mod.rs:204-242 classify loop);
this module is that loop as a continuous, partition-pruned stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.operators.similarity import (
    IVF_NPROBE,
    TOP_K,
    _as_double,
    _dot,
    _lit_vec,
)


def probe_cells_column(C, nprobe: int = IVF_NPROBE) -> Column:
    """Top-``nprobe`` IVF cell ids for the row's ``qe`` double-array
    column, as one JVM expression. Selection rule matches the batch
    probe's ``np.argsort(q @ C.T)[::-1][:nprobe]``: descending dot,
    HIGHER cell id first on exact ties (argsort-reversal semantics);
    cell choice is scale-invariant so the raw (unnormalized) query
    dot ranks identically to the normalized one. (Float caveat: the
    JVM fold and numpy's BLAS sum the dot in different orders — a
    near-tie within ulps could pick a different cell; pinned equal on
    the fixture corpus.)"""
    structs = F.array(
        *[
            F.struct(
                (-_dot(F.col("qe"), _lit_vec(C[k]))).alias("nd"),
                F.lit(-k).alias("negc"),
            )
            for k in range(len(C))
        ]
    )
    return F.transform(
        F.slice(F.array_sort(structs), 1, nprobe), lambda s: -s["negc"]
    )


def prepared_store(spark: SparkSession, path: str) -> DataFrame:
    """A write_ivf_store layout with the scoring column restored."""
    emb = spark.read.parquet(path)
    return emb.withColumn("e", _as_double(F.col("embedding")))


def ann_candidates(
    queries: DataFrame, store: DataFrame, C, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """Scored ANN candidates for every query row — stateless, so it
    runs unchanged on a stream (stream-static join) or a batch frame.
    ``queries``: (vec_id, embedding); ``store``: prepared_store().
    Emits (query_id, vec_id, label, cos_t) — every candidate in the
    query's probed cells, unranked (ranking is an aggregation and
    belongs to the caller's batch context — see topk_per_query)."""
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qe"),
        )
        .withColumn("qnorm", F.sqrt(_dot(F.col("qe"), F.col("qe"))))
        # Degenerate queries fail LOUDLY: a zero-norm vector would make
        # cos_t NULL and the query silently return garbage/no rows
        # (ADVICE r7). raise_error aborts the job with the query id.
        .withColumn(
            "qnorm",
            F.when(
                F.col("qnorm") == 0.0,
                F.raise_error(
                    F.concat(
                        F.lit("ann_candidates: zero-norm query vector "),
                        F.col("query_id").cast("string"),
                    )
                ).cast("double"),
            ).otherwise(F.col("qnorm")),
        )
        .withColumn("cell", F.explode(probe_cells_column(C, nprobe)))
    )
    return q.join(store, "cell").select(
        "query_id",
        "vec_id",
        "label",
        # Integer rank key in half-up ten-thousandths, matching
        # similarity.ivf_probe_stored (ADVICE r9: two-arg round()).
        F.round(
            _dot(F.col("e"), F.col("qe"))
            / (F.col("norm") * F.col("qnorm"))
            * F.lit(10_000.0)
        )
        .cast("long")
        .alias("cos_t"),
    )


def topk_per_query(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    """Rank candidates to (query_id, rank, vec_id, label, cos_t) —
    top-k by cosine desc with vec_id tie-break, the exact ordering of
    similarity.ivf_probe_stored. Associative (array-sort over
    collect_list partials), so per-(query) state is bounded by its
    candidate count and the merge by k."""
    ranked = scored.groupBy("query_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("cos_t")).alias("ns"),
                        F.col("vec_id").alias("vec_id"),
                        F.col("label").alias("label"),
                    )
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return ranked.select(
        "query_id", F.posexplode("top").alias("pos", "t")
    ).select(
        "query_id",
        (F.col("pos") + 1).alias("rank"),
        F.col("t.vec_id").alias("vec_id"),
        F.col("t.label").alias("label"),
        (-F.col("t.ns")).alias("cos_t"),
    )


def make_probe_foreach_batch(
    spark: SparkSession,
    store_path: str,
    C,
    out_path: str,
    nprobe: int = IVF_NPROBE,
    k: int = TOP_K,
):
    """foreachBatch runner: per micro-batch, prune the store to the
    union of probed cells (a ≤len(C)-row collect — bounded by the
    centroid count, NOT by data), score, rank, land under
    ``out_path/batch_id=<id>``. EXACTLY-ONCE output: each batch
    overwrites its own deterministic batch_id partition, so a replay
    after a failure between write and checkpoint commit rewrites the
    same partition instead of appending duplicate (query_id, rank)
    rows (same idempotence idiom as the SignalEngine streamed-
    maintenance sinks, api.py stream_rollup). Readers of ``out_path``
    see a ``batch_id`` partition column; drop it if unwanted."""

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        # One materialization of the micro-batch: the pruning collect
        # and the scoring join both read the cached frame instead of
        # re-scanning the source (and re-evaluating the centroid-dot
        # expressions) twice.
        batch_df = batch_df.persist()
        try:
            qcells = (
                batch_df.select(
                    _as_double(F.col("embedding")).alias("qe")
                )
                .select(
                    F.explode(probe_cells_column(C, nprobe)).alias("cell")
                )
                .distinct()
                .collect()
            )
            if not qcells:
                return
            cells = [r["cell"] for r in qcells]
            store = prepared_store(spark, store_path).where(
                F.col("cell").isin(cells)
            )
            out = topk_per_query(
                ann_candidates(batch_df, store, C, nprobe), k
            )
            out.write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}"
            )
        finally:
            batch_df.unpersist()

    return fb
