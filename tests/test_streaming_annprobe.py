"""Streaming ANN probe parity: the stateless candidate join + top-k
finalizer must reproduce similarity.ivf_probe_stored per query, and
the foreachBatch stream path must land exactly the batch answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import similarity as sim
from timeseriesdb_spark.streaming import annprobe
from timeseriesdb_spark.tables import load_table

NPROBE = 2
K = 5


def _store_and_queries(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    C = sim._ivf_centroids(spark, SF_DIR)
    store_path = str(tmp_path / "ivf_store")
    sim.write_ivf_store(emb, store_path, C)
    queries = emb.orderBy("vec_id").limit(3)
    return C, store_path, queries


def test_batch_topk_matches_ivf_probe_stored(spark, tmp_path):
    C, store_path, queries = _store_and_queries(spark, tmp_path)
    store = annprobe.prepared_store(spark, store_path)
    got = (
        annprobe.topk_per_query(
            annprobe.ann_candidates(queries, store, C, NPROBE), K
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    by_query: dict[int, list] = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append(r)
    assert len(by_query) == 3
    for qrow in queries.collect():
        want = sim.ivf_probe_stored(
            spark, store_path, list(qrow.embedding), C, nprobe=NPROBE, k=K
        ).collect()
        mine = by_query[qrow.vec_id]
        assert [m.rank for m in mine] == list(range(1, len(want) + 1))
        assert [(m.vec_id, m.label, m.cos_t) for m in mine] == [
            (w.vec_id, w.label, w.cos_t) for w in want
        ]


def test_probe_cells_match_numpy_argsort(spark):
    import numpy as np

    emb = load_table(spark, SF_DIR, "embeddings")
    C = sim._ivf_centroids(spark, SF_DIR)
    rows = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            "vec_id",
            sim._as_double(F.col("embedding")).alias("qe"),
        )
        .withColumn("cells", annprobe.probe_cells_column(C, NPROBE))
        .collect()
    )
    for r in rows:
        qv = np.asarray(r.qe, dtype=np.float64)
        qn = qv / np.linalg.norm(qv)
        want = [int(i) for i in np.argsort(qn @ np.asarray(C).T)[::-1][:NPROBE]]
        assert list(r.cells) == want


def test_stream_probe_equals_batch(spark, tmp_path):
    C, store_path, queries = _store_and_queries(spark, tmp_path)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    queries.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            annprobe.make_probe_foreach_batch(
                spark, store_path, C, out, nprobe=NPROBE, k=K
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    store = annprobe.prepared_store(spark, store_path)
    want = sorted(
        annprobe.topk_per_query(
            annprobe.ann_candidates(queries, store, C, NPROBE), K
        ).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    got = sorted(
        spark.read.parquet(out).drop("batch_id").collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_stream_probe_replay_is_idempotent(spark, tmp_path):
    # A re-delivered micro-batch (failure after write, before the
    # checkpoint commit) overwrites its own batch_id partition instead
    # of appending duplicate (query_id, rank) rows.
    C, store_path, queries = _store_and_queries(spark, tmp_path)
    out = str(tmp_path / "out")
    fb = annprobe.make_probe_foreach_batch(
        spark, store_path, C, out, nprobe=NPROBE, k=K
    )
    fb(queries, 0)
    once = sorted(
        spark.read.parquet(out).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    fb(queries, 0)  # replay of the SAME batch id
    twice = sorted(
        spark.read.parquet(out).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    assert [tuple(r) for r in twice] == [tuple(r) for r in once]
    # a genuinely new batch id still lands alongside
    fb(queries.limit(1), 1)
    assert spark.read.parquet(out).select("batch_id").distinct().count() == 2


def test_zero_norm_query_fails_loudly(spark, tmp_path):
    import numpy as np
    import pytest

    C, store_path, queries = _store_and_queries(spark, tmp_path)
    dim = len(queries.first().embedding)
    zq = spark.createDataFrame(
        [(999999, [0.0] * dim)], "vec_id long, embedding array<double>"
    )
    store = annprobe.prepared_store(spark, store_path)
    with pytest.raises(Exception, match="zero-norm query"):
        annprobe.ann_candidates(zq, store, C, NPROBE).collect()
    with pytest.raises(ValueError, match="zero-norm query"):
        sim.ivf_probe_stored(spark, store_path, np.zeros(dim), C)
