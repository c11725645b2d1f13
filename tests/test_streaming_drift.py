"""Streamed drift-feature maintenance parity: per-micro-batch chunk
feature partials (positioned by the stateful per-signal carry), merged
at read and finalized through the identical label math, must equal the
batch q_*_drift queries EXACTLY — the feature sums are associative
integers, so micro-batching cannot move a single bit."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.registry import QUERIES
from timeseriesdb_spark.tables import load_table


def _stage_time_chunks(spark, src, n_chunks=4):
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    edges = pd.date_range(lo, hi, periods=n_chunks + 1)
    for i in range(n_chunks):
        chunk = ev.filter(
            (F.col("ts") >= str(edges[i]))
            & (
                F.col("ts") < str(edges[i + 1])
                if i < n_chunks - 1
                else F.lit(True)
            )
        )
        chunk.coalesce(1).write.mode("append").parquet(src)
    return ev.schema


def test_streamed_drift_scores_equal_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    feat = str(tmp_path / "feat")
    ckpt = str(tmp_path / "ckpt")
    schema = _stage_time_chunks(spark, src)

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_drift_feature_stream(stream, feat, ckpt)
    q.awaitTermination(180)

    for family, batch_q in [
        ("kmeans", "q_kmeans_drift"),
        ("forest", "q_forest_drift"),
    ]:
        got = sorted(
            map(tuple, eng.drift_scores(feat, SF_DIR, family).collect())
        )
        exp = sorted(map(tuple, QUERIES[batch_q](spark, SF_DIR).collect()))
        assert got == exp, family


def test_streamed_drift_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the whole stream over
    the SAME source with a fresh checkpoint overwrites each batch_id
    partition — merged results must not change (no double counting)."""
    src = str(tmp_path / "src")
    feat = str(tmp_path / "feat")
    schema = _stage_time_chunks(spark, src)

    eng = SignalEngine(spark, str(tmp_path / "store"))

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        eng.maintain_drift_feature_stream(
            stream, feat, str(tmp_path / ck)
        ).awaitTermination(180)

    run("ck1")
    first = sorted(map(tuple, eng.drift_scores(feat, SF_DIR).collect()))
    run("ck2")  # full replay into the same feature store
    again = sorted(map(tuple, eng.drift_scores(feat, SF_DIR).collect()))
    assert first == again
