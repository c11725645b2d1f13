"""Streaming feature-snapshot parity: in-flight purchase enrichment
must equal the batch point-in-time join EXACTLY — every purchase, every
feature column — including across micro-batch and Arrow-chunk seams."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.funnels import (
    FEATURE_EVENTS,
    q_feature_snapshot,
)
from timeseriesdb_spark.streaming import features
from timeseriesdb_spark.tables import load_table

COLS = ["user_id", "purchase_id", "purchase_ts"] + [
    c for f in FEATURE_EVENTS for c in (f"last_{f}_value", f"n_{f}_before")
]


def _run_stream(spark, tmp_path, n_files):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    if n_files > 1:
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        edges = pd.date_range(lo, hi, periods=n_files + 1)
        for i in range(n_files):
            chunk = ev.filter(
                (F.col("ts") >= str(edges[i]))
                & (
                    F.col("ts") < str(edges[i + 1])
                    if i < n_files - 1
                    else F.lit(True)
                )
            )
            chunk.coalesce(1).write.mode("append").parquet(src)
    else:
        ev.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        features.feature_snapshot_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return (
        spark.read.parquet(out)
        .toPandas()[COLS]
        .sort_values(["user_id", "purchase_id"])
        .reset_index(drop=True)
    )


def test_stream_feature_snapshot_matches_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path, n_files=4)
    want = (
        q_feature_snapshot(spark, SF_DIR)
        .toPandas()[COLS]
        .sort_values(["user_id", "purchase_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stream_feature_snapshot_tiny_chunks(spark, tmp_path):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        got = _run_stream(spark, tmp_path, n_files=1)
    finally:
        spark.conf.set(key, old)
    want = (
        q_feature_snapshot(spark, SF_DIR)
        .toPandas()[COLS]
        .sort_values(["user_id", "purchase_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
