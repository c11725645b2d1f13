"""Streaming SCD-2 parity: every interval CLOSED by a later change
must equal the batch q_scd2's is_current = 0 rows exactly; each
user's open current row stays in state (the warehouse current-record
semantics)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.funnels import q_scd2
from timeseriesdb_spark.streaming import dimensions
from timeseriesdb_spark.tables import load_table

COLS = ["user_id", "state", "valid_from", "valid_to", "version", "is_current"]


def test_stream_scd2_matches_batch_closed_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    edges = pd.date_range(lo, hi, periods=5)
    for i in range(4):
        chunk = ev.filter(
            (F.col("ts") >= str(edges[i]))
            & (F.col("ts") < str(edges[i + 1]) if i < 3 else F.lit(True))
        )
        chunk.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dimensions.scd2_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out)
        .toPandas()[COLS]
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    want = (
        q_scd2(spark, SF_DIR)
        .where(F.col("is_current") == 0)
        .toPandas()[COLS]
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    got["version"] = got["version"].astype("int64")
    want["version"] = want["version"].astype("int64")
    got["is_current"] = got["is_current"].astype("int64")
    want["is_current"] = want["is_current"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # exactly the batch closed-row count — nothing doubled on replayed
    # keys, nothing dropped at micro-batch seams
    assert len(got) == len(want)


def test_stream_scd2_tiny_chunks_identical(spark, tmp_path):
    """Force 7-row Arrow chunks: interval boundaries must not split or
    merge at chunk seams (the whole-batch concat rule)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    ev.coalesce(1).write.parquet(src)
    try:
        spark.conf.set(key, "7")
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            dimensions.scd2_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set(key, old)
    got = spark.read.parquet(out).toPandas()
    want = (
        q_scd2(spark, SF_DIR).where(F.col("is_current") == 0).toPandas()
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[COLS]
        .astype({"version": "int64", "is_current": "int64"})
        .sort_values(["user_id", "version"])
        .reset_index(drop=True),
        want[COLS]
        .astype({"version": "int64", "is_current": "int64"})
        .sort_values(["user_id", "version"])
        .reset_index(drop=True),
    )
