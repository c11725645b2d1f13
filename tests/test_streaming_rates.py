"""Streaming counter-rate parity: per-row rate events from the
carry-state stream, aggregated with the batch query's own
round→decimal-sum expressions, must equal q_counter_rate exactly —
micro-batch boundaries cannot perturb a single delta."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.tsanalytics import q_counter_rate
from timeseriesdb_spark.streaming import rates
from timeseriesdb_spark.tables import load_table


def test_stream_counter_rate_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )

    # Stage 4 time-ordered files (oldest-first processing reproduces
    # per-signal arrival order — the segmenter-test harness).
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
        rates.counter_rate_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # Downstream consumer: the batch query's own aggregation over the
    # streamed rate events (round→decimal-sum, integer resets, µs span).
    got = (
        spark.read.parquet(out)
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum(F.round(F.col("inc_raw"), 6).cast("decimal(38,6)"))
            .cast("double")
            .alias("increase"),
            F.sum("is_reset").cast("long").alias("n_resets"),
            (
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
                / F.lit(1_000_000)
            ).alias("span_sec"),
        )
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    exp = (
        q_counter_rate(spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[["user_id", "increase", "n_resets", "span_sec"]],
        exp[["user_id", "increase", "n_resets", "span_sec"]],
        check_dtype=False,
    )
