"""Streaming sustained-threshold parity: every episode CLOSED by a
later sample must equal the batch gaps-and-islands query exactly;
episodes still open at end-of-stream stay in state (an alert that
never clears never resolves)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.tsanalytics import (
    SUSTAIN_K,
    SUSTAIN_TH,
    q_sustained_threshold,
)
from timeseriesdb_spark.streaming import alerts
from timeseriesdb_spark.tables import load_table

COLS = ["user_id", "start_ts", "end_ts", "n_samples", "peak_value"]


def test_stream_alerts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
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
        alerts.alert_stream(stream, SUSTAIN_TH, SUSTAIN_K)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )

    # Expected = batch episodes minus each signal's still-open tail run
    # (signals whose LAST sample breaches have an unresolved episode).
    exp_all = q_sustained_threshold(spark, SF_DIR).toPandas()
    last = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value")
        .toPandas()
    )
    open_tail = last[last["value"] > SUSTAIN_TH][["user_id", "ts"]].rename(
        columns={"ts": "end_ts"}
    )
    exp = (
        exp_all.merge(
            open_tail.assign(_open=True), on=["user_id", "end_ts"], how="left"
        )
        .query("_open.isna()")
        .drop(columns="_open")
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )

    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)
