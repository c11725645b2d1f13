"""Streaming rolling-quantile parity: the bounded-tail stateful
operator must equal the batch rank-selection form (q_rolling_quantile)
exactly — the micro-batch boundary cannot perturb a selection."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.windows import q_rolling_quantile
from timeseriesdb_spark.streaming import quantile
from timeseriesdb_spark.tables import load_table


def test_stream_rolling_quantile_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )

    # Stage 4 time-ordered files (oldest-first processing reproduces
    # per-signal arrival order — the smoothing-test harness).
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
        quantile.rolling_quantile_stream(stream)
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
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    exp_rows = q_rolling_quantile(spark, SF_DIR)
    ts_map = ev.select("event_id", "ts")
    exp = (
        exp_rows.join(ts_map, "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[["user_id", "event_id", "med", "p90", "n_frame"]].reset_index(
            drop=True
        ),
        exp[["user_id", "event_id", "med", "p90", "n_frame"]].reset_index(
            drop=True
        ),
        check_dtype=False,
    )
