"""Streamed histogram maintenance parity: per-micro-batch bin
partials, merged at read, must equal the one-pass batch histogram
EXACTLY (counts are linear), before and after compaction."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.operators.tsanalytics import q_histogram_rollup
from timeseriesdb_spark.tables import load_table


def _bins_pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["user_id", "bin"])
        .reset_index(drop=True)
    )


def test_streamed_histogram_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
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

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_histogram_stream(stream, hist, ckpt)
    q.awaitTermination(180)

    got = _bins_pdf(eng.histogram_bins(hist))
    exp = _bins_pdf(
        q_histogram_rollup(spark, SF_DIR).select("user_id", "bin", "n")
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # compaction invariance
    n = eng.compact_partials(hist, "hist")
    assert n >= 4
    pd.testing.assert_frame_equal(
        _bins_pdf(eng.histogram_bins(hist)), exp, check_dtype=False
    )
