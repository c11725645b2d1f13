"""Streamed OHLC maintenance parity: per-micro-batch endpoint
partials, merged at read, must equal the one-shot batch bars EXACTLY —
min/max over lexicographic struct keys are associative, so no row
partitioning can change any bar."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.operators.tsanalytics import (
    merge_ohlc,
    ohlc_partials,
    q_ohlc,
)
from timeseriesdb_spark.tables import load_table

COLS = ["user_id", "day", "open", "high", "low", "close", "n_samples"]


def _bars_pdf(df) -> pd.DataFrame:
    return (
        df.select(*COLS)
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )


def test_partial_merge_equals_direct(spark):
    """Partials from an arbitrary repartitioning merge to the exact
    window-based bars (the associativity property itself)."""
    ev = load_table(spark, SF_DIR, "events")
    chunked = ev.repartition(7, "event_id")  # scatter rows arbitrarily
    got = _bars_pdf(merge_ohlc(ohlc_partials(chunked)))
    exp = _bars_pdf(q_ohlc(spark, SF_DIR))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_streamed_ohlc_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    bars = str(tmp_path / "bars")
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
    q = eng.maintain_ohlc_stream(stream, bars, ckpt)
    q.awaitTermination(180)

    got = _bars_pdf(eng.ohlc_bars(bars))
    exp = _bars_pdf(q_ohlc(spark, SF_DIR))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # Compaction invariance: collapsing the batch partitions must not
    # change a single bar (the merge is the sketch's own combine).
    n = eng.compact_partials(bars, "ohlc")
    assert n >= 4
    pd.testing.assert_frame_equal(
        _bars_pdf(eng.ohlc_bars(bars)), exp, check_dtype=False
    )
