"""Streaming dedup parity: a duplicated input stream (every file
staged twice — an at-least-once source) must land exactly the
distinct rows.
"""

from __future__ import annotations

from tests.conftest import SF_DIR
from timeseriesdb_spark.streaming import dedup
from timeseriesdb_spark.tables import load_table


def test_stream_dedup_drops_replayed_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts", "value")
    # stage twice: the replayed-source scenario
    ev.coalesce(2).write.mode("append").parquet(src)
    ev.coalesce(2).write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 2 * ev.count()

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        dedup.dedup_stream(stream, keys=["event_id"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
