"""Incrementally-maintained streaming rollup == batch-built rollup,
including buckets whose rows arrive split across micro-batches (the
merge path, not just the first-write path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.tables import load_table


def test_streamed_rollup_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")
    # split rows across files ARBITRARILY (round-robin) so most buckets
    # span micro-batches and the merge path is exercised
    ev.repartition(6).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    eng = SignalEngine(spark, store)
    q = eng.maintain_rollup_stream(stream, rollup, ckpt, bucket="1 hour")
    q.awaitTermination(180)

    # the store holds per-batch PARTIALS (idempotent on replay);
    # bucket-level truth is their associative merge
    got = (
        spark.read.parquet(rollup)
        .groupBy("user_id", "bucket_start")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("dsum").cast("double").alias("sum_value"),
        )
        .toPandas()
        .sort_values(["user_id", "bucket_start"])
        .reset_index(drop=True)
    )
    exp = (
        ev.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("value").alias("cnt"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id", F.col("w.start").alias("bucket_start"),
            "cnt", "min_value", "max_value", "sum_value",
        )
        .toPandas()
        .sort_values(["user_id", "bucket_start"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_like=True)


def test_stream_distinct_sketches_match_batch(spark, tmp_path):
    """Stream-maintained HLL partials union-merge to exactly the batch
    one-pass estimate, and a replayed batch does not change it."""
    from timeseriesdb_spark.api import SignalEngine
    from timeseriesdb_spark.registry import QUERIES
    from timeseriesdb_spark.tables import load_table

    src = str(tmp_path / "hsrc")
    sk = str(tmp_path / "hsk")
    ckpt = str(tmp_path / "hckpt")

    ev = load_table(spark, SF_DIR, "events")
    ev.coalesce(3).write.mode("append").parquet(src)

    eng = SignalEngine(spark, str(tmp_path / "unused"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_distinct_stream(stream, sk, ckpt)
    q.awaitTermination(120)

    got = {
        r.user_id: r.approx_distinct
        for r in eng.distinct_estimate(sk).collect()
    }
    # q_distinct_hll is pytest-only since r12 (the register tier is
    # the declared surface) — import it directly
    from timeseriesdb_spark.operators.chunking import q_distinct_hll

    exp = {
        r.user_id: r.approx_distinct
        for r in q_distinct_hll(spark, SF_DIR).collect()
    }
    assert got == exp
