"""Streamed shipdate store == batch interval join (r14).

q_interval_join's eager aggregation (per-date integer partials below
the binned range join) makes the probe side associative streaming
state: maintain_shipdate_stream writes each micro-batch's partials to
its own batch_id partition, interval_join_from_store merges them and
runs the identical serve join. These tests pin exact equality with the
batch query however the rows were micro-batched.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.registry import QUERIES
from timeseriesdb_spark.tables import load_table


def _pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (
        pdf.sort_values(list(pdf.columns)).reset_index(drop=True).astype(str)
    )


def test_streamed_interval_join_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "shipdate")
    ckpt = str(tmp_path / "ckpt")

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    # round-robin split so most ship dates span micro-batches — the
    # merge path (partial sums across batch_id partitions), not just
    # first-write
    li.repartition(6).write.parquet(src)

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    eng.maintain_shipdate_stream(stream, store, ckpt).awaitTermination(180)

    got = _pdf(eng.interval_join_from_store(store, SF_DIR))
    exp = _pdf(QUERIES["q_interval_join"](spark, SF_DIR))
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_shipdate_partials_are_per_batch(spark, tmp_path):
    """Each micro-batch owns its batch_id partition (idempotent under
    at-least-once replay) and a date split across batches appears in
    several partitions with partials summing to the full-scan frame."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "shipdate")

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    li.repartition(4).write.parquet(src)

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    eng.maintain_shipdate_stream(
        stream, store, str(tmp_path / "ckpt")
    ).awaitTermination(180)

    parts = spark.read.parquet(store)
    n_batches = parts.select("batch_id").distinct().count()
    assert n_batches >= 2, "expected multiple micro-batches"

    merged = parts.groupBy("ship_d").agg(
        F.sum("d_cnt").alias("d_cnt"), F.sum("d_qty").alias("d_qty")
    )
    from timeseriesdb_spark.operators.curation import daily_shipments

    pd.testing.assert_frame_equal(_pdf(merged), _pdf(daily_shipments(li)))
