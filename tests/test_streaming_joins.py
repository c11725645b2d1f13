"""Stream-stream attribution join == the same join run in batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.streaming import joins
from timeseriesdb_spark.tables import load_table


def test_stream_stream_join_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    )
    ev.coalesce(4).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 4)  # one batch: watermark cannot
        .parquet(src)                     # drop cross-batch matches
    )
    views_s = stream.filter(F.col("event_type") == "view")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    q = (
        joins.attribution_join(views_s, purch_s)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)

    batch = load_table(spark, SF_DIR, "events")
    v = batch.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    exp = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 hour")),
    )
    assert got.count() == exp.count()
    g = sorted(
        (r.view_id, r.purchase_id) for r in got.select("view_id", "purchase_id").collect()
    )
    e = sorted(
        (r.view_id, r.purchase_id) for r in exp.select("view_id", "purchase_id").collect()
    )
    assert g == e
