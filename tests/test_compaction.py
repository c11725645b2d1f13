"""Compaction: many small appended files collapse to the bucketed
layout with identical data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.sources import store
from timeseriesdb_spark.tables import load_table


def test_compact_partition(spark, tmp_path):
    path = str(tmp_path / "store")
    ev = load_table(spark, SF_DIR, "events").filter(
        F.to_date("ts") == "2024-01-05"
    )
    # simulate micro-batch appends: many small files in one partition
    with_date = ev.withColumn("event_date", F.to_date("ts"))
    for _ in range(5):
        with_date.coalesce(2).write.partitionBy("event_date").mode(
            "append"
        ).parquet(path)
    total_before = spark.read.parquet(path).count()

    removed = store.compact_partition(spark, path, "2024-01-05")
    assert removed > 0

    after = spark.read.parquet(path)
    assert after.count() == total_before
    # data intact: per-signal checksums match
    s = (
        after.groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).alias("s"))
        .orderBy("user_id")
        .collect()
    )
    s2 = (
        with_date.groupBy("user_id")
        .agg((F.sum(F.col("value").cast("decimal(38,6)")) * 5).alias("s"))
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.s) for r in s] == [(r.user_id, r.s) for r in s2]


def test_compact_missing_partition_noop(spark, tmp_path):
    path = str(tmp_path / "store")
    ev = load_table(spark, SF_DIR, "events").limit(10)
    store.write_signal_store(ev, path)
    assert store.compact_partition(spark, path, "1999-01-01") == 0
