"""Bucketed signal tables — shuffle-free co-located joins.

The signal store (store.py) handles time pruning; bucketing handles
the JOIN axis: two tables bucketed by the same key into the same
bucket count join with ZERO exchanges — at 100 TB this turns every
signal-keyed join/aggregation (events ⋈ rollup, events ⋈ tags,
windowed ops after join) from a full shuffle of the fact table into a
local per-bucket merge. This is the Spark analog of the reference
keying everything by SignalId in one RocksDB (segment.rs:216 —
co-location by construction).

Bucketed writes require the table catalog (saveAsTable), not bare
parquet paths — bucket metadata lives in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS = 16


def write_bucketed(
    df: DataFrame, table: str, key: str = "user_id", sort_by: str | None = "ts"
) -> None:
    """Persist as a bucketed (+ sorted within buckets) catalog table."""
    w = df.write.mode("overwrite").bucketBy(N_BUCKETS, key)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "user_id"
) -> DataFrame:
    """Join two same-key bucketed tables; Catalyst sees matching
    output partitionings and plans SortMergeJoin with no Exchange on
    either side (assert via plans.checks.exchange_count == 0)."""
    return spark.table(left_table).join(spark.table(right_table), key)
