"""The signal store: partitioned-Parquet persistence (SURVEY.md §1.5).

Replaces the reference's RocksDB KV of bincode'd segments
(file_handler.rs:29-53 fm_write/fm_get) with the declarative layout
Spark prunes natively:

- partition column `event_date` (day of ts) → partition pruning for
  time-range queries (the SegmentKey.timestamp axis);
- file-level signal clustering via repartition on (signal bucket) +
  sortWithinPartitions(user_id, ts) → per-file min/max footer stats
  prune on signal id (the SegmentKey.signal axis) and rows arrive
  presorted for per-signal windows;
- Parquet encodings (dictionary / delta / byte-stream-split) + zstd do
  the Methods-enum job (§1.3) per column chunk, chosen by the writer.

At 100 TB: same layout, plus a target file size (maxRecordsPerFile or
table-format compaction) and bucketed tables if the engine supports
writing bucket metadata (saveAsTable with bucketBy) so signal-keyed
joins co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIGNAL_BUCKETS = 16  # files per date partition ≈ cluster write parallelism


def write_signal_store(events: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist events as the time-partitioned, signal-clustered store."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition(SIGNAL_BUCKETS, F.col("user_id"))
        .sortWithinPartitions("user_id", "ts")
        .write.partitionBy("event_date")
        .option("compression", "zstd")
        .mode(mode)
        .parquet(path)
    )


def read_signal_store(spark: SparkSession, path: str) -> DataFrame:
    """Scan the store; time/signal predicates prune partitions/files."""
    return spark.read.parquet(path)
