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
TARGET_FILE_BYTES = 128 * 1024 * 1024  # compaction target file size


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


def compact_partition(spark: SparkSession, path: str, event_date: str) -> int:
    """Small-file compaction for one date partition — streaming ingest
    appends a file per micro-batch, and a 100 TB store lives or dies
    by file sizes (footer-stat pruning and scan throughput both
    degrade with file count). Rewrites the partition to SIGNAL_BUCKETS
    signal-clustered sorted files; returns the file count removed.

    The rewrite stages to a sibling directory, then swaps by renaming
    the original to `.old` before renaming the staged copy in — a
    crash mid-swap leaves the data recoverable in `.old` (never in a
    deleted-only state), though the partition path itself may be
    briefly absent; use a table format for an atomic swap."""
    part = f"{path}/event_date={event_date}"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    ppath = jvm.org.apache.hadoop.fs.Path(part)
    fs = ppath.getFileSystem(conf)
    if not fs.exists(ppath):
        return 0
    statuses = [
        f for f in fs.listStatus(ppath) if f.getPath().getName().endswith(".parquet")
    ]
    before = len(statuses)
    total_bytes = sum(f.getLen() for f in statuses)
    # size the output by bytes (the point of compaction), capped at the
    # bucket count so signal clustering is preserved on big partitions
    n_files = max(1, min(SIGNAL_BUCKETS, -(-total_bytes // TARGET_FILE_BYTES)))
    staged = f"{part}.compacting"
    (
        spark.read.parquet(part)
        .repartition(n_files, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .write.option("compression", "zstd")
        .mode("overwrite")
        .parquet(staged)
    )
    spath = jvm.org.apache.hadoop.fs.Path(staged)
    # swap via rename-out → rename-in: the original survives as
    # `.old` through the window, so a crash mid-swap is recoverable
    # (the data is never only in a deleted state); a table format
    # makes this step atomic
    old = jvm.org.apache.hadoop.fs.Path(f"{part}.old")
    fs.delete(old, True)
    fs.rename(ppath, old)
    fs.rename(spath, ppath)
    fs.delete(old, True)
    after = sum(
        1 for f in fs.listStatus(ppath) if f.getPath().getName().endswith(".parquet")
    )
    return max(0, before - after)
