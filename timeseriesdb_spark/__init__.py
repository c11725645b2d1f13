"""spark-tsdb: a PySpark-native analytics engine with the query and
data-processing capabilities of UCHI-DB/TimeSeriesDB.

The reference (a Rust time-series DB: per-signal segments + RocksDB +
query-over-compressed-data kernels) is re-expressed Spark-first:

- storage: time-partitioned Parquet (Parquet encodings subsume the
  Gorilla/BUFF/Sprintz codec axis — SURVEY.md §1.3/§1.5)
- query kernels (range/equal filters, selection-vector decode, sum/max
  over compressed bytes): declarative DataFrame expressions; Catalyst
  pushdown + the vectorized Parquet reader replace the hand-rolled
  per-encoding SIMD paths (SURVEY.md §2.2, §4)
- TSBS/Influx benchmark queries: joins + window functions (§2.3, §2.4)
- PAA/FFT/PLA/kNN: grouped pandas UDFs over numpy (§2.5, §2.9)
- AggStats cache (buffer_pool.rs:757-790): an explicit rollup/summary
  table with associative merge (operators/aggregates.py)

Beyond the reference's surface, `operators/{dedup,similarity,text,
multimodal}` add LLM-training-data-pipeline operators, each designed
for 100 TB scale (no driver-side collection; broadcast-only dimension
joins; per-partition work via Arrow-batched pandas UDFs).
"""

from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.registry import ORACLES, QUERIES
from timeseriesdb_spark.session import get_spark
from timeseriesdb_spark.tables import TABLES, load_table, register_views

__all__ = [
    "SignalEngine",
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "QUERIES",
    "ORACLES",
]
