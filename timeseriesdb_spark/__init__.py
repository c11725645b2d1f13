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

# Lazy public API (PEP 562). Every Spark Python worker that unpickles
# a kernel closure imports the defining module, which first runs THIS
# package __init__ — an eager registry import here pulls every operator
# module (~0.7 s measured, growing with the repo) into every fresh
# worker on every executor. Deferring keeps worker import cost at the
# kernel module + its direct deps; driver-side users see the same API.
_EXPORTS = {
    "SignalEngine": ("timeseriesdb_spark.api", "SignalEngine"),
    "get_spark": ("timeseriesdb_spark.session", "get_spark"),
    "TABLES": ("timeseriesdb_spark.tables", "TABLES"),
    "load_table": ("timeseriesdb_spark.tables", "load_table"),
    "register_views": ("timeseriesdb_spark.tables", "register_views"),
    "QUERIES": ("timeseriesdb_spark.registry", "QUERIES"),
    "ORACLES": ("timeseriesdb_spark.registry", "ORACLES"),
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
