"""Batch source clients (SURVEY.md §2.1) — the reference's ingestion
clients re-expressed as Spark readers:

- CSV file client (`construct_file_client_skip_newline`,
  client.rs:241-254, 166-186): schema'd CSV scan with header/skip and
  custom delimiter. The reference's rate throttles (Amount, RunPeriod,
  Frequency) are stream-pacing concerns → streaming/ingest.py owns
  those (maxFilesPerTrigger / trigger intervals).
- scaled-int file iterator (client.rs:187-229): the same scan with
  ⌊v·10^p⌋ quantization (functions.codecs.scaled_int).
- generator clients (client.rs:258-343): deterministic normal/uniform
  synthetic signals from spark.range + seeded rand/randn — unlike the
  reference's thread-local RNG, the seed makes runs reproducible
  across any number of executors.
- dictionary reader (`read_dict`, client.rs:346+): TSV → small
  DataFrame meant for `F.broadcast` (the kernel/KNN dictionary side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from timeseriesdb_spark.functions.codecs import scaled_int

VALUE_SCHEMA = StructType([StructField("value", DoubleType())])


def csv_file_client(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    delimiter: str = ",",
    skip_header: bool = False,
) -> DataFrame:
    """Schema'd CSV scan. Always pass a schema in production — header
    inference is an extra full read of the data."""
    reader = (
        spark.read.option("delimiter", delimiter)
        .option("header", str(skip_header).lower())
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def scaled_int_client(
    spark: SparkSession, path: str, p: int = 3, delimiter: str = ","
) -> DataFrame:
    """CSV floats → scaled longs (the u32/i32 file iterators)."""
    df = csv_file_client(spark, path, VALUE_SCHEMA, delimiter=delimiter)
    return df.select(scaled_int(F.col("value"), p).alias("scaled"))


def generator_client(
    spark: SparkSession,
    kind: str = "normal",
    n_rows: int = 100_000,
    n_signals: int = 8,
    seed: int = 42,
    mean: float = 0.0,
    std: float = 1.0,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Deterministic synthetic signals: (signal_id, seq, value).
    spark.range parallelizes the id space; rand/randn are seeded and
    partition-stable, so the result is identical on 1 or 1000 cores."""
    base = spark.range(n_rows).select(
        (F.col("id") % n_signals).alias("signal_id"),
        F.col("id").alias("seq"),
    )
    if kind == "normal":
        value = F.randn(seed) * std + mean
    elif kind == "uniform":
        value = F.rand(seed) * (hi - lo) + lo
    else:
        raise ValueError(f"unknown generator kind: {kind}")
    return base.withColumn("value", value)


def read_dict(
    spark: SparkSession, path: str, delimiter: str = "\t"
) -> DataFrame:
    """TSV dictionary matrix → DataFrame (row_id, features array).
    Small by construction; join sides should wrap it in F.broadcast
    (the GRAIL/LCCE dictionary pattern, kernel.rs:104-130)."""
    if delimiter == "\n":
        raise ValueError("read_dict splits WITHIN lines; newline cannot delimit")
    raw = spark.read.text(path)
    split = F.split(F.col("value"), delimiter)
    return raw.select(
        F.monotonically_increasing_id().alias("row_id"),
        F.transform(split, lambda s: s.cast("double")).alias("features"),
    )


EVENTS_JSON_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING, "
    "_corrupt_record STRING"
)


def jsonl_events_client(
    spark: SparkSession, path: str, drop_corrupt: bool = False
) -> DataFrame:
    """JSON-lines event source with an enforced schema — the wire
    format a ZMQ/HTTP collector (ZMQClient/README.md:1) would land
    before Parquet conversion. Schema is DECLARED, never inferred (an
    inference pass reads the data twice and can flip types between
    crawls); malformed lines land in `_corrupt_record` (PERMISSIVE)
    instead of failing the job, so one bad producer can't sink a
    100 TB backfill. `drop_corrupt=True` filters them; either way the
    same schema comes back. Works unchanged as a stream:
    `spark.readStream.schema(...).json(path)`."""
    df = spark.read.schema(EVENTS_JSON_SCHEMA).json(path)
    if drop_corrupt:
        # Spark forbids predicates on _corrupt_record straight off raw
        # files (the parser would need a second pass); the documented
        # pattern is to materialize the parse first.
        df = (
            df.cache()
            .where(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record")
        )
    return df
