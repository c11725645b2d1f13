"""The reference's outlier workload: a 5-op sweep (decode, range
filter, equal filter, sum, max) over a sparse majority-valued u8
stream (outlier/mod.rs:90-216 — gen_u8_with_outlier builds a stream
that is MAJOR=69 with probability `ratio` and uniform 0..255
otherwise; outlier_byte_majority_encoding_decoding then times the five
operators against the sparse-residue codec; outlier_exp.sh sweeps the
ratio).

Spark mapping: the sparse stream is a DERIVED COLUMN over `events`,
deterministic from event_id via md5 (identical hex in Spark/DuckDB, so
all five ops are fully oracle-checked — no RNG, no rows-only paths).
The reference's codec axis (sparse residue encoding, RAPG) collapses
onto Parquet: a stored 90%-constant u8 column is a dictionary/RLE page
— the scan cost the codec buys is what Parquet gives natively, and
min/max footer stats + dictionary pushdown serve the range/equal
filters. The five queries here are the OPERATOR semantics over that
stream, all scan-only single-aggregation shapes that scale linearly.

MAJOR mirrors outlier/mod.rs:11 (`pub const MAJOR:f32 = 69.0`);
the 10% outlier share matches outlier_exp.sh's mid-sweep ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

MAJOR = 69          # outlier/mod.rs:11
OUTLIER_PCT = 10    # % of rows drawn uniform 0..255 instead of MAJOR
RANGE_PRED = 100    # range filter: sparse > 100 (a strict outlier band)


def _hex_byte(seed: str) -> "F.Column":
    """First md5 byte of (seed || event_id) as int 0..255 — the
    deterministic stand-in for the reference's thread_rng draws."""
    h = F.md5(F.concat(F.lit(seed), F.col("event_id").cast("string")))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def _sparse(df: DataFrame) -> DataFrame:
    """events + the sparse u8 column: MAJOR with (100-OUTLIER_PCT)%
    probability, else an independent uniform byte."""
    is_outlier = (_hex_byte("o:") % 100) >= (100 - OUTLIER_PCT)
    return df.withColumn(
        "sparse", F.when(is_outlier, _hex_byte("v:")).otherwise(F.lit(MAJOR))
    )


def _sparse_sql() -> str:
    return f"""
        SELECT event_id, user_id,
               CASE WHEN ('0x' || substr(md5('o:' || CAST(event_id AS VARCHAR)), 1, 2))::INTEGER % 100
                         >= {100 - OUTLIER_PCT}
                    THEN ('0x' || substr(md5('v:' || CAST(event_id AS VARCHAR)), 1, 2))::INTEGER
                    ELSE {MAJOR} END AS sparse
        FROM events
    """


def q_outlier_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode (byte_residue_decode_majority): materialize every
    value of the sparse stream — the scan-bandwidth baseline the other
    four ops are compared against."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    return _sparse(ev).select("event_id", "sparse")


def q_outlier_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range filter (byte_residue_range_filter_majority): rows with
    sparse > pred. On a stored column this is a dictionary-pushdown
    scan touching only non-majority pages."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    return (
        _sparse(ev)
        .filter(F.col("sparse") > RANGE_PRED)
        .select("event_id", "sparse")
    )


def q_outlier_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal filter (byte_residue_equal_filter_majority) against the
    majority value, reported as per-signal match counts (the
    reference's bitmap cardinality, grouped)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    return (
        _sparse(ev)
        .filter(F.col("sparse") == MAJOR)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_major"))
    )


def q_outlier_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum (byte_residue_sum_majority): per-signal integer sum —
    the majority-share shortcut (major × count + residue sum) is
    Tungsten's vectorized agg over dictionary pages here."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    return (
        _sparse(ev)
        .groupBy("user_id")
        .agg(F.sum("sparse").cast("bigint").alias("sparse_sum"))
    )


def q_outlier_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max (byte_residue_max_majority): per-signal max of the sparse
    stream — footer min/max stats answer this from metadata on a
    stored column."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    return (
        _sparse(ev)
        .groupBy("user_id")
        .agg(F.max("sparse").alias("sparse_max"))
    )


QUERIES = {
    "q_outlier_decode": q_outlier_decode,
    "q_outlier_range": q_outlier_range,
    "q_outlier_equal": q_outlier_equal,
    "q_outlier_sum": q_outlier_sum,
    "q_outlier_max": q_outlier_max,
}

ORACLES = {
    "q_outlier_decode": f"SELECT event_id, sparse FROM ({_sparse_sql()})",
    "q_outlier_range": f"""
        SELECT event_id, sparse FROM ({_sparse_sql()})
        WHERE sparse > {RANGE_PRED}
    """,
    "q_outlier_equal": f"""
        SELECT user_id, count(*) AS n_major FROM ({_sparse_sql()})
        WHERE sparse = {MAJOR} GROUP BY user_id
    """,
    "q_outlier_sum": f"""
        SELECT user_id, CAST(sum(sparse) AS BIGINT) AS sparse_sum
        FROM ({_sparse_sql()}) GROUP BY user_id
    """,
    "q_outlier_max": f"""
        SELECT user_id, max(sparse) AS sparse_max
        FROM ({_sparse_sql()}) GROUP BY user_id
    """,
}
