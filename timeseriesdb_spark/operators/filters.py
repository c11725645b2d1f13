"""Filter / projection / predicate operators.

Reference surface (SURVEY.md §2.2): per-encoding range/equality filter
kernels returning position bitmaps (split_double.rs:4230/4422,
buff_slice.rs:1348/1553/1665, gorilla.rs:204/284, sprintz.rs:258/331),
selection-vector-driven decode (`decode_condition`,
split_double.rs:2374) and filter (`*_filter_condition`,
split_double.rs:5739), and precision-limited decode
(`byte_residue_decode_with_precision`, split_double.rs:2434, driven by
pscan/main.rs:51-79).

Spark mapping: one declarative filter each. The entire per-encoding /
SIMD / bitmap machinery is owned by the vectorized Parquet reader +
whole-stage codegen; the predicates below reach the scan as
PushedFilters (verify with .explain("formatted")), so at 100 TB the
scan skips row groups via footer min/max before any CPU is spent —
the same skipping the reference implements per byte-plane.

"Row positions" become `event_id` (the stable key): a bitmap of
positions is exactly a projected key column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

RANGE_PRED = 100.0  # value > p  — tsbs `range` shape (load > 0.9 scaled)
SMALLER_PRED = 5.0  # value < p  — `*_range_smaller_filter` shape
EQUAL_QTY = 25.0    # equality pred on a low-cardinality double column


def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value > p → qualifying rows (range_filter, split_double.rs:4230)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value") > RANGE_PRED).select("event_id", "user_id", "value")


def q_range_smaller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value < p (buff_slice.rs:1553)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value") < SMALLER_PRED).select("event_id", "user_id", "value")


def q_equal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter (split_double.rs:4422). Run on lineitem.l_quantity
    — a low-cardinality double, the shape the reference's majority-value
    short-path optimizes (split_double.rs:5804); Parquet dictionary pages
    + pushdown give the equivalent skip."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") == EQUAL_QTY).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def q_precision_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-limited decode: values at p decimal digits
    (split_double.rs:2434; pscan/main.rs:51-79). The reference reads
    fewer byte-planes; semantically it returns round(value, p)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", F.round("value", 1).alias("value_p1"))


def q_precision_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM at limited precision (pscan/main.rs:80-128): sum of
    precision-truncated values. round→decimal per row keeps the sum
    order-independent and engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.round("value", 1).cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_p1")
    )


def q_projection_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection-vector projection (`decode_condition`,
    split_double.rs:2374): fetch values at a given row-position list.
    The position list is a key set → broadcast LEFT SEMI join, then
    project. Catalyst pushes the semi-join below the wide projection
    (late materialization, §2.2 `*_filter_condition`)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("user_id")
    )
    return ev.join(F.broadcast(keys), "user_id", "semi").select(
        "event_id", "user_id", "value"
    )


QUERIES = {
    "q_range_filter": q_range_filter,
    "q_range_smaller": q_range_smaller,
    "q_equal_filter": q_equal_filter,
    "q_precision_decode": q_precision_decode,
    "q_precision_sum": q_precision_sum,
    "q_projection_join": q_projection_join,
}

ORACLES = {
    "q_range_filter": f"""
        SELECT event_id, user_id, value FROM events WHERE value > {RANGE_PRED}
    """,
    "q_range_smaller": f"""
        SELECT event_id, user_id, value FROM events WHERE value < {SMALLER_PRED}
    """,
    "q_equal_filter": f"""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity = {EQUAL_QTY}
    """,
    "q_precision_decode": """
        SELECT event_id, round(value, 1) AS value_p1 FROM events
    """,
    "q_precision_sum": """
        SELECT CAST(SUM(CAST(round(value, 1) AS DECIMAL(38,6))) AS DOUBLE) AS sum_p1
        FROM events
    """,
    "q_projection_join": """
        SELECT event_id, user_id, value FROM events
        WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
}
