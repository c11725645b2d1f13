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


PRECISIONS = range(6)  # pscan sweeps decimal precisions 0..5 (main.rs:51-128)


def q_precision_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-limited decode at every precision the reference's
    pscan sweeps (split_double.rs:2434; pscan/main.rs:51-128 runs
    p = 0..5). The reference reads fewer byte-planes per p;
    semantically each column is round(value, p). One scan, six wide
    columns — no row explosion (a 6× stacked fact would sextuple
    shuffle/IO at 100 TB for no information gain)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        *[F.round("value", p).alias(f"value_p{p}") for p in PRECISIONS],
    )


def q_precision_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM at limited precision for the full pscan precision sweep
    (pscan/main.rs:80-128, p = 0..5): sum of precision-truncated
    values per p. round→decimal per row keeps each sum
    order-independent and engine-exact. One aggregation pass computes
    all six (map-side partials); the 1-row result is then stacked to
    (p, sum_p) rows — the explode touches one row, not the fact."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        *[
            F.sum(F.round("value", p).cast("decimal(38,6)"))
            .cast("double")
            .alias(f"s{p}")
            for p in PRECISIONS
        ]
    )
    pairs = ", ".join(f"{p}, s{p}" for p in PRECISIONS)
    return agg.select(
        F.expr(f"stack({len(PRECISIONS)}, {pairs}) AS (p, sum_p)")
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
        SELECT event_id,
            {cols}
        FROM events
    """.format(
        cols=",\n            ".join(
            f"round(value, {p}) AS value_p{p}" for p in PRECISIONS
        )
    ),
    "q_precision_sum": """
        WITH s AS (
            SELECT
                {sums}
            FROM events
        )
        {union}
    """.format(
        sums=",\n                ".join(
            f"CAST(SUM(CAST(round(value, {p}) AS DECIMAL(38,6))) AS DOUBLE)"
            f" AS s{p}"
            for p in PRECISIONS
        ),
        union="\n        UNION ALL ".join(
            f"SELECT {p} AS p, s{p} AS sum_p FROM s" for p in PRECISIONS
        ),
    ),
    "q_projection_join": """
        SELECT event_id, user_id, value FROM events
        WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
}
