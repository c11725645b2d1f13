"""Data-profiling operators: table column statistics and calendar
gap detection.

The reference maintains per-segment AggStats at write time
(buffer_pool.rs:757-790) and prunes with hierarchical stats trees
(stats.rs:7-58) — the engine-side use of column statistics. These
queries expose the same statistics as a user-facing surface: the
ANALYZE-style column profile every warehouse runs before planning,
and the per-signal missing-days report that drives backfill jobs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style numeric column profile of lineitem: rows of
    (column, n, n_null, n_distinct, min_v, max_v).

    All columns profile in ONE scan: a single agg computes every
    per-column statistic (Spark plans the multi-distinct via one
    Expand — still one pass over the data), then the wide row is
    unpivoted driver-side into the profile rows. At 100 TB swap
    count_distinct for approx_count_distinct (HLL, no Expand) — the
    statistics consumer (the optimizer) only needs magnitude."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"{c}__nn"
            ),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    wide = li.agg(*aggs)
    parts = [
        wide.select(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").cast("double").alias("min_v"),
            F.col(f"{c}__mx").cast("double").alias("max_v"),
        )
        for c in PROFILE_COLS
    ]
    return reduce(DataFrame.unionAll, parts)


def q_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal calendar gaps: days inside [first_day, last_day] of
    each signal with ZERO events — the missing-data report that
    schedules backfills (the row-level twin of q_gap_report's
    intra-day SLA view).

    Shape: per-signal min/max day + distinct active days are one
    partial agg; the calendar is generated per signal with sequence()
    (span-bounded array, no cross join against a calendar table) and
    anti-joined against the active-day set within the same signal
    partitioning — one shuffle total, no global structure."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("d")
    )
    active = days.distinct()
    span = active.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    calendar = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
    )
    return (
        calendar.join(active, ["user_id", "d"], "anti")
        # timestamp, not date: pandas/Arrow map DATE to python objects
        # on one engine and datetime64 on the other — the driver's
        # repr-hash needs one physical type from both
        .select("user_id", F.col("d").cast("timestamp").alias("gap_day"))
    )


DQ_QTY_LO, DQ_QTY_HI = 1.0, 50.0  # valid l_quantity range
DQ_SCHEMA = "table_name string, check_name string, violations bigint, total bigint"


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report (the Deequ/expectations pattern):
    completeness, uniqueness, range, referential-integrity and
    non-emptiness checks as (table, check, violations, total) rows —
    the gate a pipeline runs before promoting a batch, next to
    q_column_profile's statistics.

    Shape: per-table checks share ONE scan via a single multi-aggregate
    (the q_column_profile discipline); the FK check is a broadcast-able
    anti-join count. Every result frame is one row, so the final union
    is free. At 100 TB each check stays a partial-aggregated scan —
    nothing row-sized ever leaves the executors."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    doc = load_table(spark, sf_dir, "documents")

    li_wide = li.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)
        ).alias("v_null"),
        F.sum(
            F.when(
                ~F.col("l_quantity").between(DQ_QTY_LO, DQ_QTY_HI), 1
            ).otherwise(0)
        ).alias("v_range"),
    )
    ord_wide = orders.agg(
        F.count(F.lit(1)).alias("total"),
        (F.count("o_orderkey") - F.count_distinct("o_orderkey")).alias(
            "v_dup"
        ),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("v_price"),
    )
    fk = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "anti",
        )
        .agg(F.count(F.lit(1)).alias("v_fk"))
        .crossJoin(li_wide.select("total"))
    )
    doc_wide = doc.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(
                F.col("text").isNull()
                | (F.length(F.trim(F.col("text"))) == 0),
                1,
            ).otherwise(0)
        ).alias("v_empty"),
    )

    def row(src: DataFrame, table: str, check: str, vcol: str) -> DataFrame:
        return src.select(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check_name"),
            F.col(vcol).cast("bigint").alias("violations"),
            F.col("total").cast("bigint").alias("total"),
        )

    parts = [
        row(li_wide, "lineitem", "not_null:l_orderkey", "v_null"),
        row(
            li_wide,
            "lineitem",
            f"range:l_quantity[{DQ_QTY_LO},{DQ_QTY_HI}]",
            "v_range",
        ),
        row(fk, "lineitem", "fk:l_orderkey->orders", "v_fk"),
        row(ord_wide, "orders", "unique:o_orderkey", "v_dup"),
        row(ord_wide, "orders", "positive:o_totalprice", "v_price"),
        row(doc_wide, "documents", "nonempty:text", "v_empty"),
    ]
    return reduce(DataFrame.unionAll, parts)


QUERIES = {
    "q_column_profile": q_column_profile,
    "q_gap_days": q_gap_days,
    "q_dq_checks": q_dq_checks,
}

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""
        SELECT '{c}' AS "column", count(*) AS n,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS DOUBLE) AS min_v,
               CAST(max({c}) AS DOUBLE) AS max_v
        FROM lineitem
    """
    for c in PROFILE_COLS
)

_DQ_SQL = f"""
    WITH li AS (
        SELECT count(*) AS total,
               CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_null,
               CAST(sum(CASE WHEN NOT (l_quantity BETWEEN {DQ_QTY_LO}
                                  AND {DQ_QTY_HI}) THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_range
        FROM lineitem
    ),
    ord AS (
        SELECT count(*) AS total,
               count(o_orderkey) - count(DISTINCT o_orderkey) AS v_dup,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS v_price
        FROM orders
    ),
    fk AS (
        SELECT count(*) AS v_fk FROM lineitem l
        ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    doc AS (
        SELECT count(*) AS total,
               CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_empty
        FROM documents
    )
    SELECT 'lineitem' AS table_name, 'not_null:l_orderkey' AS check_name,
           v_null AS violations, total FROM li
    UNION ALL
    SELECT 'lineitem', 'range:l_quantity[{DQ_QTY_LO},{DQ_QTY_HI}]',
           v_range, total FROM li
    UNION ALL
    SELECT 'lineitem', 'fk:l_orderkey->orders', CAST(v_fk AS BIGINT),
           total FROM fk, li
    UNION ALL
    SELECT 'orders', 'unique:o_orderkey', CAST(v_dup AS BIGINT),
           total FROM ord
    UNION ALL
    SELECT 'orders', 'positive:o_totalprice', v_price, total FROM ord
    UNION ALL
    SELECT 'documents', 'nonempty:text', v_empty, total FROM doc
"""

ORACLES = {
    "q_dq_checks": _DQ_SQL,
    "q_column_profile": _PROFILE_SQL,
    "q_gap_days": """
        WITH active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        span AS (
            SELECT user_id, min(d) AS d0, max(d) AS d1
            FROM active GROUP BY user_id
        ),
        calendar AS (
            SELECT user_id,
                   CAST(unnest(generate_series(d0, d1,
                        INTERVAL 1 DAY)) AS DATE) AS d
            FROM span
        )
        SELECT c.user_id, CAST(c.d AS TIMESTAMP) AS gap_day
        FROM calendar c
        ANTI JOIN active a ON a.user_id = c.user_id AND a.d = c.d
    """,
}
