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


QUERIES = {
    "q_column_profile": q_column_profile,
    "q_gap_days": q_gap_days,
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

ORACLES = {
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
