"""TSBS-style join queries.

Reference surface (SURVEY.md §2.3): the hand-rolled hash semi-join +
last-row-per-key inside the TSBS benchmark (benchmark/tsbs/mod.rs:29-48)
and its four query shapes — last-loc "project" (:20-160), low-fuel
"single" (:161-295), high-load "range" (:296-425), and "range-new"
(predicate join, :426-551).

Fixture mapping (FIXTURES.md F2): readings ≈ events (user_id = tag_id,
value = the measure), trucks ≈ a filtered customer subset (the
reference's t_id_south/t_id_west id sets, ~274 ids).

Spark mapping: the truck-id set is a broadcast LEFT SEMI join (no
shuffle of the fact side); "latest row per key" is a window
row_number() over (tag DESC ts) — rank state is per-signal, so the one
shuffle partitions by tag_id and scales linearly. The reference's
backward scan (scan newest→oldest, first hit per id) is exactly
row_number()=1 over ts DESC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

LOW_FUEL_PRED = 5.0    # value < p (ref: fuel < 0.1, tsbs/mod.rs:263)
HIGH_LOAD_PRED = 250.0  # value > p (ref: load > 0.9, tsbs/mod.rs:300)
PRED_JOIN_MAX_ID = 100  # ref range-new: tag_id < 100 (tsbs/mod.rs:442)


def _trucks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The truck-id membership set (t_id_south analog): customers in
    nations 0-4. Small → always broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_nationkey") < 5).select(
        F.col("c_custkey").alias("user_id")
    )


def _last_per_key(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def q_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per signal (tsbs/mod.rs:29-48 backward scan)."""
    ev = load_table(spark, sf_dir, "events")
    return _last_per_key(ev).select("user_id", "event_id", "ts", "value")


def q_last_loc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSBS last-loc "project": latest reading per selected truck,
    project the measure columns (tsbs/mod.rs:20-160). Semi-join FIRST so
    the window ranks only selected signals."""
    ev = load_table(spark, sf_dir, "events")
    sel = ev.join(F.broadcast(_trucks(spark, sf_dir)), "user_id", "semi")
    return _last_per_key(sel).select("user_id", "ts", "value")


def q_low_fuel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSBS "single": semi-join + value < pred (tsbs/mod.rs:161-295).
    Both the predicate and the join pushdown reach the scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(F.broadcast(_trucks(spark, sf_dir)), "user_id", "semi")
        .filter(F.col("value") < LOW_FUEL_PRED)
        .select("event_id", "user_id", "value")
    )


def q_high_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSBS "range": semi-join + value > pred (tsbs/mod.rs:296-425)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(F.broadcast(_trucks(spark, sf_dir)), "user_id", "semi")
        .filter(F.col("value") > HIGH_LOAD_PRED)
        .select("event_id", "user_id", "value")
    )


def q_range_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSBS "range-new": membership set replaced by the predicate
    tag_id < 100 (tsbs/mod.rs:426-551) — pure scan-side conjunction,
    no join at all. Catalyst folds both predicates into PushedFilters."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("user_id") < PRED_JOIN_MAX_ID) & (F.col("value") > HIGH_LOAD_PRED)
    ).select("event_id", "user_id", "value")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each 'purchase' event, the latest 'view' event of
    the same user at-or-before its timestamp. The reference only
    *approximates* as-of via its backward-scan-first-match pattern
    (tsbs/mod.rs:29-48); this is the true ordered semantics.

    Scale shape: the union-merge pattern — tag both sides, one shuffle
    on user_id, a running `last(ignorenulls)` over (ts, side) order.
    No range join, no per-row probe: cost is one sort per key bucket,
    which survives 100× scale (an AS OF range-join would explode)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value", "event_type"
    )
    sides = ev.filter(F.col("event_type").isin("view", "purchase")).withColumn(
        "side", F.when(F.col("event_type") == "view", 0).otherwise(1)
    )
    # views sort before purchases at equal ts → `>=` (inclusive) as-of
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("side") == 0
    return (
        sides.withColumn(
            "view_ts", F.last(F.when(is_view, F.col("ts")), ignorenulls=True).over(w)
        )
        .withColumn(
            "view_value",
            F.last(F.when(is_view, F.col("value")), ignorenulls=True).over(w),
        )
        .filter((F.col("side") == 1) & F.col("view_value").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
            "view_ts",
            "view_value",
        )
    )


QUERIES = {
    "q_last_per_key": q_last_per_key,
    "q_last_loc": q_last_loc,
    "q_low_fuel": q_low_fuel,
    "q_high_load": q_high_load,
    "q_range_new": q_range_new,
    "q_asof_join": q_asof_join,
}

_TRUCKS_SQL = "(SELECT c_custkey FROM customer WHERE c_nationkey < 5)"

ORACLES = {
    "q_last_per_key": """
        SELECT user_id, event_id, ts, value FROM (
            SELECT user_id, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "q_last_loc": f"""
        SELECT user_id, ts, value FROM (
            SELECT user_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE user_id IN {_TRUCKS_SQL}
        ) WHERE rn = 1
    """,
    "q_low_fuel": f"""
        SELECT event_id, user_id, value FROM events
        WHERE user_id IN {_TRUCKS_SQL} AND value < {LOW_FUEL_PRED}
    """,
    "q_high_load": f"""
        SELECT event_id, user_id, value FROM events
        WHERE user_id IN {_TRUCKS_SQL} AND value > {HIGH_LOAD_PRED}
    """,
    "q_range_new": f"""
        SELECT event_id, user_id, value FROM events
        WHERE user_id < {PRED_JOIN_MAX_ID} AND value > {HIGH_LOAD_PRED}
    """,
    # DuckDB's native ASOF JOIN pins the exact inclusive (>=) semantics
    # our union-merge window implements.
    "q_asof_join": """
        SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value, v.ts AS view_ts,
               v.value AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
}
