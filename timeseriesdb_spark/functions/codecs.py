"""Scalar codec kernels (SURVEY.md §2.7) re-expressed as Spark column
expressions — the reference's encoder *preprocessing* math, which is
the query-visible part of its codecs:

- scaled-int quantization (client.rs:187-229 scaled file iterators;
  PrecisionBound methods/prec_double.rs:36-82): value → ⌊value·10^p⌋.
- delta + zigzag (sprintz_double_encoder / unzigzag,
  methods/bit_packing.rs:14-330): per-signal first difference, then
  the sign-fold n → 2n / -2n-1 that makes small magnitudes small
  unsigned ints.
- delta-of-delta on timestamps (the Gorilla timestamp path,
  methods/gorilla_encoder.rs:10-314): second difference of epoch-µs.

The bit-plane packing itself belongs to Parquet (DELTA_BINARY_PACKED /
BYTE_STREAM_SPLIT do the reference's job declaratively — SURVEY.md
§1.5); what we keep queryable is the arithmetic, because analyses like
"how compressible is this signal" are delta-domain aggregations.

All kernels are pure built-in expressions (whole-stage codegen, no
Python); the per-signal lag is one window over (user_id ORDER BY ts,
event_id) — a single shuffle on the signal key, linear at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

SCALE_P = 3  # 10^3 — the reference's scl=1000 setting (tsbs/mod.rs:25)


def scaled_int(col: Column, p: int = SCALE_P) -> Column:
    """Float → scaled integer at 10^p (floor, not round: Spark's cast
    truncates toward zero while DuckDB's rounds — floor() first makes
    both engines agree; see also BASELINE gotchas)."""
    return F.floor(col * F.lit(float(10**p))).cast("long")


def zigzag(col: Column) -> Column:
    """Sign-fold to non-negative: n ≥ 0 → 2n, n < 0 → -2n-1
    (bit_packing.rs zigzag). Arithmetic form — identical in any engine,
    no reliance on shift/XOR signedness."""
    return F.when(col >= 0, col * 2).otherwise(-col * 2 - 1)


def _signal_window() -> Window:
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def q_delta_zigzag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal delta + zigzag of the scaled value — the sprintz
    encode domain. First row per signal carries the scaled value itself
    (the codec's stored header value), matching a lag default of 0."""
    ev = load_table(spark, sf_dir, "events")
    w = _signal_window()
    v = scaled_int(F.col("value"))
    delta = v - F.lag(v, 1, 0).over(w)
    return ev.select(
        "user_id",
        "event_id",
        v.alias("scaled"),
        zigzag(delta).alias("zz_delta"),
    )


def q_ts_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-of-delta of event timestamps per signal (Gorilla's
    timestamp codec): dod ≈ 0 for regularly sampled signals, which is
    exactly what makes them compressible. Emitted per event with the
    first/second rows carrying 0 defaults (the codec header)."""
    ev = load_table(spark, sf_dir, "events")
    w = _signal_window()
    us = F.unix_micros(F.col("ts"))
    d1 = us - F.lag(us, 1, 0).over(w)
    # lag of a derived column: compute in two layers so the window is
    # applied to a materialized expression (and the SQL mirrors it)
    inner = ev.select("user_id", "event_id", "ts", d1.alias("d1"))
    w2 = _signal_window()
    return inner.select(
        "user_id",
        "event_id",
        (F.col("d1") - F.lag("d1", 1, 0).over(w2)).alias("dod"),
    )


def q_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal run-length profile of the scaled value — the run
    structure behind the RLE/majority codec decision that
    q_compressibility's repeat RATIO cannot see (a 50% repeat ratio is
    one long run or thousands of 2-runs; only the former encodes
    well). n_runs / longest run / integer-exact mean run, from one
    boundary-flag window pass and a (signal, run) aggregation."""
    ev = load_table(spark, sf_dir, "events")
    w = _signal_window()
    v = scaled_int(F.col("value"))
    prev = F.lag(v, 1).over(w)
    boundary = F.when(prev.isNull() | (v != prev), 1).otherwise(0)
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = ev.select(
        "user_id", F.sum(boundary).over(run_w).alias("run_id")
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.count("*").alias("run_len")
    )
    agg = per_run.groupBy("user_id").agg(
        F.sum("run_len").alias("n_events"),
        F.count("*").alias("n_runs"),
        F.max("run_len").alias("max_run"),
    )
    mean_units = F.expr(
        "(2 * n_events * 1000000 + n_runs) div (2 * n_runs)"
    )
    return agg.select(
        "user_id",
        "n_events",
        "n_runs",
        "max_run",
        (mean_units.cast("double") / F.lit(1_000_000.0)).alias("mean_run"),
    )


def q_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal compressibility profile — the reference's CR
    predictors (predict/cr_predictor.rs:15-107) estimate each codec's
    ratio from sample statistics; these are those statistics as one
    grouped scan: distinct-value ratio (dictionary codec viability,
    est_dict_cr), repeat ratio (RLE viability), mean |Δ| of the scaled
    value (delta/sprintz viability). A writer picks codecs per signal
    from this table instead of trial-encoding."""
    ev = load_table(spark, sf_dir, "events")
    w = _signal_window()
    v = scaled_int(F.col("value"))
    prev = F.lag(v, 1).over(w)
    per_row = ev.select(
        "user_id",
        v.alias("scaled"),
        F.when(prev.isNull(), None)
        .otherwise(F.abs(v - prev))
        .alias("abs_delta"),
        F.when(v == prev, 1).otherwise(0).alias("is_repeat"),
    )
    return per_row.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(
            F.countDistinct("scaled") / F.count("*").cast("double"), 6
        ).alias("distinct_ratio"),
        F.round(F.sum("is_repeat") / F.count("*").cast("double"), 6).alias(
            "repeat_ratio"
        ),
        F.round(F.avg("abs_delta"), 6).alias("mean_abs_delta"),
    )


def q_fcm_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FCM/DFCM predictor residual profile per signal
    (methods/fcm_encoder.rs:12-170: FCM predicts the next value from a
    hash of recent values, DFCM predicts the next *delta* — the codec
    stores only prediction residuals, so residual statistics ARE the
    predictor's compression value).

    SQL-expressible analog on the scaled-int stream: the order-1
    context — FCM's table degenerates to last-value prediction, DFCM's
    to last-delta prediction (prev + prev_delta), both via lag windows
    with the codec's 0-defaults for the warm-up rows. Emitted per
    signal: hit ratio (residual == 0 → the encoder's 1-bit escape) and
    mean |residual| (the residual bit-width driver) for each predictor
    — the writer picks FCM vs DFCM per signal from this table exactly
    like q_compressibility picks codecs. One window + one grouped agg:
    a single shuffle on the signal key, linear at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = _signal_window()
    v = scaled_int(F.col("value"))
    prev = F.lag(v, 1, 0).over(w)
    prev2 = F.lag(v, 2, 0).over(w)
    fcm_res = v - prev                     # FCM: predict prev
    dfcm_res = v - (prev + (prev - prev2))  # DFCM: predict prev + Δprev
    per_row = ev.select(
        "user_id",
        fcm_res.alias("fcm_res"),
        dfcm_res.alias("dfcm_res"),
    )
    return per_row.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.when(F.col("fcm_res") == 0, 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("fcm_hit_ratio"),
        F.round(
            F.sum(F.when(F.col("dfcm_res") == 0, 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("dfcm_hit_ratio"),
        F.round(F.avg(F.abs(F.col("fcm_res"))), 6).alias("fcm_mean_abs_res"),
        F.round(F.avg(F.abs(F.col("dfcm_res"))), 6).alias("dfcm_mean_abs_res"),
    )


QUERIES = {
    "q_delta_zigzag": q_delta_zigzag,
    "q_ts_delta": q_ts_delta,
    "q_compressibility": q_compressibility,
    "q_run_lengths": q_run_lengths,
    "q_fcm_residuals": q_fcm_residuals,
}

ORACLES = {
    "q_run_lengths": f"""
        WITH flags AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(CAST(floor(value * {float(10**SCALE_P)})
                                      AS BIGINT), 1)
                             OVER win IS DISTINCT FROM
                             CAST(floor(value * {float(10**SCALE_P)})
                                  AS BIGINT)
                        THEN 1 ELSE 0 END AS boundary
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        runs AS (
            SELECT user_id,
                   sum(boundary) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS run_id
            FROM flags
        ),
        per_run AS (
            SELECT user_id, run_id, count(*) AS run_len
            FROM runs GROUP BY user_id, run_id
        ),
        agg AS (
            SELECT user_id, CAST(sum(run_len) AS BIGINT) AS n_events,
                   count(*) AS n_runs, CAST(max(run_len) AS BIGINT) AS max_run
            FROM per_run GROUP BY user_id
        )
        SELECT user_id, n_events, n_runs, max_run,
               CAST((2 * n_events * 1000000 + n_runs) // (2 * n_runs)
                    AS DOUBLE) / 1000000.0 AS mean_run
        FROM agg
    """,
    "q_compressibility": f"""
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CAST(floor(value * {float(10 ** SCALE_P)}) AS BIGINT) AS scaled
            FROM events
        ), d AS (
            SELECT user_id, scaled,
                   abs(scaled - lag(scaled) OVER w) AS abs_delta,
                   CASE WHEN scaled = lag(scaled) OVER w THEN 1 ELSE 0
                        END AS is_repeat
            FROM s
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, count(*) AS n,
               round(count(DISTINCT scaled) / CAST(count(*) AS DOUBLE), 6)
                   AS distinct_ratio,
               round(sum(is_repeat) / CAST(count(*) AS DOUBLE), 6)
                   AS repeat_ratio,
               round(avg(abs_delta), 6) AS mean_abs_delta
        FROM d GROUP BY user_id
    """,
    "q_delta_zigzag": f"""
        WITH scaled AS (
            SELECT user_id, event_id, ts,
                   CAST(floor(value * {float(10 ** SCALE_P)}) AS BIGINT) AS scaled
            FROM events
        ), d AS (
            SELECT user_id, event_id, scaled,
                   scaled - lag(scaled, 1, 0) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS delta
            FROM scaled
        )
        SELECT user_id, event_id, scaled,
               CASE WHEN delta >= 0 THEN delta * 2
                    ELSE -delta * 2 - 1 END AS zz_delta
        FROM d
    """,
    "q_fcm_residuals": f"""
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CAST(floor(value * {float(10 ** SCALE_P)}) AS BIGINT) AS scaled
            FROM events
        ), r AS (
            SELECT user_id,
                   scaled - lag(scaled, 1, 0) OVER w AS fcm_res,
                   scaled - (lag(scaled, 1, 0) OVER w
                             + (lag(scaled, 1, 0) OVER w
                                - lag(scaled, 2, 0) OVER w)) AS dfcm_res
            FROM s
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, count(*) AS n,
               round(sum(CASE WHEN fcm_res = 0 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS fcm_hit_ratio,
               round(sum(CASE WHEN dfcm_res = 0 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS dfcm_hit_ratio,
               round(avg(abs(fcm_res)), 6) AS fcm_mean_abs_res,
               round(avg(abs(dfcm_res)), 6) AS dfcm_mean_abs_res
        FROM r GROUP BY user_id
    """,
    "q_ts_delta": """
        WITH us AS (
            SELECT user_id, event_id, ts,
                   epoch_us(ts) AS us FROM events
        ), d1 AS (
            SELECT user_id, event_id, ts,
                   us - lag(us, 1, 0) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS d1
            FROM us
        )
        SELECT user_id, event_id,
               d1 - lag(d1, 1, 0) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dod
        FROM d1
    """,
}
