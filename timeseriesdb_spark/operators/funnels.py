"""Event-funnel and cohort-retention analytics over the events table —
the product-analytics surface (sessionize/follow-window's siblings):
ordered multi-stage funnels and the cohort × day-offset retention
matrix every event store serves.

Scale design: every aggregation keys on user_id (or the tiny
(cohort_day, offset) pair after a per-user reduction), so the heavy
work rides one signal-key shuffle; stage conditions are conditional
aggregations (no self-join per stage — an N-stage funnel is N
min-filters in ONE grouped pass per step, not N scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

FUNNEL_STAGES = ["view", "click", "purchase"]  # ordered


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel per user: first 'view', then the first
    'click' strictly after it, then the first 'purchase' strictly
    after that. Emits per-user stage timestamps and the stage count
    reached — the drop-off report.

    Stage k+1's min is conditioned on stage k's timestamp, so each
    step is one conditional agg over the SAME user_id partitioning
    (the first agg's shuffle is reused by the joins — broadcast-sized
    per-user frames at any scale since they're one row per user)."""
    ev = load_table(spark, sf_dir, "events")
    s1, s2, s3 = FUNNEL_STAGES
    t1 = (
        ev.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t2 = (
        ev.filter(F.col("event_type") == s2)
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        ev.filter(F.col("event_type") == s3)
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_view").isNull(), 0)
        .when(F.col("t_click").isNull(), 1)
        .when(F.col("t_purchase").isNull(), 2)
        .otherwise(3)
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id", "t_view", "t_click", "t_purchase",
            stage.alias("stage"),
        )
    )


COHORT_EVENT = "signup"  # cohort anchor


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-signup day,
    counted distinct on each day-offset they were active (any event).
    Rows (cohort_day, offset_days, n_users) — the triangle chart.

    Two shuffles: per-user first-signup agg (user key), then the
    distinct (cohort, offset, user) reduction; the cohort join is a
    one-row-per-user broadcast-able frame."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == COHORT_EVENT)
        .groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .filter(F.col("day") >= F.col("cohort_day"))
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias(
                "offset_days"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


WAU_DAYS = 7  # trailing window for weekly-active


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement rollup per day: DAU, trailing-7-day WAU, and the
    stickiness ratio DAU/WAU — computed EXACTLY (not sketched) by
    contributing each distinct (user, active-day) pair to the 7
    report days it keeps the user "weekly active" for, then counting
    distinct users per report day. The explode factor is the window
    length (a constant), so this is O(7·pairs) — the exact-WAU shape
    that avoids a range self-join; at larger windows (MAU=30) the
    same plan holds, and past that the HLL sketch rollup
    (q_distinct_hll) is the answer.

    Report days are clipped to the observed activity span so no
    report row is built from a partial window's future. Ratio is one
    double division of two exact integers."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    dau = pairs.groupBy("day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {WAU_DAYS - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    span = pairs.agg(F.max("day").alias("d1")).first()
    wau = (
        contrib.filter(F.col("report_day") <= F.lit(span["d1"]))
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.day == wau.report_day)
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"),
                6,
            ).alias("stickiness"),
        )
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: counts and conditional
    probabilities of consecutive (prev → next) event types within each
    user's stream — the Markov/Sankey view of user behavior
    (q_funnel fixes one path; this measures all of them).

    One signal-key window (lag over (ts, event_id)) feeds a tiny
    (from_type, to_type) aggregation — at most |types|² rows out.
    Probabilities are integer/integer divisions per row, engine-exact;
    per from_type they sum to 1."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(wt).cast("double"),
            6,
        ).alias("p"),
    )


RFM_EVENT = "purchase"
RFM_N = 5  # quintile scores


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation of users from
    their purchase events — the classic growth-analytics operator.
    Score 1 = best quintile on each axis (most recent, most frequent,
    highest spend); the segment label concatenates the three scores.

    One events scan reduces to a users-sized aggregate (recency vs the
    corpus max ts, count, decimal-exact spend); the three ntile
    windows then run over USERS, not events — here that is
    dimension-sized. At 1e9 users the quintile boundaries would come
    from percentile thresholds joined back instead of a global ntile
    sort; the aggregate stage is unchanged. Deterministic: every ntile
    orders with a user_id tie-break, and monetary is a decimal sum, so
    scores are engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("now_ts"))
    per_user = (
        ev.where(F.col("event_type") == RFM_EVENT)
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff(F.col("now_ts"), F.col("last_ts")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    r_w = Window.orderBy("recency_days", "user_id")
    f_w = Window.orderBy(F.col("frequency").desc(), "user_id")
    m_w = Window.orderBy(F.col("monetary").desc(), "user_id")
    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(RFM_N).over(r_w).alias("r_score"),
        F.ntile(RFM_N).over(f_w).alias("f_score"),
        F.ntile(RFM_N).over(m_w).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


QUERIES = {
    "q_funnel": q_funnel,
    "q_retention_cohorts": q_retention_cohorts,
    "q_active_users": q_active_users,
    "q_event_transitions": q_event_transitions,
    "q_rfm_segments": q_rfm_segments,
}

_S1, _S2, _S3 = FUNNEL_STAGES

ORACLES = {
    "q_rfm_segments": f"""
        WITH mx AS (SELECT max(ts) AS now_ts FROM events),
        pu AS (
            SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                       AS monetary
            FROM events WHERE event_type = '{RFM_EVENT}'
            GROUP BY user_id
        ),
        r AS (
            SELECT user_id,
                   CAST(date_diff('day', CAST(last_ts AS DATE),
                                  CAST(now_ts AS DATE)) AS INTEGER)
                       AS recency_days,
                   frequency, monetary
            FROM pu, mx
        ),
        s AS (
            SELECT user_id, recency_days, frequency, monetary,
                   CAST(ntile({RFM_N}) OVER (ORDER BY recency_days,
                                             user_id) AS INTEGER)
                       AS r_score,
                   CAST(ntile({RFM_N}) OVER (ORDER BY frequency DESC,
                                             user_id) AS INTEGER)
                       AS f_score,
                   CAST(ntile({RFM_N}) OVER (ORDER BY monetary DESC,
                                             user_id) AS INTEGER)
                       AS m_score
            FROM r
        )
        SELECT *, r_score || '-' || f_score || '-' || m_score AS segment
        FROM s
    """,
    "q_funnel": f"""
        WITH t1 AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = '{_S1}' GROUP BY user_id
        ),
        t2 AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN t1 USING (user_id)
            WHERE e.event_type = '{_S2}' AND e.ts > t1.t_view
            GROUP BY e.user_id
        ),
        t3 AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN t2 USING (user_id)
            WHERE e.event_type = '{_S3}' AND e.ts > t2.t_click
            GROUP BY e.user_id
        )
        SELECT t1.user_id, t1.t_view, t2.t_click, t3.t_purchase,
               CAST(CASE WHEN t1.t_view IS NULL THEN 0
                         WHEN t2.t_click IS NULL THEN 1
                         WHEN t3.t_purchase IS NULL THEN 2
                         ELSE 3 END AS INT) AS stage
        FROM t1
        LEFT JOIN t2 USING (user_id)
        LEFT JOIN t3 USING (user_id)
    """,
    "q_event_transitions": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                       AS from_type,
                   event_type AS to_type
            FROM events
        ),
        counts AS (
            SELECT from_type, to_type, count(*) AS n
            FROM pairs WHERE from_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY from_type)
                            AS DOUBLE), 6) AS p
        FROM counts
    """,
    "q_active_users": f"""
        WITH pairs AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ),
        dau AS (
            SELECT day, count(DISTINCT user_id) AS dau
            FROM pairs GROUP BY day
        ),
        contrib AS (
            SELECT user_id,
                   unnest(generate_series(day,
                       day + INTERVAL {WAU_DAYS - 1} DAY,
                       INTERVAL 1 DAY)) AS report_day
            FROM pairs
        ),
        wau AS (
            SELECT report_day, count(DISTINCT user_id) AS wau
            FROM contrib
            WHERE report_day <= (SELECT max(day) FROM pairs)
            GROUP BY report_day
        )
        SELECT d.day, d.dau, w.wau,
               round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        FROM dau d JOIN wau w ON d.day = w.report_day
    """,
    "q_retention_cohorts": f"""
        WITH cohort AS (
            SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
            FROM events WHERE event_type = '{COHORT_EVENT}'
            GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        )
        SELECT c.cohort_day,
               CAST(date_diff('day', c.cohort_day, a.day) AS INT)
                   AS offset_days,
               count(DISTINCT a.user_id) AS n_users
        FROM activity a JOIN cohort c USING (user_id)
        WHERE a.day >= c.cohort_day
        GROUP BY 1, 2
    """,
}
