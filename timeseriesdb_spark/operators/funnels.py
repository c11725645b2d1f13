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
    # span in-plan as a 1-row broadcast (r15, the q_bm25 treatment):
    # the first() job ran the pairs distinct shuffle serialized before
    # the main job; the clip comparison sees the identical max(day)
    span = pairs.agg(F.max("day").alias("_d1"))
    wau = (
        contrib.crossJoin(F.broadcast(span))
        .filter(F.col("report_day") <= F.col("_d1"))
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


EVENT_NGRAM_TOPK = 20  # reported trigram sequences


def q_event_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type TRIGRAM sequences across all user streams — the
    sequence-mining step between q_event_transitions (bigram Markov
    matrix) and q_funnel (one fixed path): which length-3 behavioral
    paths actually dominate, and how many distinct users walk each.

    One signal-key window (two leads over (ts, event_id)) feeds a
    (e1, e2, e3) aggregate bounded by |types|³; the top-k ranking runs
    on that bounded frame with a total-order tie-break, so every
    column is engine-exact integers. At extreme per-user history the
    lead-2 frame needs only a 2-row boundary carry, so the same
    (user, day-bucket) two-level treatment as q_running_sum applies if
    a single user's stream ever outgrows a task."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return rank_trigram_counts(tri)


def rank_trigram_counts(tri: DataFrame) -> DataFrame:
    """Shared finalize of the trigram miner: top-k by (n DESC, path) on
    the |types|³-bounded aggregate — used by both the batch query and
    the streamed-tier read path (api.event_ngrams), so ranking
    semantics cannot drift."""
    wr = Window.orderBy(F.col("n").desc(), "e1", "e2", "e3")
    return (
        tri.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= EVENT_NGRAM_TOPK)
        .select("rank", "e1", "e2", "e3", "n", "n_users")
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


TOUCH_EVENT, CONV_EVENT = "click", "purchase"
TOUCH_WINDOW_DAYS = 7


def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the most recent
    preceding click by the same user within 7 days (the marketing
    attribution join; the reference's backward-scan-first-match
    pattern, tsbs/mod.rs:29-48, generalized to per-row as-of).

    One signal-key window: a running `last(click_ts) IGNORE NULLS`
    over each user's (ts, event_id) order turns the as-of lookup into
    a carry-forward — no range self-join, no fan-out. The 7-day
    recency bound is a residual filter on the carried value.
    Timestamps pass through exactly; the lag is integer µs."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == TOUCH_EVENT, F.col("ts"))
    click_id = F.when(F.col("event_type") == TOUCH_EVENT, F.col("event_id"))
    carried = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(click_ts, ignorenulls=True).over(w).alias("touch_ts"),
        F.last(click_id, ignorenulls=True).over(w).alias("touch_id"),
    )
    conv = carried.where(F.col("event_type") == CONV_EVENT)
    lag_us = F.unix_micros("ts") - F.unix_micros("touch_ts")
    in_window = F.col("touch_ts").isNotNull() & (
        lag_us <= TOUCH_WINDOW_DAYS * 86_400_000_000
    )
    return conv.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("touch_id")).alias("touch_id"),
        F.when(in_window, F.col("touch_ts")).alias("touch_ts"),
        F.when(in_window, F.round(lag_us / F.lit(1_000_000.0), 6)).alias(
            "lag_s"
        ),
    )


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day new vs returning active users: a user counts as new on
    the day of their first event. Two users-then-days-sized
    aggregates — the (user, day) distinct pairs carry the shuffle,
    first-days are a users-sized frame joined back by day."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    active = ev.select("user_id", day.alias("day")).distinct()
    first_day = active.groupBy("user_id").agg(F.min("day").alias("day"))
    new_per_day = first_day.groupBy("day").agg(
        F.count("*").alias("new_users")
    )
    act_per_day = active.groupBy("day").agg(F.count("*").alias("active_users"))
    return (
        act_per_day.join(F.broadcast(new_per_day), "day", "left")
        .na.fill(0, ["new_users"])
        .select(
            "day",
            "active_users",
            "new_users",
            (F.col("active_users") - F.col("new_users")).alias(
                "returning_users"
            ),
            F.round(
                F.col("new_users").cast("double")
                / F.col("active_users").cast("double"),
                6,
            ).alias("new_share"),
        )
    )


GINI_DECILES = 10


def q_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration profile: the Lorenz curve of events per
    user in deciles (what share of events the most active 10%, 20%, …
    of users generate) plus the Gini coefficient — the "whales"
    diagnostic for any usage table.

    Events reduce to a users-sized count frame; ranking and the two
    cumulative sums run over users (dimension-sized — at 1e9 users the
    decile edges would come from approx quantiles instead). Gini uses
    the rank formula 2·Σ(r·c)/(n·Σc) − (n+1)/n on exact bigint
    products, so curve and coefficient are engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    # rank 1 = MOST active (curve reads "top k% of users")
    rk = Window.orderBy(F.col("c").desc(), F.col("user_id"))
    cum = Window.orderBy(F.col("c").desc(), F.col("user_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per_user.agg(
        F.count("*").alias("n"), F.sum("c").alias("total_events")
    )
    ranked = per_user.select(
        "c",
        F.row_number().over(rk).alias("r"),
        F.sum("c").over(cum).alias("cum_c"),
    ).crossJoin(F.broadcast(tot))
    # Gini over ASCENDING counts = 2·Σ(r_asc·c)/(n·Σc) − (n+1)/n with
    # r_asc = n − r + 1 (exact integer transform of the desc rank)
    gini_num = F.sum(
        (F.col("n") - F.col("r") + 1) * F.col("c")
    )
    decile = F.ceil(
        F.col("r") * GINI_DECILES / F.col("n")
    ).cast("int")
    per_decile = (
        ranked.groupBy(decile.alias("decile"))
        .agg(
            F.max(F.col("cum_c")).alias("cum_events"),
            F.max("r").cast("bigint").alias("cum_users"),
            F.max("n").alias("n"),
            F.max("total_events").alias("total_events"),
            gini_num.alias("_part_gnum"),
        )
    )
    w_all = Window.partitionBy()
    gini = (
        F.lit(2.0)
        * F.sum("_part_gnum").over(w_all).cast("double")
        / (F.col("n").cast("double") * F.col("total_events").cast("double"))
        - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
    )
    return per_decile.select(
        "decile",
        "cum_users",
        "cum_events",
        F.round(
            F.col("cum_events").cast("double")
            / F.col("total_events").cast("double"),
            6,
        ).alias("cum_share"),
        F.round(gini, 6).alias("gini"),
    )


def q_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per user: integer-day gaps between
    consecutive purchases, summarized as count/min/median/max — the
    replenishment-cycle metric behind churn prediction. One signal-key
    window (lag over the purchase subsequence); gaps are exact
    calendar-day integers, the median interpolates at most one .5
    (type-7 in both engines)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == RFM_EVENT
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.datediff(F.col("ts"), F.lag("ts").over(w))
    return (
        ev.select("user_id", gap.alias("gap_days"))
        .where(F.col("gap_days").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_days").alias("min_gap"),
            F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias(
                "median_gap"
            ),
            F.max("gap_days").alias("max_gap"),
        )
    )


ABANDON_MIN = 60  # conversion window after a click, minutes


def q_abandoned_carts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded anti-join: clicks with NO purchase by the same
    user within the next 60 minutes — the cart-abandonment /
    unresolved-alert shape (the negative twin of q_follow_window's
    attribution join).

    No join at all: a REVERSED window carries the next purchase
    timestamp onto every row (`min(purchase_us) over ts DESC` =
    earliest purchase at-or-after the row), and abandonment is a
    residual comparison — one signal-key shuffle where the naive
    left-anti time-range join would shuffle the fact twice and
    explode candidate pairs. µs-integer comparisons, engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    w_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros("ts")
    next_purch = F.min(
        F.when(F.col("event_type") == CONV_EVENT, us)
    ).over(w_rev)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        us.alias("us"),
        next_purch.alias("np_us"),
    ).where(F.col("event_type") == TOUCH_EVENT)
    abandoned = F.col("np_us").isNull() | (
        F.col("np_us") > F.col("us") + ABANDON_MIN * 60_000_000
    )
    return flagged.where(abandoned).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.round(
            (F.col("np_us") - F.col("us")) / F.lit(1_000_000.0), 6
        ).alias("next_purchase_gap_s"),
    )


FEATURE_EVENTS = ["view", "click", "error"]  # point-in-time feature set


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a CDC event stream:
    each user's event_type sequence is treated as an attribute feed,
    consecutive repeats collapse, and every retained change becomes a
    validity interval [valid_from, valid_to) with version numbers and
    an is_current flag — the warehouse snapshot the reference's
    last-match semi-join (tsbs/mod.rs:29-48) reads the tail of,
    materialized for point-in-time queries at every historical ts.

    One user-key shuffle: the change filter is a lag over the (ts,
    event_id) total order, and the second window (lead + row_number
    over change rows only) runs on the SAME partitioning, so Catalyst
    adds no second exchange. Per-task state is one user's history —
    bounded on the signal axis, so the plan survives 1000× more users
    unchanged. Timestamps pass through exactly (no arithmetic)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("state"),
            F.lag("event_type", 1).over(w).alias("prev_state"),
        )
        .where(
            F.col("prev_state").isNull()
            | (F.col("state") != F.col("prev_state"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts", 1).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    ).withColumn(
        "is_current",
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int"),
    )


def q_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join: for every purchase, the
    user's feature vector as of STRICTLY BEFORE that purchase — last
    observed value per feature event type plus running exposure counts
    — the feature-store discipline that keeps training labels from
    leaking their own future (each training row sees only what a live
    scorer would have seen at serving time).

    All features ride ONE user-key window with an (unbounded, -1)
    frame — the strictly-before bound is the frame itself, so there is
    no range self-join and no fan-out; adding a feature adds a column
    to the same pass, not a scan. Values pass through exactly (no
    arithmetic — both engines emit the parquet doubles); counts are
    exact integers."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cols = [F.col("user_id"), F.col("event_id"), F.col("ts"), F.col("event_type")]
    for f in FEATURE_EVENTS:
        feat = F.when(F.col("event_type") == f, F.col("value"))
        cols.append(
            F.last(feat, ignorenulls=True).over(w).alias(f"last_{f}_value")
        )
        cols.append(F.count(feat).over(w).cast("long").alias(f"n_{f}_before"))
    carried = ev.select(*cols)
    return carried.where(F.col("event_type") == CONV_EVENT).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        *[
            c
            for f in FEATURE_EVENTS
            for c in (f"last_{f}_value", f"n_{f}_before")
        ],
    )


QUERIES = {
    "q_funnel": q_funnel,
    "q_abandoned_carts": q_abandoned_carts,
    "q_retention_cohorts": q_retention_cohorts,
    "q_active_users": q_active_users,
    "q_event_transitions": q_event_transitions,
    "q_event_ngrams": q_event_ngrams,
    "q_rfm_segments": q_rfm_segments,
    "q_first_touch": q_first_touch,
    "q_new_vs_returning": q_new_vs_returning,
    "q_lorenz_gini": q_lorenz_gini,
    "q_purchase_intervals": q_purchase_intervals,
    "q_scd2": q_scd2,
    "q_feature_snapshot": q_feature_snapshot,
}

_S1, _S2, _S3 = FUNNEL_STAGES

ORACLES = {
    "q_abandoned_carts": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, event_type,
                   epoch_us(ts) AS us,
                   min(CASE WHEN event_type = '{CONV_EVENT}'
                            THEN epoch_us(ts) END) OVER w AS np_us
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
        )
        SELECT user_id, event_id AS click_id, ts AS click_ts,
               round((np_us - us) / 1000000.0, 6) AS next_purchase_gap_s
        FROM flagged
        WHERE event_type = '{TOUCH_EVENT}'
          AND (np_us IS NULL
               OR np_us > us + CAST({ABANDON_MIN * 60_000_000} AS BIGINT))
    """,
    "q_purchase_intervals": f"""
        WITH g AS (
            SELECT user_id,
                   CAST(date_diff('day', CAST(lag(ts) OVER w AS DATE),
                                  CAST(ts AS DATE)) AS INTEGER)
                       AS gap_days
            FROM events WHERE event_type = '{RFM_EVENT}'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, count(*) AS n_gaps,
               min(gap_days) AS min_gap,
               round(quantile_cont(gap_days, 0.5), 6) AS median_gap,
               max(gap_days) AS max_gap
        FROM g WHERE gap_days IS NOT NULL
        GROUP BY user_id
    """,
    "q_first_touch": f"""
        WITH carried AS (
            SELECT user_id, event_id, ts, event_type,
                   last_value(CASE WHEN event_type = '{TOUCH_EVENT}'
                                   THEN ts END IGNORE NULLS) OVER w
                       AS touch_ts,
                   last_value(CASE WHEN event_type = '{TOUCH_EVENT}'
                                   THEN event_id END IGNORE NULLS) OVER w
                       AS touch_id
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
        ),
        conv AS (
            SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                   touch_id, touch_ts,
                   epoch_us(ts) - epoch_us(touch_ts) AS lag_us,
                   touch_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(touch_ts)
                       <= {TOUCH_WINDOW_DAYS} * 86400000000 AS ok
            FROM carried WHERE event_type = '{CONV_EVENT}'
        )
        SELECT user_id, purchase_id, purchase_ts,
               CASE WHEN ok THEN touch_id END AS touch_id,
               CASE WHEN ok THEN touch_ts END AS touch_ts,
               CASE WHEN ok THEN round(lag_us / 1000000.0, 6) END AS lag_s
        FROM conv
    """,
    "q_new_vs_returning": """
        WITH active AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ),
        firsts AS (
            SELECT user_id, min(day) AS day FROM active GROUP BY user_id
        ),
        npd AS (
            SELECT day, count(*) AS new_users FROM firsts GROUP BY day
        ),
        apd AS (
            SELECT day, count(*) AS active_users FROM active GROUP BY day
        )
        SELECT a.day, a.active_users,
               COALESCE(n.new_users, 0) AS new_users,
               a.active_users - COALESCE(n.new_users, 0) AS returning_users,
               round(COALESCE(n.new_users, 0)
                     / CAST(a.active_users AS DOUBLE), 6) AS new_share
        FROM apd a LEFT JOIN npd n ON a.day = n.day
    """,
    "q_lorenz_gini": f"""
        WITH pu AS (
            SELECT user_id, count(*) AS c FROM events GROUP BY user_id
        ),
        t AS (
            SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS total_events
            FROM pu
        ),
        r AS (
            SELECT c, user_id,
                   row_number() OVER (ORDER BY c DESC, user_id) AS r,
                   CAST(sum(c) OVER (ORDER BY c DESC, user_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_c
            FROM pu
        ),
        d AS (
            SELECT CAST(ceil(r.r * {GINI_DECILES} / CAST(t.n AS DOUBLE))
                        AS INTEGER) AS decile,
                   max(cum_c) AS cum_events,
                   CAST(max(r.r) AS BIGINT) AS cum_users,
                   max(t.n) AS n, max(t.total_events) AS total_events,
                   CAST(sum((t.n - r.r + 1) * r.c) AS BIGINT) AS part_gnum
            FROM r, t GROUP BY 1
        )
        SELECT decile, cum_users, cum_events,
               round(cum_events / CAST(total_events AS DOUBLE), 6)
                   AS cum_share,
               round(2.0 * CAST(sum(part_gnum) OVER () AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(total_events AS DOUBLE))
                     - (n + 1) / CAST(n AS DOUBLE), 6) AS gini
        FROM d
    """,
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
    "q_event_ngrams": f"""
        WITH tri AS (
            SELECT user_id,
                   event_type AS e1,
                   lead(event_type, 1) OVER win AS e2,
                   lead(event_type, 2) OVER win AS e3
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        counts AS (
            SELECT e1, e2, e3,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                       ORDER BY n DESC, e1, e2, e3) AS INT) AS rank
            FROM counts
        )
        SELECT rank, e1, e2, e3, n, n_users
        FROM ranked WHERE rank <= {EVENT_NGRAM_TOPK}
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
    "q_scd2": """
        WITH changes AS (
            SELECT user_id, event_id, ts, event_type AS state,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                       AS prev_state
            FROM events
        ),
        kept AS (
            SELECT * FROM changes
            WHERE prev_state IS NULL OR state <> prev_state
        )
        SELECT user_id, state, ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               CAST(row_number() OVER w AS INT) AS version,
               CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
                   AS is_current
        FROM kept
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q_feature_snapshot": f"""
        WITH carried AS (
            SELECT user_id, event_id, ts, event_type,
                   {", ".join(
                       f"last_value(CASE WHEN event_type = '{f}' THEN value END"
                       f" IGNORE NULLS) OVER w AS last_{f}_value, "
                       f"count(CASE WHEN event_type = '{f}' THEN value END)"
                       f" OVER w AS n_{f}_before"
                       for f in FEATURE_EVENTS
                   )}
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               {", ".join(
                   f"last_{f}_value, n_{f}_before" for f in FEATURE_EVENTS
               )}
        FROM carried WHERE event_type = '{CONV_EVENT}'
    """,
}
