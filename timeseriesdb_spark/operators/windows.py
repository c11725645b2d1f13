"""Window functions & time-series transforms (SQL-expressible subset).

Reference surface (SURVEY.md §2.4-2.5): the Influx `max_groupby`
tumbling ROW-COUNT windowed max (window = 240·7 rows, range [500w,600w);
benchmark/influx_bench/mod.rs:11-191, kernels gorilla.rs:363,
buff_simd.rs:2863), PAA chunked means (segment.rs:516-555), RRD
every-k-th sampling (compress/rrd_sample.rs:20-60), and last-N
(SegmentIter::get_last_n, segment.rs:268-271).

The reference windows by ROW POSITION within a signal (data arrives
time-ordered; segments are count-based — lib.rs:337). We reconstruct
the position deterministically as row_number() over (ts, event_id)
per signal (FIXTURES.md determinism note), then bucket by
floor(pos/window). Also provided: the time-based tumbling variant
(q_window_max_time) — the idiomatic Spark form that at 100 TB aligns
with (day) partition pruning so each window's state stays within one
time partition.

Scale note: every window below partitions by signal_id — state is
per-signal and the single shuffle is on the natural key. No global
ordering is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

WINDOW_ROWS = 16   # scaled-down influx window (ref 1680 rows at full size)
PAA_CHUNK = 8      # PAA chunk size (ref sweeps 4-64)
RRD_K = 7          # keep every k-th row
LAST_N = 5         # last-N per signal
SAX_CHUNK = 8      # SAX PAA frame width (rows)
SAX_BP = 0.6745    # N(0,1) quartile breakpoint → 4-symbol alphabet


def _with_pos(ev: DataFrame) -> DataFrame:
    """Global per-signal row position via a two-level (signal, day)
    carry — NOT a single `row_number() OVER (PARTITION BY user_id)`,
    which would sort a hot signal's ENTIRE history in one task at
    100 TB (same scale contract as q_running_sum, windows.py:355).

    Level 1: row_number within (user_id, day-of-ts) — per-task input
    is one signal-DAY. Level 2: exclusive prefix sum of per-(signal,
    day) row counts — a window over the aggregate-sized counts frame
    (signals × days rows, orders of magnitude below the fact).
    pos = local position + prior-days offset. Buckets order by the
    same ts the rows do (bkt = to_date(ts)), so positions are
    bit-identical to the naive single-window form (pinned by
    tests/test_plans.py::test_with_pos_bucketed_carry)."""
    evb = ev.withColumn("_pbkt", F.to_date("ts"))
    wl = Window.partitionBy("user_id", "_pbkt").orderBy("ts", "event_id")
    local = evb.withColumn("_lpos", F.row_number().over(wl) - F.lit(1))
    wc = (
        Window.partitionBy("user_id")
        .orderBy("_pbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        evb.groupBy("user_id", "_pbkt")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "user_id",
            "_pbkt",
            F.coalesce(F.sum("_cnt").over(wc), F.lit(0)).alias("_off"),
        )
    )
    return (
        local.join(offs, ["user_id", "_pbkt"])
        .withColumn("pos", F.col("_lpos") + F.col("_off"))
        .drop("_pbkt", "_lpos", "_off")
    )


def q_window_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influx max_groupby: per-signal tumbling row-count windows, max
    per window (influx_bench/mod.rs:33-38)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        _with_pos(ev)
        .groupBy(
            "user_id",
            F.floor(F.col("pos") / F.lit(WINDOW_ROWS)).alias("win"),
        )
        .agg(F.max("value").alias("win_max"))
    )


def q_window_max_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based tumbling windowed max — the idiomatic Spark twin of
    q_window_max (window(ts, '1 day') per signal). Emits the window
    start as a column for a stable schema."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "1 day").alias("w"))
        .agg(F.max("value").alias("win_max"))
        .select("user_id", F.col("w.start").alias("win_start"), "win_max")
    )


def q_paa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAA: mean of each fixed-size chunk per signal
    (paa_compress, segment.rs:516-555). Chunk means via the same
    row-position bucketing; decimal mean = sum/count computed exactly
    then rounded once."""
    ev = load_table(spark, sf_dir, "events")
    return (
        _with_pos(ev)
        .groupBy(
            "user_id",
            F.floor(F.col("pos") / F.lit(PAA_CHUNK)).alias("chunk"),
        )
        .agg(F.round(F.avg("value"), 6).alias("chunk_avg"))
    )


def q_paa_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-compression error measurement: per-signal mean-absolute
    and max reconstruction error of the PAA tier — the reference's
    compare_vectors / error_rate round-trip check (segment.rs:882-906)
    promoted to an engine query (the lossyML measurement loop asks
    exactly this before recoding a segment to a lossier level).

    PURE INTEGER error accumulation (no per-row round — mae landed on
    exact decimal ties at sf0.1 and Spark/DuckDB half-rounding split):
    the row's error is |n·vu − Σvu| / (100n) with vu the exact cents
    value, so scaling by lcm(1..8)·100 = 84000 makes every error an
    exact bigint (n | 840 for any chunk size ≤ 8). The signal sums a
    bigint; mae/max are single divisions of exact integers — IEEE-
    identical, nothing rounded. Both windows and the final agg share
    the one signal-key exchange (hash(user_id) also clusters
    (user_id, chunk))."""
    ev = load_table(spark, sf_dir, "events")
    chunk = F.floor(F.col("pos") / F.lit(PAA_CHUNK))
    wc = Window.partitionBy("user_id", chunk)
    vu = F.round(F.col("value") * 100).cast("long")
    n_c = F.count("*").over(wc)
    eu = F.abs(n_c * vu - F.sum(vu).over(wc))  # exact: cents × chunk size
    se = F.expr("eu * 840 div n_c")            # exact: n_c divides 840
    err_d = F.col("eu").cast("double") / (
        F.lit(100.0) * F.col("n_c").cast("double")
    )
    return (
        _with_pos(ev)
        .select("user_id", eu.alias("eu"), n_c.alias("n_c"))
        .select("user_id", se.alias("se"), err_d.alias("err_d"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum("se").cast("double")
                / (F.lit(84000.0) * F.count("*").cast("double"))
            ).alias("mae"),
            F.max("err_d").alias("max_err"),
        )
    )


def q_rrd_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction error of the RRD tier (keep every k-th row,
    reconstruct by carry-forward) — q_paa_error's sibling for the
    second lossy aging level (rrd_sample.rs:20-60; the recoding
    daemon's accuracy question for this tier).

    The anchor of row at pos p is the value at pos p − (p mod k):
    chunk boundaries (chunk = pos div k) align exactly with anchor
    positions, so the anchor is the min-pos row of the row's own
    (signal, chunk) — a WHOLE-partition window of ≤ k rows, never a
    per-signal history sort. Errors are exact bigint cent deltas
    |vu − vu_anchor|; per-signal MAE/max are single divisions of
    exact integers, nothing rounded."""
    ev = load_table(spark, sf_dir, "events")
    wc = Window.partitionBy("user_id", F.floor(F.col("pos") / F.lit(RRD_K)))
    vu = F.round(F.col("value") * 100).cast("long")
    anchor = F.min_by("vu", "pos").over(wc)
    return (
        _with_pos(ev)
        .select("user_id", vu.alias("vu"), F.col("pos").alias("pos"))
        .select("user_id", F.abs(F.col("vu") - anchor).alias("eu"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum("eu").cast("double")
                / (F.lit(100.0) * F.count("*").cast("double"))
            ).alias("mae"),
            (F.max("eu").cast("double") / F.lit(100.0)).alias("max_err"),
        )
    )


M4_WIDTH = 32  # rows per M4 pixel-bucket


def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling: per (signal, row-bucket) keep min, max, first
    and last — the error-free line-visualization aggregation from the
    M4 literature (each pixel column needs exactly those 4 values),
    and the natural companion of the reference's lossy aging tiers
    (PAA keeps the mean — segment.rs:516; RRD every-k-th —
    rrd_sample.rs:20; M4 keeps the envelope). first/last resolve by
    the deterministic row position (min_by/max_by on pos), so the
    result is engine-exact with no timestamp tie ambiguity. One
    signal-key shuffle: the position window and the bucket agg share
    it."""
    ev = load_table(spark, sf_dir, "events")
    return (
        _with_pos(ev)
        .groupBy(
            "user_id",
            F.floor(F.col("pos") / F.lit(M4_WIDTH)).alias("bucket"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", "pos").alias("v_first"),
            F.max_by("value", "pos").alias("v_last"),
        )
    )


def q_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization per signal: z-normalize, PAA into SAX_CHUNK-row
    frames, map each frame mean to one of 4 symbols at the N(0,1)
    quartile breakpoints (±0.6745, 0), and assemble the per-signal SAX
    word — the symbolic index the reference's PAA + 1-NN pair
    (segment.rs:516-555, knn/mod.rs:204-242) feeds in the SAX/iSAX
    literature; the word is what a similarity index stores instead of
    raw values.

    Exactness: mean/std come from decimal component sums (the q_zscore
    discipline) and frame means from decimal sum / count — every
    comparison against mu + bp·sd runs on bit-identical doubles in
    both engines, so symbol assignment cannot flip. Shape: one
    signal-key shuffle (position window + frame agg reuse it), stats
    broadcast back, final per-signal word agg on the same key. At
    100 TB the word would assemble per (signal, day) so no single
    group grows unboundedly."""
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.sum(c.cast("decimal(38,6)")).cast("double")  # noqa: E731
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        dec(F.col("value")).alias("sx"),
        dec(F.col("value") * F.col("value")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    var = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n * n)
    stats = stats.where(var > 0).select(
        "user_id",
        (F.col("sx") / n).alias("_mu"),
        F.sqrt(var).alias("_sd"),
    )
    frames = (
        _with_pos(ev)
        .groupBy(
            "user_id",
            F.floor(F.col("pos") / F.lit(SAX_CHUNK)).alias("chunk"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("*").cast("double")
            ).alias("m")
        )
    )
    sym = (
        frames.join(F.broadcast(stats), "user_id")
        .select(
            "user_id",
            "chunk",
            F.when(F.col("m") < F.col("_mu") - F.lit(SAX_BP) * F.col("_sd"), "a")
            .when(F.col("m") < F.col("_mu"), "b")
            .when(F.col("m") < F.col("_mu") + F.lit(SAX_BP) * F.col("_sd"), "c")
            .otherwise("d")
            .alias("sym"),
        )
    )
    return sym.groupBy("user_id").agg(
        F.count("*").alias("n_chunks"),
        F.expr(
            "concat_ws('', transform(array_sort(collect_list(struct(chunk, sym))),"
            " x -> x.sym))"
        ).alias("sax_word"),
    )


def q_rrd_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRD-style aging: keep every k-th row per signal
    (compress/rrd_sample.rs:20-60)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        _with_pos(ev)
        .filter(F.col("pos") % RRD_K == 0)
        .select("user_id", "event_id", "ts", "value")
    )


def q_last_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last N rows per signal (get_last_n, segment.rs:268-271).

    Two-level: the global last-N must be a subset of the per-(signal,
    day) last-N, so level 1 keeps ≤ N rows per signal-DAY (bounded
    task input) and level 2 ranks the reduced frame (≤ N × days per
    signal — aggregate-sized) — never a full-signal history sort."""
    ev = load_table(spark, sf_dir, "events")
    wd = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    cand = (
        ev.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= LAST_N)
        .drop("rn")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LAST_N)
        .select("user_id", "event_id", "ts", "value")
    )


SESSION_GAP_MIN = 30  # minutes of inactivity that closes a session


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session ends after 30 idle minutes.
    session_id = running count of gap-breaks (lag + cumulative sum —
    two windows over the same (user, ts) order, ONE shuffle total).
    Emits per-session duration and event count — the telemetry/user-
    journey operator every events pipeline needs; the reference's
    per-signal ordering machinery (segment chains) is exactly what
    makes it expressible."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_break = (
        F.when(
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long"), 1, 0).over(w)
            > SESSION_GAP_MIN * 60,
            1,
        ).otherwise(0)
    )
    with_sess = ev.withColumn(
        "session_id",
        F.sum(gap_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_sec"
        ),
    )


MAVG_ROWS = 8  # trailing window width (rows)


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing moving average per signal (frame-spec window: ROWS
    BETWEEN k PRECEDING AND CURRENT ROW) — the smoothing operator the
    reference's PAA approximates with chunk means; this is the exact
    sliding form. One shuffle on the signal key.

    Scale note: a bounded k-row frame streams over the sorted
    partition with spill-backed sort, so memory is safe at any signal
    size; the per-signal sort is one task. If a single signal's
    history ever dominates wall-clock, the q_running_sum two-level
    (signal, day-bucket) treatment applies here too with a k-row
    overlap carried across bucket edges — same results, per-task sort
    bounded by one signal-day."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MAVG_ROWS - 1), Window.currentRow)
    )
    # decimal sum / exact count, divided as doubles: sliding-window
    # float accumulation differs between engines (subtract-on-slide),
    # so a float avg would occasionally flip the 6th decimal
    msum = F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
    mcnt = F.count("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.round(msum / mcnt, 6).alias("mavg"),
    )


RQ_ROWS = 25  # trailing quantile frame width (rows)


def q_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-window quantiles per signal: median and p90 over
    the last RQ_ROWS samples — the robust sliding statistics a
    monitoring store serves next to q_moving_avg (a rolling median
    rejects the spikes a mean chases; sliding p90 is the
    latency-SLO staple). Extends the reference's sliding surface
    (§2.5 frame-spec windows) with order statistics.

    Engine-exactness by SELECTION, not interpolation: rank
    ceil(q·n) of the sorted frame (type-1 quantile), so the output
    is always an existing sample and no FP interpolation formula can
    differ between engines — the discipline that makes this
    oracle-checkable where a percentile_cont would hash-drift.

    Scale: JVM-only (collect_list over the bounded frame +
    sort_array + element_at; w ≤ 25 so per-row cost is w·log w and
    frame memory is constant); one shuffle on the signal key. For a
    hot signal the q_running_sum two-level (signal, day) treatment
    applies with a w-row overlap carried across bucket edges."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(RQ_ROWS - 1), Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    med_rank = F.floor((n + F.lit(1)) / F.lit(2)).cast("int")
    p90_rank = F.floor((F.lit(9) * n + F.lit(9)) / F.lit(10)).cast("int")
    return ev.select(
        "user_id",
        "event_id",
        F.element_at(arr, med_rank).alias("med"),
        F.element_at(arr, p90_rank).alias("p90"),
        n.cast("bigint").alias("n_frame"),
    )


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-signal sum, decimal-routed so every prefix is
    engine-exact — the integral/energy curve of a signal.

    Two-level (signal, day-bucket) carry instead of a single
    unbounded window partitioned by signal alone: a per-signal window
    sorts a signal's ENTIRE history in one task (the scale-killer for
    a hot signal at 100 TB). Here the fact window partitions on
    (user_id, day) — per-task work is one signal-DAY — and the
    cross-bucket prefix ("carry") is a window over the per-(signal,
    day) totals frame, whose row count is signals × days, orders of
    magnitude below the fact. running_sum = within-day prefix +
    carry of prior days; decimal addition is associative, so the
    result is bit-identical to the single-window form (pinned by
    tests/test_plans.py::test_running_sum_bucketed_carry)."""
    ev = load_table(spark, sf_dir, "events")
    dec0 = F.lit(0).cast("decimal(38,6)")
    evb = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.to_date("ts").alias("bkt"),
        F.col("value").cast("decimal(38,6)").alias("v"),
    )
    wb = (
        Window.partitionBy("user_id", "bkt")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = evb.withColumn("wsum", F.sum("v").over(wb))
    wc = (
        Window.partitionBy("user_id")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        evb.groupBy("user_id", "bkt")
        .agg(F.sum("v").alias("btot"))
        .select("user_id", "bkt", F.sum("btot").over(wc).alias("carry"))
    )
    return within.join(carry, ["user_id", "bkt"]).select(
        "user_id",
        "event_id",
        (F.col("wsum") + F.coalesce(F.col("carry"), dec0))
        .cast("double")
        .alias("running_sum"),
    )


def q_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete derivative per signal (the PromQL-style rate):
    Δvalue/Δt over consecutive samples. First row per signal is
    excluded (no predecessor). Rounded — the division is deterministic
    but guards the rounding grid."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dv = F.col("value") - F.lag("value", 1).over(w)
    dt = (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1).over(w)) / F.lit(1_000_000.0)
    # + 0.0 folds IEEE -0.0 to +0.0 (DuckDB rounds tiny negatives to
    # -0.0, Spark to +0.0 — numerically equal, repr-hash different)
    return (
        ev.select(
            "user_id",
            "event_id",
            (F.round(dv / dt, 6) + F.lit(0.0)).alias("rate_per_sec"),
        )
        .where(F.col("rate_per_sec").isNotNull())
    )


GAP_SLA_S = 3600  # report gaps longer than this many seconds


def q_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal ingest-health report: event count, max inter-arrival
    gap, and how many gaps exceeded the SLA — the data-quality monitor
    a TSDB runs before trusting downstream rollups (a silent feed
    outage shows up here first). All arithmetic is integer
    microseconds (exact in any engine); one window pass + one grouped
    agg."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us, 1).over(w)
    per_row = ev.select("user_id", gap.alias("gap_us"))
    return per_row.groupBy("user_id").agg(
        (F.count("*")).alias("n_events"),
        (F.max("gap_us").cast("double") / F.lit(1_000_000.0)).alias(
            "max_gap_s"
        ),
        F.sum(
            F.when(F.col("gap_us") > GAP_SLA_S * 1_000_000, 1).otherwise(0)
        ).alias("n_gaps_over_sla"),
    )


def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal hour-of-day seasonal profile (24 buckets) — the
    diurnal-pattern query behind seasonality-aware forecasting and
    anomaly baselines ("is this value high FOR 3am?"). One grouped
    scan; the bucket mean uses the integer-exact half-up arithmetic
    so the profile hashes identically in any engine."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "user_id", F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(
        F.count("*").alias("n"),
        (F.sum(F.col("value").cast("decimal(38,6)")) * F.lit(1_000_000))
        .cast("long")
        .alias("_u"),
    )
    signed_units = F.expr(
        "CASE WHEN _u < 0 THEN -((2 * abs(_u) + n) div (2 * n)) "
        "ELSE (2 * abs(_u) + n) div (2 * n) END"
    )
    return agg.select(
        "user_id",
        "hour_of_day",
        "n",
        (signed_units.cast("double") / F.lit(1_000_000.0)).alias("mean_value"),
    )


def q_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal day-of-week seasonal profile (7 buckets) — the
    weekly-cycle companion to q_seasonal_profile's diurnal 24; same
    integer-exact half-up bucket means. dayofweek is emitted in the
    ISO convention (1=Monday) so the bucket ids are calendar-stable."""
    ev = load_table(spark, sf_dir, "events")
    dow = F.expr("weekday(ts) + 1").cast("bigint")
    agg = ev.groupBy("user_id", dow.alias("iso_dow")).agg(
        F.count("*").alias("n"),
        (F.sum(F.col("value").cast("decimal(38,6)")) * F.lit(1_000_000))
        .cast("long")
        .alias("_u"),
    )
    signed_units = F.expr(
        "CASE WHEN _u < 0 THEN -((2 * abs(_u) + n) div (2 * n)) "
        "ELSE (2 * abs(_u) + n) div (2 * n) END"
    )
    return agg.select(
        "user_id",
        "iso_dow",
        "n",
        (signed_units.cast("double") / F.lit(1_000_000.0)).alias(
            "mean_value"
        ),
    )


def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal z-score standardization — the feature-prep transform
    before any distance-based analytics (kNN/kmeans drift scoring all
    assume comparable scales). Mean and variance come from decimal
    component sums (n·Σx² − (Σx)², the q_signal_corr discipline), the
    z itself is one rounded double op per row via a broadcast join of
    the per-signal stats — no second scan, no window."""
    ev = load_table(spark, sf_dir, "events")
    dec = lambda c: F.sum(c.cast("decimal(38,6)")).cast("double")  # noqa: E731
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        dec(F.col("value")).alias("sx"),
        dec(F.col("value") * F.col("value")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    var = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n * n)
    stats = stats.where(var > 0).select(
        "user_id",
        (F.col("sx") / n).alias("_mu"),
        F.sqrt(var).alias("_sd"),
    )
    z = F.round((F.col("value") - F.col("_mu")) / F.col("_sd"), 6) + F.lit(0.0)
    return (
        ev.join(F.broadcast(stats), "user_id")
        .select("user_id", "event_id", z.alias("zscore"))
    )


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point candidate per signal: the running sum of
    (value − signal mean) peaks in magnitude where the level shifts —
    the classic drift detector, here fully declarative. Exactness
    chain: the mean is integer-exact half-up (engine round(double)
    disagrees at boundaries), each residual rounds to decimal once,
    and the cumulative sum is decimal (associative) over the
    deterministic (ts, event_id) order — so the argmax row is the
    same row in any engine at any parallelism.

    Scale shape (the q_running_sum discipline): the cumulative sum
    uses the two-level (signal, day-bucket) carry — per-task window
    input is one signal-DAY, never a signal's whole history — and
    the peak row is picked by an associative max-over-struct
    aggregate (map-side combinable) instead of a rank window that
    would re-sort the full signal in one task. Tie-break matches the
    original rank: |cusum| desc, then earliest ts, then earliest
    event_id, via negated keys inside the struct."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("_n"),
        (F.sum(F.col("value").cast("decimal(38,6)")) * F.lit(1_000_000))
        .cast("long")
        .alias("_u"),
    )
    signed_units = F.expr(
        "CASE WHEN _u < 0 THEN -((2 * abs(_u) + _n) div (2 * _n)) "
        "ELSE (2 * abs(_u) + _n) div (2 * _n) END"
    )
    means = stats.select(
        "user_id",
        (signed_units.cast("double") / F.lit(1_000_000.0)).alias("_m"),
    )
    dec0 = F.lit(0).cast("decimal(38,6)")
    evb = ev.join(F.broadcast(means), "user_id").select(
        "user_id",
        "event_id",
        "ts",
        F.to_date("ts").alias("bkt"),
        (F.col("value") - F.col("_m")).cast("decimal(38,6)").alias("r"),
    )
    wb = (
        Window.partitionBy("user_id", "bkt")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = evb.withColumn("wsum", F.sum("r").over(wb))
    wc = (
        Window.partitionBy("user_id")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        evb.groupBy("user_id", "bkt")
        .agg(F.sum("r").alias("btot"))
        .select("user_id", "bkt", F.sum("btot").over(wc).alias("carry"))
    )
    cum = within.join(carry, ["user_id", "bkt"]).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("wsum") + F.coalesce(F.col("carry"), dec0)).alias("_c"),
    )
    pick = F.max(
        F.struct(
            F.abs(F.col("_c")).alias("a"),
            (-F.unix_micros(F.col("ts"))).alias("nts"),
            (-F.col("event_id")).alias("nid"),
            F.col("ts").alias("ts"),
            F.col("_c").alias("c"),
        )
    ).alias("p")
    return (
        cum.groupBy("user_id")
        .agg(pick)
        .select(
            "user_id",
            F.col("p.ts").alias("change_ts"),
            F.col("p.c").cast("double").alias("cusum"),
        )
    )


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per signal (median + p90).
    Spark `percentile` and DuckDB `quantile_cont` implement the same
    type-7 interpolation; round(6) guards the last float op. At 100 TB
    switch to approx_percentile (t-digest) — exact here because the
    oracle is exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each signal to a regular hourly grid with
    last-observation-carried-forward — the gap-filling/regularization
    step the reference's recoding daemons approximate with RRD aging.

    Scale shape: the grid is generated per signal from its own
    [min,max] span (sequence+explode — no driver loop), unioned with
    the observations, and LOCF is one `last(ignorenulls)` window —
    the same single-shuffle union-merge as q_asof_join. Grid rows sort
    after a same-instant observation so a sample lands on the grid
    point exactly (inclusive as-of)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("ts"),
    ).withColumn("is_grid", F.lit(1))
    obs = ev.select("user_id", "ts", "event_id", "value").withColumn(
        "is_grid", F.lit(0)
    )
    merged = obs.unionByName(
        grid.withColumn("event_id", F.lit(None).cast("long")).withColumn(
            "value", F.lit(None).cast("double")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(
        "locf", F.last(F.when(F.col("is_grid") == 0, F.col("value")), ignorenulls=True).over(w)
    )
    return (
        filled.filter((F.col("is_grid") == 1) & F.col("locf").isNotNull())
        .select("user_id", F.col("ts").alias("grid_ts"), F.col("locf").alias("value"))
    )


def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation between the
    surrounding observations (the reconstruction PLA implies —
    pla_lttb.rs keeps line endpoints): for each grid point, the
    previous and next samples bracket it and the value is the
    time-weighted blend. Grid points outside a signal's span are
    dropped (no extrapolation).

    Same single-shuffle union-merge as LOCF, run in both directions
    over ONE sorted partition (forward window for prev, backward for
    next) — still exactly one exchange."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
    ).withColumn("is_grid", F.lit(1))
    obs = ev.select("user_id", "ts", "value").withColumn("is_grid", F.lit(0))
    merged = obs.unionByName(grid.withColumn("value", F.lit(None).cast("double")))

    # Both passes are RUNNING (unbounded-preceding) frames: the "next
    # observation" pass runs over DESCENDING order rather than an
    # unbounded-FOLLOWING frame — Spark evaluates following-unbounded
    # frames by rescanning the tail per row (quadratic per partition);
    # two running frames cost two in-partition sorts, no extra shuffle.
    # observations sort before grid rows at equal ts IN BOTH passes
    # (is_grid asc forward, and asc again in the reverse sort) so a
    # same-instant sample is visible to both t0 and t1 — matching the
    # oracle's inclusive ASOF in both directions. Without this, a grid
    # point landing exactly on a signal's LAST observation would find
    # no t1 and be wrongly dropped.
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_obs = F.col("is_grid") == 0
    obs_us = F.when(is_obs, F.unix_micros(F.col("ts")))
    obs_val = F.when(is_obs, F.col("value"))

    filled = (
        merged.withColumn("t0", F.last(obs_us, ignorenulls=True).over(fwd))
        .withColumn("v0", F.last(obs_val, ignorenulls=True).over(fwd))
        .withColumn("t1", F.last(obs_us, ignorenulls=True).over(rev))
        .withColumn("v1", F.last(obs_val, ignorenulls=True).over(rev))
    )
    g_us = F.unix_micros(F.col("ts"))
    frac = (g_us - F.col("t0")) / (F.col("t1") - F.col("t0"))
    interp = F.when(
        F.col("t1") == F.col("t0"), F.col("v0")
    ).otherwise(F.col("v0") + (F.col("v1") - F.col("v0")) * frac)
    return (
        filled.filter(
            (F.col("is_grid") == 1)
            & F.col("v0").isNotNull()
            & F.col("v1").isNotNull()
        )
        .select(
            "user_id",
            F.col("ts").alias("grid_ts"),
            (F.round(interp, 6) + F.lit(0.0)).alias("value"),
        )
    )


MODE_TOP = 1  # per-signal modal value


def q_value_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent scaled value per signal (the majority value the
    reference's sparse codec keys on, split_double.rs:1164): count per
    (signal, scaled value), window rank 1 with value tie-break."""
    from timeseriesdb_spark.functions.codecs import scaled_int

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "user_id", scaled_int(F.col("value")).alias("scaled")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("scaled")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MODE_TOP)
        .select("user_id", F.col("scaled").alias("mode_scaled"), "cnt")
    )


MAD_K = 5.0  # flag |v - median| > K · MAD


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-signal anomaly detection: median absolute deviation.
    Rows where |value − median| > K·MAD — the principled version of
    the reference's outlier workload (outlier/mod.rs: majority value +
    exceptions; MAD generalizes 'exception' beyond exact equality).
    Medians are exact interpolated percentiles; the per-signal stats
    broadcast back onto the scan (one grouped pass + broadcast join,
    no window over the fact table)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "user_id").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad"), F.first("med").alias("med")
    )
    # compare on ROUNDED med/mad: the unrounded interpolated percentile
    # can differ by 1 ulp between engines, which would flip boundary
    # rows in and out of the result; rounded stats are engine-identical
    rmed, rmad = F.round("med", 6), F.round("mad", 6)
    return (
        ev.join(F.broadcast(mad), "user_id")
        .filter(F.abs(F.col("value") - rmed) > F.lit(MAD_K) * rmad)
        .select(
            "user_id",
            "event_id",
            "value",
            rmed.alias("med"),
            rmad.alias("mad"),
        )
    )


TOPK_PER_SIGNAL = 3


def q_topk_per_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k values per signal (grouped top-k — window rank, one
    shuffle; at scale AQE prunes rank>k early per partition)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_PER_SIGNAL)
        .select("user_id", "event_id", "value", "rn")
    )


QUERIES = {
    "q_anomaly_mad": q_anomaly_mad,
    "q_topk_per_signal": q_topk_per_signal,
    "q_resample_locf": q_resample_locf,
    "q_resample_interp": q_resample_interp,
    "q_value_mode": q_value_mode,
    "q_derivative": q_derivative,
    "q_quantiles": q_quantiles,
    "q_cusum_changepoint": q_cusum_changepoint,
    "q_zscore": q_zscore,
    "q_seasonal_profile": q_seasonal_profile,
    "q_dow_profile": q_dow_profile,
    "q_gap_report": q_gap_report,
    "q_moving_avg": q_moving_avg,
    "q_rolling_quantile": q_rolling_quantile,
    "q_running_sum": q_running_sum,
    "q_sessionize": q_sessionize,
    "q_window_max": q_window_max,
    "q_window_max_time": q_window_max_time,
    "q_paa_error": q_paa_error,
    "q_rrd_error": q_rrd_error,
    "q_paa": q_paa,
    "q_sax": q_sax,
    "q_m4_downsample": q_m4_downsample,
    "q_rrd_sample": q_rrd_sample,
    "q_last_n": q_last_n,
}

_POS = """
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) - 1 AS pos
    FROM events
"""

_ANOMALY_SQL = f"""
    WITH med AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY user_id
    ), mad AS (
        SELECT e.user_id, m.med,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (user_id)
        GROUP BY e.user_id, m.med
    )
    SELECT e.user_id, e.event_id, e.value,
           round(m.med, 6) AS med, round(m.mad, 6) AS mad
    FROM events e JOIN mad m USING (user_id)
    WHERE abs(e.value - round(m.med, 6)) > {MAD_K} * round(m.mad, 6)
"""

_GRID_SQL = """
        WITH spans AS (
            SELECT user_id, date_trunc('hour', min(ts)) AS h0,
                   date_trunc('hour', max(ts)) AS h1
            FROM events GROUP BY user_id
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS grid_ts
            FROM spans
        )
"""

ORACLES = {
    "q_paa_error": f"""
        WITH p AS ({_POS}),
        e AS (
            SELECT user_id,
                   abs(count(*) OVER wc
                       * CAST(round(value * 100) AS BIGINT)
                       - CAST(sum(CAST(round(value * 100) AS BIGINT))
                              OVER wc AS BIGINT)) AS eu,
                   count(*) OVER wc AS n_c
            FROM p
            WINDOW wc AS (PARTITION BY user_id, pos // {PAA_CHUNK})
        )
        SELECT user_id, count(*) AS n,
               CAST(sum(eu * 840 // n_c) AS DOUBLE)
                   / (84000.0 * CAST(count(*) AS DOUBLE)) AS mae,
               max(CAST(eu AS DOUBLE) / (100.0 * CAST(n_c AS DOUBLE)))
                   AS max_err
        FROM e GROUP BY user_id
    """,
    "q_rrd_error": f"""
        WITH p AS ({_POS}),
        e AS (
            SELECT user_id,
                   abs(CAST(round(value * 100) AS BIGINT)
                       - last_value(CASE WHEN pos % {RRD_K} = 0
                           THEN CAST(round(value * 100) AS BIGINT)
                         END IGNORE NULLS) OVER w) AS eu
            FROM p
            WINDOW w AS (PARTITION BY user_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
        )
        SELECT user_id, count(*) AS n,
               CAST(sum(eu) AS DOUBLE)
                   / (100.0 * CAST(count(*) AS DOUBLE)) AS mae,
               CAST(max(eu) AS DOUBLE) / 100.0 AS max_err
        FROM e GROUP BY user_id
    """,
    "q_m4_downsample": f"""
        SELECT user_id, pos // {M4_WIDTH} AS bucket,
               count(*) AS n,
               min(value) AS v_min,
               max(value) AS v_max,
               arg_min(value, pos) AS v_first,
               arg_max(value, pos) AS v_last
        FROM ({_POS})
        GROUP BY 1, 2
    """,
    "q_sax": f"""
        WITH stats AS (
            SELECT user_id, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
                       AS sxx
            FROM events GROUP BY user_id
        ),
        ms AS (
            SELECT user_id, sx / n AS mu,
                   sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n)) AS sd
            FROM stats
            WHERE (n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n) > 0
        ),
        pos AS ({_POS}),
        frames AS (
            SELECT user_id, pos // {SAX_CHUNK} AS chunk,
                   CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                       / count(*) AS m
            FROM pos GROUP BY 1, 2
        ),
        sym AS (
            SELECT f.user_id, f.chunk,
                   CASE WHEN m < mu - {SAX_BP} * sd THEN 'a'
                        WHEN m < mu THEN 'b'
                        WHEN m < mu + {SAX_BP} * sd THEN 'c'
                        ELSE 'd' END AS sym
            FROM frames f JOIN ms USING (user_id)
        )
        SELECT user_id, count(*) AS n_chunks,
               string_agg(sym, '' ORDER BY chunk) AS sax_word
        FROM sym GROUP BY user_id
    """,
    "q_anomaly_mad": _ANOMALY_SQL,
    "q_topk_per_signal": f"""
        SELECT user_id, event_id, value, rn FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rn
            FROM events
        ) WHERE rn <= {TOPK_PER_SIGNAL}
    """,
    # two ASOF joins (backward >= for prev, forward <= for next) +
    # time-weighted blend; same-instant samples give frac=0 → exact
    # value in both engines
    "q_resample_interp": _GRID_SQL
    + f"""
        , prev AS (
            SELECT g.user_id, g.grid_ts, e.ts AS t0, e.value AS v0
            FROM grid g
            ASOF JOIN events e
              ON g.user_id = e.user_id AND g.grid_ts >= e.ts
        ), nxt AS (
            SELECT g.user_id, g.grid_ts, e.ts AS t1, e.value AS v1
            FROM grid g
            ASOF JOIN events e
              ON g.user_id = e.user_id AND g.grid_ts <= e.ts
        )
        SELECT p.user_id, p.grid_ts,
               round(CASE WHEN epoch_us(n.t1) = epoch_us(p.t0) THEN p.v0
                     ELSE p.v0 + (n.v1 - p.v0)
                          * (epoch_us(p.grid_ts) - epoch_us(p.t0))
                          / CAST(epoch_us(n.t1) - epoch_us(p.t0) AS DOUBLE)
                     END, 6) + 0.0 AS value
        FROM prev p
        JOIN nxt n ON p.user_id = n.user_id AND p.grid_ts = n.grid_ts
    """,
    "q_value_mode": f"""
        SELECT user_id, scaled AS mode_scaled, cnt FROM (
            SELECT user_id, scaled, cnt,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY cnt DESC, scaled) AS rn
            FROM (
                SELECT user_id,
                       CAST(floor(value * 1000.0) AS BIGINT) AS scaled,
                       count(*) AS cnt
                FROM events GROUP BY 1, 2
            )
        ) WHERE rn <= {MODE_TOP}
    """,
    # DuckDB's ASOF JOIN (inclusive >=) is the declarative twin of the
    # union-merge LOCF; inner form drops grid points before the first
    # observation exactly like the isNotNull filter.
    "q_resample_locf": """
        WITH spans AS (
            SELECT user_id, date_trunc('hour', min(ts)) AS h0,
                   date_trunc('hour', max(ts)) AS h1
            FROM events GROUP BY user_id
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS grid_ts
            FROM spans
        )
        SELECT g.user_id, g.grid_ts, e.value
        FROM grid g
        ASOF JOIN events e ON g.user_id = e.user_id AND g.grid_ts >= e.ts
    """,
    "q_derivative": """
        SELECT user_id, event_id, rate_per_sec FROM (
            SELECT user_id, event_id,
                   round((value - lag(value, 1) OVER w)
                         / ((epoch_us(ts) - lag(epoch_us(ts), 1) OVER w)
                            / 1000000.0), 6) + 0.0 AS rate_per_sec
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ) WHERE rate_per_sec IS NOT NULL
    """,
    "q_gap_report": f"""
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts), 1)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap_us
            FROM events
        )
        SELECT user_id, count(*) AS n_events,
               CAST(max(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s,
               CAST(sum(CASE WHEN gap_us > {GAP_SLA_S * 1_000_000}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps_over_sla
        FROM g GROUP BY user_id
    """,
    "q_seasonal_profile": """
        SELECT user_id, hour_of_day, n,
               CAST(CASE WHEN u < 0 THEN -((2 * abs(u) + n) // (2 * n))
                         ELSE (2 * abs(u) + n) // (2 * n) END
                    AS DOUBLE) / 1000000.0 AS mean_value
        FROM (
            SELECT user_id, CAST(hour(ts) AS BIGINT) AS hour_of_day,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(38,6))) * 1000000
                        AS BIGINT) AS u
            FROM events GROUP BY 1, 2
        )
    """,
    "q_dow_profile": """
        SELECT user_id, iso_dow, n,
               CAST(CASE WHEN u < 0 THEN -((2 * abs(u) + n) // (2 * n))
                         ELSE (2 * abs(u) + n) // (2 * n) END
                    AS DOUBLE) / 1000000.0 AS mean_value
        FROM (
            SELECT user_id, CAST(isodow(ts) AS BIGINT) AS iso_dow,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(38,6))) * 1000000
                        AS BIGINT) AS u
            FROM events GROUP BY 1, 2
        )
    """,
    "q_zscore": """
        WITH stats AS (
            SELECT user_id, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
                       AS sxx
            FROM events GROUP BY user_id
        ),
        ms AS (
            SELECT user_id, sx / n AS mu,
                   sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n)) AS sd
            FROM stats
            WHERE (n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n) > 0
        )
        SELECT e.user_id, e.event_id,
               round((e.value - m.mu) / m.sd, 6) + 0.0 AS zscore
        FROM events e JOIN ms m USING (user_id)
    """,
    "q_cusum_changepoint": """
        WITH stats AS (
            SELECT user_id, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(38,6))) * 1000000
                        AS BIGINT) AS u
            FROM events GROUP BY user_id
        ),
        means AS (
            SELECT user_id,
                   CAST(CASE WHEN u < 0
                             THEN -((2 * abs(u) + n) // (2 * n))
                             ELSE (2 * abs(u) + n) // (2 * n) END
                        AS DOUBLE) / 1000000.0 AS m
            FROM stats
        ),
        c AS (
            SELECT e.user_id, e.ts, e.event_id,
                   sum(CAST(e.value - m.m AS DECIMAL(38,6)))
                       OVER (PARTITION BY e.user_id
                             ORDER BY e.ts, e.event_id
                             ROWS UNBOUNDED PRECEDING) AS cus
            FROM events e JOIN means m USING (user_id)
        )
        SELECT user_id, ts AS change_ts, CAST(cus AS DOUBLE) AS cusum
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY abs(cus) DESC, ts, event_id)
                          AS rn
            FROM c
        ) WHERE rn = 1
    """,
    "q_quantiles": """
        SELECT user_id,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90
        FROM events GROUP BY user_id
    """,
    "q_moving_avg": f"""
        SELECT user_id, event_id,
               round(
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w, 6) AS mavg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {MAVG_ROWS - 1} PRECEDING AND CURRENT ROW)
    """,
    # type-1 (selection) quantiles: both engines sort the frame's
    # doubles and pick rank ceil(q·n) — an existing sample, no
    # interpolation arithmetic to drift.
    "q_rolling_quantile": f"""
        SELECT user_id, event_id,
               l[(n + 1) // 2] AS med,
               l[(9 * n + 9) // 10] AS p90,
               n AS n_frame
        FROM (
            SELECT user_id, event_id,
                   list_sort(list(value) OVER w) AS l,
                   count(*) OVER w AS n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {RQ_ROWS - 1} PRECEDING
                         AND CURRENT ROW)
        )
    """,
    "q_running_sum": """
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_sum
        FROM events
    """,
    # floor(epoch()) matches Spark's timestamp→long truncation;
    # lag default 0 makes every signal's first row open session 1 in
    # both engines.
    "q_sessionize": f"""
        WITH t AS (
            SELECT user_id, event_id, ts,
                   CAST(floor(epoch(ts)) AS BIGINT) AS es
            FROM events
        ), g AS (
            SELECT *, CASE WHEN es - lag(es, 1, 0) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                     > {SESSION_GAP_MIN * 60} THEN 1 ELSE 0 END AS brk
            FROM t
        ), s AS (
            SELECT *, CAST(SUM(brk) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM g
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start,
               CAST(max(es) - min(es) AS BIGINT) AS duration_sec
        FROM s GROUP BY user_id, session_id
    """,
    "q_window_max": f"""
        SELECT user_id, CAST(floor(pos / {WINDOW_ROWS}.0) AS BIGINT) AS win,
               max(value) AS win_max
        FROM ({_POS}) GROUP BY 1, 2
    """,
    "q_window_max_time": """
        SELECT user_id, date_trunc('day', ts) AS win_start, max(value) AS win_max
        FROM events GROUP BY 1, 2
    """,
    "q_paa": f"""
        SELECT user_id, CAST(floor(pos / {PAA_CHUNK}.0) AS BIGINT) AS chunk,
               round(avg(value), 6) AS chunk_avg
        FROM ({_POS}) GROUP BY 1, 2
    """,
    "q_rrd_sample": f"""
        SELECT user_id, event_id, ts, value
        FROM ({_POS}) WHERE pos % {RRD_K} = 0
    """,
    "q_last_n": f"""
        SELECT user_id, event_id, ts, value FROM (
            SELECT user_id, event_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn <= {LAST_N}
    """,
}
