"""Scalar + grouped aggregation operators.

Reference surface: the `query` module's whole-buffer COUNT/MIN/MAX/
SUM/AVG folds (database/src/query.rs:41-173), the per-segment
`AggStats {max,min,sum,count}` maintained at put and merged at query
time (database/src/buffer_pool.rs:757-790, 1467-1469), the
max-with-qualifying-positions kernels (`byte_fixed_max`,
database/src/compress/split_double.rs:4323-4421), and the distinct
estimate (database/src/predict/cr_predictor.rs:35-52).

Spark mapping: plain `agg` — Tungsten's partial/final hash aggregation
IS AggStats-merge, map-side combine included, so a whole-table agg at
100 TB moves one row per partition over the shuffle, not data. The
summary/rollup table (q_summary_*) materializes AggStats explicitly per
(signal, day) so coarse dashboards aggregate ~1e6 rollup rows instead
of rescanning 1e11 raw rows — the same motivation as the reference's
per-segment stats cache.

argmax: two scans (global max → equality filter), the max broadcast
back as a 1-row join; never a sort, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.operators.common import dsum, dsum_sql
from timeseriesdb_spark.tables import load_table


def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT over the signal store (query.rs:41-62)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.count("value").alias("cnt"))


def q_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM over the signal store (query.rs:129-150; byte_sum
    split_double.rs:3060-3146)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(dsum("value", "sum_value"))


def q_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN (query.rs:65-127)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.min("value").alias("min_value"))


def q_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX (query.rs:65-127; byte_fixed_max split_double.rs:4323)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.max("value").alias("max_value"))


def q_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG = SUM/COUNT (query.rs:152-173). round(6) because float avg
    is not bit-deterministic across partitionings."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.round(F.avg("value"), 6).alias("avg_value"))


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal AggStats{count,min,max,sum} (buffer_pool.rs:757-790).
    One shuffle on signal_id; partial agg does the heavy lifting."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("value").alias("cnt"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        dsum("value", "sum_value"),
    )


def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows attaining the global max — the reference's max-with-bitmap
    kernels return qualifying positions, not just the value
    (split_double.rs:4323-4421 counts all qualifying positions).

    Plan: scan→1-row max, broadcast-join back, scan→filter. Two scans
    beat any sort at scale; ties are all retained, matching bitmap
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("value").alias("max_value"))
    return (
        ev.join(F.broadcast(mx), ev.value == mx.max_value)
        .select("event_id", "user_id", "value")
    )


def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-value count (est_dict_cr, cr_predictor.rs:35-52
    sizes dictionaries with a HashSet). At 100 TB prefer
    approx_count_distinct (HLL, no expand shuffle) — exact here because
    the driver's oracle is exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("value").alias("distinct_values"))


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value histogram (plot/data_hist.rs:1-40): fixed-width buckets,
    group-count. Bucket id as BIGINT in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / F.lit(50.0)).cast("bigint").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggStats rollup per (signal, day) — the summary-table builder
    (SURVEY.md §4 item 1). At scale this is a materialized table
    refreshed incrementally; here it is computed inline."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("value").alias("cnt"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("dsum"),
    )


def q_summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (signal, day) AggStats summary table itself."""
    return _rollup(spark, sf_dir).select(
        "user_id",
        "day",
        "cnt",
        "min_value",
        "max_value",
        F.col("dsum").cast("double").alias("sum_value"),
    )


def q_summary_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggStats::merge associativity (buffer_pool.rs:770-790): per-signal
    totals computed by MERGING day-level rollups. The oracle computes the
    same totals DIRECTLY from raw events — hash-equality of the two is
    the merge-correctness property the reference asserts in unit tests."""
    roll = _rollup(spark, sf_dir)
    return roll.groupBy("user_id").agg(
        F.sum("cnt").alias("cnt"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.sum("dsum").cast("double").alias("sum_value"),
    )


def q_top_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 signals by total value: agg then global top-k. Spark's
    TakeOrderedAndProject moves only k rows per partition to the driver
    stage — no full sort at scale. Decimal sum ⇒ deterministic order;
    user_id tie-break."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("dsum")
    )
    return (
        agg.orderBy(F.col("dsum").desc(), F.col("user_id"))
        .limit(10)
        .select("user_id", F.col("dsum").cast("double").alias("sum_value"))
    )


CORR_SIGNALS = 20  # pairwise over the first N signals


def q_signal_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between signal pairs on hour-aligned
    samples — the cross-sensor analytics a TSDB serves. Engine-exact
    by construction: per-(signal,hour) means are rounded first
    (deterministic), then ALL correlation inputs (Σx, Σy, Σxy, Σx²,
    Σy², n) are decimal sums of those rounded values, so the final
    formula runs on bit-identical components in any engine at any
    parallelism — float corr() aggregates are NOT cross-engine
    deterministic, this is.

    Scale: alignment is one grouped pass; the pair join is per-hour
    (equi-join on the bucket), so cost is pairs × buckets, bounded by
    the signal subset — at 1000s of signals you'd prefilter candidate
    pairs (e.g. by rollup-level correlation screening)."""
    ev = load_table(spark, sf_dir, "events")
    aligned = (
        ev.filter(F.col("user_id") < CORR_SIGNALS)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("v")
        )
    )
    a = aligned.select(
        F.col("user_id").alias("sig_a"), "h", F.col("v").alias("va")
    )
    b = aligned.select(
        F.col("user_id").alias("sig_b"), "h", F.col("v").alias("vb")
    )
    dec = lambda c: F.sum(c.cast("decimal(38,6)")).cast("double")  # noqa: E731
    comps = (
        a.join(b, "h")
        .where(F.col("sig_a") < F.col("sig_b"))
        .groupBy("sig_a", "sig_b")
        .agg(
            F.count("*").alias("n"),
            dec(F.col("va")).alias("sx"),
            dec(F.col("vb")).alias("sy"),
            dec(F.col("va") * F.col("vb")).alias("sxy"),
            dec(F.col("va") * F.col("va")).alias("sxx"),
            dec(F.col("vb") * F.col("vb")).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    # filter BEFORE sqrt: float cancellation can push a zero variance
    # slightly negative — Spark's sqrt would yield NaN, DuckDB errors
    return (
        comps.where((vx > 0) & (vy > 0))
        .select(
            "sig_a",
            "sig_b",
            "n",
            (F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 4) + F.lit(0.0)).alias(
                "corr"
            ),
        )
    )


EQUIDEPTH_BINS = 8


def q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram per signal (ntile) — the complement of
    q_histogram's equi-width bins and the shape optimizer statistics
    use (selectivity from depth-balanced boundaries). Deterministic:
    the ntile order includes event_id as tie-break, so both engines
    assign identical bins. One window shuffle; at 100 TB swap exact
    ntile for approx_percentile boundaries — same output contract."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    binned = ev.select(
        "user_id", "value", F.ntile(EQUIDEPTH_BINS).over(w).alias("bin")
    )
    return binned.groupBy("user_id", "bin").agg(
        F.count("*").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


AUTOCORR_LAGS = 3  # report lag-1..3 autocorrelation per signal


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal lag-k autocorrelation (k = 1..AUTOCORR_LAGS) — the
    self-similarity profile behind seasonality detection and the
    FCM/DFCM predictor viability check (a high lag-1 autocorr is
    exactly when last-value prediction compresses well). One window
    pass computes all lags (single sort per signal), stack() unpivots
    to (k, v, v_lag) rows, and the Pearson components follow the
    q_signal_corr decimal discipline — engine-exact at any
    parallelism."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "value",
        *[
            F.lag("value", k).over(w).alias(f"l{k}")
            for k in range(1, AUTOCORR_LAGS + 1)
        ],
    )
    stack_args = ", ".join(
        f"{k}, l{k}" for k in range(1, AUTOCORR_LAGS + 1)
    )
    stacked = lagged.select(
        "user_id",
        "value",
        F.expr(f"stack({AUTOCORR_LAGS}, {stack_args}) AS (k, vk)"),
    ).where(F.col("vk").isNotNull())
    dec = lambda c: F.sum(c.cast("decimal(38,6)")).cast("double")  # noqa: E731
    comps = stacked.groupBy("user_id", "k").agg(
        F.count("*").alias("n"),
        dec(F.col("value")).alias("sx"),
        dec(F.col("vk")).alias("sy"),
        dec(F.col("value") * F.col("vk")).alias("sxy"),
        dec(F.col("value") * F.col("value")).alias("sxx"),
        dec(F.col("vk") * F.col("vk")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        comps.where((vx > 0) & (vy > 0))
        .select(
            "user_id",
            F.col("k").cast("bigint").alias("k"),
            "n",
            (F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 4) + F.lit(0.0)).alias(
                "autocorr"
            ),
        )
    )


CM_DEPTH = 4        # independent hash rows
CM_WIDTH_CHARS = 2  # bucket = 2 hex chars of the shared md5 → width 256
CM_PROBE_KEYS = list(range(10))  # point-query keys (floor(value) items)

# The depth rows slice DISJOINT CM_WIDTH_CHARS regions out of ONE
# 32-hex md5 — bumping either constant past the digest length would
# make substring return short/empty buckets and silently collapse
# depth rows onto each other.
assert CM_DEPTH * CM_WIDTH_CHARS <= 32, "Count-Min lanes exceed md5 digest"


def _cm_key() -> F.Column:
    """Sketched item: floor(value) as its decimal string — identical
    text in Spark and DuckDB for any sign."""
    return F.floor(F.col("value")).cast("bigint").cast("string")


def _cm_bucket(d: int, key: F.Column) -> F.Column:
    """Depth-d bucket = the d-th disjoint CM_WIDTH_CHARS region of ONE
    md5(key) — the MinHash lane discipline: one digest per row feeds
    all CM_DEPTH rows (codegen's subexpression elimination evaluates
    the shared md5 once), 4× less hash work than seeded per-depth
    digests with the same per-row bucket width."""
    return F.substring(F.md5(key), d * CM_WIDTH_CHARS + 1, CM_WIDTH_CHARS)


def _cm_counters(ev: DataFrame) -> DataFrame:
    """Mergeable Count-Min partials: per (signal, day, depth, bucket)
    counts. The fact is NEVER exploded: rows first collapse onto the
    full CM_DEPTH·CM_WIDTH_CHARS digest prefix (cardinality ≤ distinct
    sketched keys per signal-day — orders of magnitude below the row
    count), and only that aggregated frame fans out ×CM_DEPTH into
    per-depth bucket regions before the final re-sum. Same counters
    as the direct per-row explode (grouping is associative), with the
    generator and second aggregation running on key-cardinality rows
    instead of fact-cardinality."""
    key = _cm_key()
    pre = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.substring(F.md5(key), 1, CM_DEPTH * CM_WIDTH_CHARS).alias(
                "pfx"
            ),
        )
        .groupBy("user_id", "day", "pfx")
        .agg(F.count("*").alias("kn"))
    )
    cells = pre.select(
        "user_id",
        "day",
        "kn",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        F.substring(
                            F.col("pfx"),
                            d * CM_WIDTH_CHARS + 1,
                            CM_WIDTH_CHARS,
                        ).alias("bucket"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("cell"),
    )
    return cells.groupBy(
        "user_id", "day", F.col("cell.depth").alias("depth"),
        F.col("cell.bucket").alias("bucket"),
    ).agg(F.sum("kn").alias("partial_n"))


def q_countmin_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency-sketch rollup: per-(signal, day) counter
    partials merged across days per signal — the frequency twin of
    q_summary_merge (min/max/sum), q_histogram_rollup (distribution)
    and q_distinct_hll (cardinality). CM is LINEAR: merged counters ==
    one-pass counters structurally (sum is associative), which the
    oracle proves by computing the direct sketch; any time-range
    frequency question then answers from stored partials, never a raw
    re-scan. Depth rows use seeded md5 regions (the MinHash lane
    discipline), buckets are hex-string cells so both engines agree
    without base conversion. At 100 TB: one scan + one (signal, day,
    depth, bucket) partial agg — counters per signal-day are bounded
    at depth·width = 1024 cells regardless of row count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        _cm_counters(ev)
        .groupBy("user_id", "depth", "bucket")
        .agg(F.sum("partial_n").alias("n"))
    )


def cm_point_estimates(
    spark: SparkSession, merged: DataFrame, keys
) -> DataFrame:
    """Point queries against a merged CM counter frame (`user_id`,
    `depth`, `bucket`, `n`): per probe item, est = min over depth rows
    of its bucket counter. The probe side is a literal frame
    (broadcast, no shuffle). Shared by q_countmin_estimate and the
    engine's streamed-sketch read path (api.frequency_estimate)."""
    import hashlib

    probes = spark.createDataFrame(
        [
            (
                str(k),
                d,
                hashlib.md5(str(k).encode()).hexdigest()[
                    d * CM_WIDTH_CHARS : (d + 1) * CM_WIDTH_CHARS
                ],
            )
            for k in keys
            for d in range(CM_DEPTH)
        ],
        "key string, depth int, bucket string",
    )
    # a depth whose bucket has NO counter row is a zero counter → est 0
    return (
        merged.join(F.broadcast(probes), ["depth", "bucket"])
        .groupBy("user_id", "key")
        .agg(
            F.when(F.count("*") == CM_DEPTH, F.min("n"))
            .otherwise(F.lit(0))
            .alias("est_n")
        )
    )


def q_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point queries against the merged sketch: for each probe item,
    est = min over depth rows of its bucket counter — with the exact
    count joined alongside, witnessing the CM guarantee est ≥ exact
    (collisions only ever inflate). At scale the sketch side reads the
    persisted rollup instead of rebuilding it."""
    ev = load_table(spark, sf_dir, "events")
    merged = (
        _cm_counters(ev)
        .groupBy("user_id", "depth", "bucket")
        .agg(F.sum("partial_n").alias("n"))
    )
    est = cm_point_estimates(spark, merged, CM_PROBE_KEYS)
    exact = (
        ev.select("user_id", _cm_key().alias("key"))
        .where(F.col("key").isin([str(k) for k in CM_PROBE_KEYS]))
        .groupBy("user_id", "key")
        .agg(F.count("*").alias("exact_n"))
    )
    return (
        est.join(exact, ["user_id", "key"], "left")
        .select(
            "user_id",
            "key",
            "est_n",
            F.coalesce("exact_n", F.lit(0)).alias("exact_n"),
        )
    )


HH_K = 16  # per-day counters kept in the heavy-hitter tier
HH_M = 20  # final heavy hitters reported


def _hh_key() -> F.Column:
    """Sketched item: floor(value*10) — one decimal digit of the
    signal value. Multiply-then-floor, never a rounding cast, so both
    engines derive the identical bigint key."""
    return F.floor(F.col("value") * 10).cast("bigint")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic heavy hitters from a bounded daily top-K tier —
    the third mergeable-sketch family next to Count-Min (point
    frequencies) and HLL (cardinality): the tier ENUMERATES candidate
    keys, which neither of those can.

    Tier: per day, the exact per-key counts collapse to the top HH_K
    keys (count DESC, key ASC — total order) plus one residual = the
    largest dropped count. That is the SpaceSaving/Misra-Gries
    guarantee made associative: a key absent from a day's tier
    contributed at most that day's residual, so for any candidate
    key the true range count lies in [lb, ub] where lb = sum of
    counts over days where kept and ub = lb + sum of residuals over
    days where dropped. Completeness: any key with true count >
    sum(residuals) MUST surface in some day's top-K. Every step is
    integer arithmetic with total-order tie-breaks → the whole sketch
    is oracle hash-checked (unlike CM/HLL whose hash mixing is
    engine-specific); exact_n rides along as the in-row witness
    (lb <= exact_n <= ub), which in production you would drop.

    At 100 TB: ONE fact-sized exchange (the (day, key) partial count,
    map-side combinable); the persisted tier is days x (HH_K + 1)
    rows regardless of key cardinality, and any day-range top-k
    question answers from the tier alone — this query IS that read
    path, expressed over the tier it just built. The final ranking
    window is a single-partition sort over candidate keys (bounded by
    days x HH_K), never over fact rows."""
    ev = load_table(spark, sf_dir, "events")
    return hh_from_day_counts(hh_day_counts(ev))


def hh_day_counts(ev: DataFrame) -> DataFrame:
    """The linear partial of the heavy-hitter tier: exact per
    (day, key) counts — the one fact-sized, map-side-combinable
    exchange. Associative under sum-merge, so per-micro-batch partials
    (api.maintain_heavyhitters_stream) merge to exactly the one-pass
    frame."""
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            _hh_key().alias("key"),
        )
        .groupBy("day", "key")
        .agg(F.count("*").alias("cnt"))
    )


def hh_from_day_counts(day_counts: DataFrame) -> DataFrame:
    """Summarize merged (day, key) counts into ranked heavy-hitter
    candidates with [lb, ub] bounds (see q_heavy_hitters).

    SINGLE lineage on purpose: a join-based formulation re-derives
    day_counts in four plan subtrees (four fact scans unless runtime
    exchange reuse happens to fire), so everything here is windows
    over the one frame instead. Because ranking is (cnt DESC, key),
    the largest dropped count per day IS the rank-(K+1) row — the
    per-day residual and the global residual total both read off that
    one row. exact_n attaches as a key-partitioned window on the full
    frame (it must see dropped days too); the per-day and whole-frame
    residual windows run AFTER the rk <= K+1 filter, i.e. over the
    bounded tier (days x (K+1) rows), so the single-partition total
    window is never a scale hazard. The rk filter sits directly above
    the rank window, keeping Spark's WindowGroupLimit pushdown (per-
    partition top-(K+1) before the day shuffle) in play."""
    wk = Window.partitionBy("key")
    wd = Window.partitionBy("day").orderBy(F.col("cnt").desc(), "key")
    ranked = (
        day_counts.withColumn("exact_n", F.sum("cnt").over(wk))
        .withColumn("rk", F.row_number().over(wd))
        .where(F.col("rk") <= HH_K + 1)
    )
    at_k1 = F.when(F.col("rk") == HH_K + 1, F.col("cnt"))
    tier = ranked.withColumn(
        "resid",
        F.coalesce(F.max(at_k1).over(Window.partitionBy("day")), F.lit(0)),
    ).withColumn(
        "total_resid",
        F.coalesce(F.sum(at_k1).over(Window.partitionBy()), F.lit(0)),
    )
    cand = (
        tier.where(F.col("rk") <= HH_K)
        .groupBy("key")
        .agg(
            F.sum("cnt").alias("lb"),
            F.sum("resid").alias("present_resid"),
            F.max("exact_n").alias("exact_n"),
            F.max("total_resid").alias("total_resid"),
        )
    )
    wr = Window.orderBy(F.col("lb").desc(), "key")
    return (
        cand.select(
            "key",
            "lb",
            (
                F.col("lb") + F.col("total_resid") - F.col("present_resid")
            ).alias("ub"),
            "exact_n",
        )
        .withColumn("hh_rank", F.row_number().over(wr))
        .where(F.col("hh_rank") <= HH_M)
        .select("hh_rank", "key", "lb", "ub", "exact_n")
    )


QSK_SCALE = 16  # fixed-grid resolution: buckets per value unit (the
                # quantile answer is exact to 1/QSK_SCALE in value
                # space — size it to the SLO granularity you report)
QSK_PS = [500_000, 900_000, 990_000]  # graded quantiles in millionths


def qsk_bucket() -> F.Column:
    """Sketched grid cell: floor(value·SCALE) — multiply-then-floor,
    never a rounding cast, so both engines derive the identical
    bigint bucket (the _hh_key discipline)."""
    return F.floor(F.col("value") * QSK_SCALE).cast("bigint")


def qsk_day_buckets(ev: DataFrame) -> DataFrame:
    """The linear partial of the quantile tier: per (signal, day,
    bucket) counts — one fact-sized, map-side-combinable exchange,
    associative under sum-merge (per-micro-batch partials merge to
    exactly the one-pass frame, api.maintain_quantile_stream)."""
    return (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            qsk_bucket().alias("bucket"),
        )
        .groupBy("user_id", "day", "bucket")
        .agg(F.count("*").alias("partial_n"))
    )


def quantiles_from_buckets(buckets: DataFrame) -> DataFrame:
    """Finalize merged (user_id, bucket, n) counts into per-(signal,
    quantile) answers: the lower quantile at rank ⌈p·N⌉ — the answer
    bucket is the smallest grid cell whose running count reaches the
    rank target, tested as the integer cross-multiplication
    cum·10⁶ ≥ p_micros·N (never a float division). Bucketing is
    monotone in value, so the answer EQUALS floor(q·SCALE) of the
    true rank-⌈p·N⌉ value q — exact to one grid cell, pinned in
    tests/test_quantile_sketch.py. The cumulative window partitions
    by signal over the BOUNDED bucket frame (≤ range·SCALE cells per
    signal), never over fact rows."""
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("user_id")
    cum = buckets.select(
        "user_id",
        "bucket",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )
    fanned = cum.select(
        "user_id",
        "bucket",
        "cum",
        "total",
        F.explode(F.array(*[F.lit(p) for p in QSK_PS])).alias("p_micros"),
    )
    return (
        fanned.where(
            F.col("cum") * F.lit(1_000_000)
            >= F.col("p_micros") * F.col("total")
        )
        .groupBy("user_id", "p_micros")
        .agg(
            F.min("bucket").alias("q_bucket"),
            F.max("total").alias("n_total"),
        )
    )


def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch — the fourth sketch family next to
    HLL (distinct), Count-Min (point frequency) and the heavy-hitter
    tier (top keys): a fixed-grid integer-bucket partial per (signal,
    day) whose sum-merge across any day range answers p50/p90/p99 with
    a deterministic 1/QSK_SCALE value-space error — the question the
    reference's AggStats-over-intervals tree (stats.rs:7-58) cannot
    answer from min/max. Every step is integer arithmetic (grid cell
    by multiply-then-floor, rank test by cross-multiplication), so
    unlike KLL/t-digest the whole sketch hash-checks cross-engine:
    the oracle computes the DIRECT one-pass sketch while this query
    merges per-day partials — hash-equality IS the merge==direct
    associativity proof (the q_summary_merge pattern).

    At 100 TB: one map-side-combinable (signal, day, bucket) exchange;
    the persisted tier is days × occupied-cells rows per signal
    (bounded by the grid, not the row count), and any day-range
    quantile question answers from the tier alone — never a raw
    re-scan, never a per-signal sort of fact rows."""
    ev = load_table(spark, sf_dir, "events")
    merged = (
        qsk_day_buckets(ev)
        .groupBy("user_id", "bucket")
        .agg(F.sum("partial_n").alias("n"))
    )
    return quantiles_from_buckets(merged)


QUERIES = {
    "q_quantile_rollup": q_quantile_rollup,
    "q_heavy_hitters": q_heavy_hitters,
    "q_signal_corr": q_signal_corr,
    "q_autocorr": q_autocorr,
    "q_equidepth_bins": q_equidepth_bins,
    "q_count": q_count,
    "q_sum": q_sum,
    "q_min": q_min,
    "q_max": q_max,
    "q_avg": q_avg,
    "q_agg_stats": q_agg_stats,
    "q_argmax": q_argmax,
    "q_distinct_count": q_distinct_count,
    "q_histogram": q_histogram,
    "q_summary_rollup": q_summary_rollup,
    "q_summary_merge": q_summary_merge,
    "q_top_signals": q_top_signals,
    "q_countmin_rollup": q_countmin_rollup,
    "q_countmin_estimate": q_countmin_estimate,
}

_CM_KEY_SQL = "CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)"
_CM_CELLS_SQL = " UNION ALL ".join(
    f"SELECT user_id, date_trunc('day', ts) AS day, {d} AS depth, "
    f"substr(md5({_CM_KEY_SQL}), {d * CM_WIDTH_CHARS + 1}, {CM_WIDTH_CHARS}) AS bucket "
    "FROM events"
    for d in range(CM_DEPTH)
)
_CM_MERGED_SQL = f"""
        daily AS (
            SELECT user_id, day, depth, bucket, count(*) AS partial_n
            FROM ({_CM_CELLS_SQL}) GROUP BY 1, 2, 3, 4
        ),
        merged AS (
            SELECT user_id, depth, bucket,
                   CAST(sum(partial_n) AS BIGINT) AS n
            FROM daily GROUP BY 1, 2, 3
        )
"""

_SUM_V = dsum_sql("value", "sum_value")

_DEC = "CAST(SUM(CAST({c} AS DECIMAL(38,6))) AS DOUBLE)"

_AC_UNION = " UNION ALL ".join(
    f"SELECT user_id, {k} AS k, value AS v, l{k} AS vk FROM l "
    f"WHERE l{k} IS NOT NULL"
    for k in range(1, AUTOCORR_LAGS + 1)
)
_AC_LAGS = ", ".join(
    f"lag(value, {k}) OVER win AS l{k}" for k in range(1, AUTOCORR_LAGS + 1)
)

ORACLES = {
    # the DIRECT one-pass sketch: hash-equality against the query's
    # per-day-partial merge IS the merge==direct associativity proof
    "q_quantile_rollup": f"""
        WITH counts AS (
            SELECT user_id,
                   CAST(floor(value * {QSK_SCALE}) AS BIGINT) AS bucket,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT user_id, bucket,
                   sum(n) OVER (PARTITION BY user_id
                                ORDER BY bucket) AS cum,
                   sum(n) OVER (PARTITION BY user_id) AS total
            FROM counts
        )
        SELECT user_id, p_micros,
               CAST(min(bucket) AS BIGINT) AS q_bucket,
               CAST(max(total) AS BIGINT) AS n_total
        FROM cum CROSS JOIN (VALUES {", ".join(f"({p})" for p in QSK_PS)})
             AS t(p_micros)
        WHERE cum * 1000000 >= p_micros * total
        GROUP BY user_id, p_micros
    """,
    "q_heavy_hitters": f"""
        WITH day_counts AS (
            SELECT date_trunc('day', ts) AS day,
                   CAST(floor(value * 10) AS BIGINT) AS key,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT day, key, cnt,
                   row_number() OVER (
                       PARTITION BY day ORDER BY cnt DESC, key) AS rk
            FROM day_counts
        ),
        resid AS (
            SELECT day,
                   coalesce(max(CASE WHEN rk > {HH_K} THEN cnt END), 0)
                       AS resid
            FROM ranked GROUP BY day
        ),
        total AS (
            SELECT CAST(sum(resid) AS BIGINT) AS total_resid FROM resid
        ),
        cand AS (
            SELECT r.key,
                   CAST(sum(r.cnt) AS BIGINT) AS lb,
                   CAST(sum(d.resid) AS BIGINT) AS present_resid
            FROM ranked r JOIN resid d USING (day)
            WHERE r.rk <= {HH_K}
            GROUP BY r.key
        ),
        exact AS (
            SELECT key, CAST(sum(cnt) AS BIGINT) AS exact_n
            FROM day_counts GROUP BY key
        ),
        scored AS (
            SELECT c.key, c.lb,
                   c.lb + t.total_resid - c.present_resid AS ub,
                   x.exact_n,
                   row_number() OVER (ORDER BY c.lb DESC, c.key)
                       AS hh_rank
            FROM cand c CROSS JOIN total t JOIN exact x USING (key)
        )
        SELECT hh_rank, key, lb, ub, exact_n
        FROM scored WHERE hh_rank <= {HH_M}
    """,
    "q_countmin_rollup": f"""
        WITH {_CM_MERGED_SQL}
        SELECT user_id, depth, bucket, n FROM merged
    """,
    "q_countmin_estimate": f"""
        WITH {_CM_MERGED_SQL},
        probes AS (
            SELECT CAST(k AS VARCHAR) AS key, d AS depth,
                   substr(md5(CAST(k AS VARCHAR)),
                          1 + d * {CM_WIDTH_CHARS}, {CM_WIDTH_CHARS})
                       AS bucket
            FROM (VALUES {",".join(f"({k})" for k in CM_PROBE_KEYS)}) kk(k),
                 (VALUES {",".join(f"({d})" for d in range(CM_DEPTH))}) dd(d)
        ),
        est AS (
            SELECT m.user_id, p.key,
                   CAST(CASE WHEN count(*) = {CM_DEPTH}
                             THEN min(m.n) ELSE 0 END AS BIGINT) AS est_n
            FROM merged m
            JOIN probes p ON m.depth = p.depth AND m.bucket = p.bucket
            GROUP BY m.user_id, p.key
        ),
        exact AS (
            SELECT user_id, {_CM_KEY_SQL} AS key, count(*) AS exact_n
            FROM events GROUP BY 1, 2
        )
        SELECT e.user_id, e.key, e.est_n,
               CAST(coalesce(x.exact_n, 0) AS BIGINT) AS exact_n
        FROM est e LEFT JOIN exact x USING (user_id, key)
    """,
    "q_equidepth_bins": f"""
        SELECT user_id, bin, count(*) AS n, min(value) AS lo,
               max(value) AS hi
        FROM (
            SELECT user_id, value,
                   ntile({EQUIDEPTH_BINS})
                       OVER (PARTITION BY user_id
                             ORDER BY value, event_id) AS bin
            FROM events
        ) GROUP BY user_id, bin
    """,
    "q_autocorr": f"""
        WITH l AS (
            SELECT user_id, value, {_AC_LAGS}
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS ({_AC_UNION}),
        comps AS (
            SELECT user_id, CAST(k AS BIGINT) AS k, count(*) AS n,
                   {_DEC.format(c='v')} AS sx,
                   {_DEC.format(c='vk')} AS sy,
                   {_DEC.format(c='v * vk')} AS sxy,
                   {_DEC.format(c='v * v')} AS sxx,
                   {_DEC.format(c='vk * vk')} AS syy
            FROM s GROUP BY user_id, k
        )
        SELECT user_id, k, n,
               round((n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                     4) + 0.0 AS autocorr
        FROM comps
        WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    "q_signal_corr": f"""
        WITH aligned AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   round({_DEC.format(c='value')} / count(value), 6) AS v
            FROM events WHERE user_id < {CORR_SIGNALS}
            GROUP BY user_id, date_trunc('hour', ts)
        ), comps AS (
            SELECT a.user_id AS sig_a, b.user_id AS sig_b,
                   count(*) AS n,
                   {_DEC.format(c='a.v')} AS sx,
                   {_DEC.format(c='b.v')} AS sy,
                   {_DEC.format(c='a.v * b.v')} AS sxy,
                   {_DEC.format(c='a.v * a.v')} AS sxx,
                   {_DEC.format(c='b.v * b.v')} AS syy
            FROM aligned a JOIN aligned b
              ON a.h = b.h AND a.user_id < b.user_id
            GROUP BY a.user_id, b.user_id
        )
        SELECT sig_a, sig_b, n,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 4)
               + 0.0 AS corr
        FROM comps
        WHERE CAST(n AS DOUBLE) * sxx - sx * sx > 0
          AND CAST(n AS DOUBLE) * syy - sy * sy > 0
    """,
    "q_count": "SELECT count(value) AS cnt FROM events",
    "q_sum": f"SELECT {_SUM_V} FROM events",
    "q_min": "SELECT min(value) AS min_value FROM events",
    "q_max": "SELECT max(value) AS max_value FROM events",
    "q_avg": "SELECT round(avg(value), 6) AS avg_value FROM events",
    "q_agg_stats": f"""
        SELECT user_id, count(value) AS cnt, min(value) AS min_value,
               max(value) AS max_value, {_SUM_V}
        FROM events GROUP BY user_id
    """,
    "q_argmax": """
        SELECT event_id, user_id, value FROM events
        WHERE value = (SELECT max(value) FROM events)
    """,
    "q_distinct_count": "SELECT count(DISTINCT value) AS distinct_values FROM events",
    "q_histogram": """
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, count(*) AS cnt
        FROM events GROUP BY 1
    """,
    "q_summary_rollup": f"""
        SELECT user_id, date_trunc('day', ts) AS day, count(value) AS cnt,
               min(value) AS min_value, max(value) AS max_value, {_SUM_V}
        FROM events GROUP BY user_id, date_trunc('day', ts)
    """,
    "q_summary_merge": f"""
        SELECT user_id, count(value) AS cnt, min(value) AS min_value,
               max(value) AS max_value, {_SUM_V}
        FROM events GROUP BY user_id
    """,
    "q_top_signals": """
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY user_id
        ORDER BY SUM(CAST(value AS DECIMAL(38,6))) DESC, user_id
        LIMIT 10
    """,
}
