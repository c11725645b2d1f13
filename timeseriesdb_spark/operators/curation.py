"""Corpus-curation operators — the filter/sample/vocab stages of an
LLM training-data pipeline over `documents`, plus the generic range
(interval) join the reference lacks entirely (SURVEY §2.3: its only
join is a hash semi-join, benchmark/tsbs/mod.rs:29-48).

Scale notes per operator:
- Rule filters / PII scans are pure per-row string arithmetic on one
  narrow scan — no shuffle, whole-stage codegen end to end. At 100 TB
  they run at scan speed, which is why every ratio is built from
  length/replace/regexp primitives that evaluate identically in Spark
  and DuckDB (hash-exact oracles) instead of Python UDFs.
- Repetition profiling shuffles once (by doc_id) and aggregates once;
  group width is one document's trigrams, so executor memory is
  bounded by the longest document, not the corpus.
- The vocabulary builder is the canonical partial-agg showcase: the
  map side collapses each partition to its local term counts before
  the single shuffle, and the global top-k is TakeOrderedAndProject
  (no full sort materializes the vocabulary).
- The interval join avoids the O(probe × intervals) cross product by
  equi-joining on a time bin sized to the interval length: every
  interval overlaps ≤ 2 bins, so the join fans out at most 2×
  before the residual range predicate. The interval side here is
  broadcast (it is dimension-sized); with a large interval side the
  same bin column becomes the shuffle key and the plan stays an
  equi-join — the technique, not the broadcast, is what scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.operators.common import (
    array_ngrams,
    parallelize_small_scan,
)
from timeseriesdb_spark.operators.text import SPLIT_BOUNDS
from timeseriesdb_spark.tables import load_table

# q_dataset_split's hash-range boundaries: train < TRAIN_BOUND,
# test >= TEST_BOUND (the val band between is excluded from both sides
# of the contamination check).
TRAIN_BOUND, TEST_BOUND = SPLIT_BOUNDS

# ---------------------------------------------------------------- helpers


def _n_occurrences(text: Column, marker: str) -> Column:
    """Occurrence count via length arithmetic (engine-exact)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))
    ) / F.lit(len(marker))


# Gopher-style rule thresholds (Rae et al. 2021 §A1.1, adapted to the
# synthetic corpus scale: word-count band shrunk from [50, 100k]).
MIN_WORDS, MAX_WORDS = 10, 100_000
MIN_MEAN_WL, MAX_MEAN_WL = 2.0, 12.0
MAX_SYMBOL_RATIO = 0.1
MIN_STOPWORD_HITS = 1
# marker set for the presence rule; canonical definition lives in
# text.py (curation already imports text, so text cannot import back)
from timeseriesdb_spark.operators.text import STOPWORDS  # noqa: E402,F401


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule flags per document: word-count band,
    mean-word-length band, symbol-to-word ratio cap, stopword
    presence; `keep` is the conjunction. One narrow scan, no shuffle,
    no UDF — at corpus scale this is the cheapest filter stage and
    runs first."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    n_spaces = _n_occurrences(t, " ")
    n_words = n_spaces + F.lit(1.0)
    mean_wl = (F.length(t) - n_spaces) / n_words
    n_symbols = _n_occurrences(t, "#") + _n_occurrences(t, "...")
    symbol_ratio = n_symbols / n_words
    stop_hits = sum(
        (_n_occurrences(padded, f" {w} ") for w in STOPWORDS), start=F.lit(0)
    )
    word_count_ok = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    mean_wl_ok = (mean_wl >= MIN_MEAN_WL) & (mean_wl <= MAX_MEAN_WL)
    symbol_ok = symbol_ratio <= MAX_SYMBOL_RATIO
    stopword_ok = stop_hits >= MIN_STOPWORD_HITS
    keep = word_count_ok & mean_wl_ok & symbol_ok & stopword_ok
    return doc.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        stop_hits.cast("bigint").alias("stopword_hits"),
        word_count_ok.cast("int").alias("word_count_ok"),
        mean_wl_ok.cast("int").alias("mean_wl_ok"),
        symbol_ok.cast("int").alias("symbol_ok"),
        stopword_ok.cast("int").alias("stopword_ok"),
        keep.cast("int").alias("keep"),
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile (the Gopher/CCNet duplicate
    n-gram filter): fraction of word trigrams that are repeats of an
    earlier trigram in the same document. A document's trigram set is
    computed entirely inside the row (zip_with/array_distinct over the
    split array) — no explode, no shuffle, whole-stage
    codegen end to end; at 100 TB this runs at scan speed like the
    other rule filters. Docs under 3 words emit no row (no trigrams)
    in both engines."""
    doc = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    tris = array_ngrams(ws, 3)
    return (
        doc.where(F.size(ws) >= 3)
        .select(
            "doc_id",
            F.size(tris).cast("bigint").alias("n_trigrams"),
            F.size(F.array_distinct(tris)).cast("bigint").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "n_distinct",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_trigrams").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


# Conservative cross-dialect regexes (identical semantics in Java's
# regex engine and DuckDB's RE2): plain character classes, bounded
# repetition, no backrefs/lookaround.
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
PII_IPV4 = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
PII_LONG_NUMBER = "[0-9][0-9][0-9][0-9][0-9][0-9]+"  # ≥6 consecutive digits


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pre-redaction audit: per source, documents flagged and
    total match counts for email / IPv4 / long-number patterns.
    regexp_count runs JVM-side inside codegen; the per-source rollup
    is a 4-group aggregate, so at 100 TB the cost is exactly one
    scan. The redaction pass itself is the same expression with
    regexp_replace writing a new column."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_email = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ipv4 = F.regexp_count(t, F.lit(PII_IPV4))
    n_num = F.regexp_count(t, F.lit(PII_LONG_NUMBER))
    flagged = (n_email + n_ipv4 + n_num) > 0
    return (
        doc.select("source", n_email.alias("e"), n_ipv4.alias("i"),
                   n_num.alias("n"), flagged.cast("bigint").alias("f"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("f").alias("n_flagged"),
            F.sum("e").alias("n_emails"),
            F.sum("i").alias("n_ipv4"),
            F.sum("n").alias("n_long_numbers"),
        )
    )


SAMPLE_PREFIX = "1a"  # md5-hex 2-char prefix < '1a' ≈ 10.2% of keyspace


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling audit: per (source, lang)
    stratum, how many documents a content-hash threshold sample
    keeps. The same document keeps/drops on any engine and any
    cluster shape (md5 of the text, no RNG) — the reproducibility
    property a training pipeline needs for ablation reruns. One
    scan, one small-cardinality aggregate."""
    doc = load_table(spark, sf_dir, "documents")
    kept = (F.substring(F.md5("text"), 1, 2) < F.lit(SAMPLE_PREFIX)).cast("bigint")
    return (
        doc.select("source", "lang", kept.alias("kept"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.round(F.sum("kept") / F.count("*").cast("double"), 6).alias(
                "sample_rate"
            ),
        )
    )


WSAMPLE_K = 50


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-weighted sampling without replacement
    (exponential clocks / A-ES): each doc draws u from its content
    hash, key = -ln(u)/w with w = its token count, and the K smallest
    keys are the sample — longer documents proportionally more likely,
    reproducible on any engine and cluster shape (no RNG). The global
    top-k is TakeOrderedAndProject over one scan (bounded memory);
    keys are rounded with a doc_id tie-break so the boundary member is
    engine-stable."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    w = (
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("double")
    h = F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(-F.log(u) / w, 9)
    return (
        doc.select("doc_id", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(WSAMPLE_K)
    )


VOCAB_TOP = 50


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: global top-50 terms by frequency with a
    deterministic (count desc, term) rank. Map-side partial counts
    collapse each partition before the one shuffle; the top-k is
    TakeOrderedAndProject (bounded memory at any vocabulary size —
    a full vocab sort never materializes)."""
    doc = load_table(spark, sf_dir, "documents")
    words = doc.select(F.explode(F.split("text", " ")).alias("term")).where(
        F.length("term") > 0
    )
    counts = words.groupBy("term").agg(F.count("*").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("term")).limit(VOCAB_TOP)
    rank = Window.orderBy(F.col("n").desc(), F.col("term"))
    return top.withColumn("rank", F.row_number().over(rank).cast("bigint"))


INTERVAL_DAYS = 14  # interval length == bin width ⇒ ≤2 bins per interval
INTERVAL_KEY_MOD = 97  # deterministic dimension-sized interval subset


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic range (interval containment) join — absent from the
    reference (SURVEY §2.3) and from Spark's equi-join planner, which
    would otherwise fall back to BroadcastNestedLoopJoin. Intervals
    [o_orderdate, +14d) from a keyed subset of orders are matched to
    lineitem ship dates. Implementation: bin both sides by
    floor(epoch_day / 14); an interval spans at most 2 bins (explode
    ≤2 rows), the probe lands in exactly 1, the join is a plain
    equi-join on bin + interval key with the range predicate as a
    residual filter. Fan-out is bounded 2×, so the plan survives any
    interval-side cardinality; here the interval side is additionally
    broadcast because it is dimension-sized.

    Eager aggregation (r14): the per-interval aggregates are sums over
    probe rows and the range predicate depends only on the probe's
    DATE — so the probe collapses to per-date partials (cnt, qty)
    BEFORE the join. The join matches |distinct ship dates| rows
    instead of |lineitem| rows, and the final aggregates are sums of
    integer partials — bit-identical output. Dense temporal-overlap
    joins are density-quadratic (per-bin work = probe_rows ×
    intervals, both growing with corpus); pre-aggregation pins the
    probe side at the date-domain cardinality, which is fixed by the
    schema's date range, not by corpus size.

    The two halves are exposed separately because the per-date
    partials double as STREAMING STATE: daily_shipments is what
    SignalEngine.maintain_shipdate_stream writes per micro-batch, and
    interval_agg_from_daily is the shared serve path (api.py
    interval_join_from_store) — incremental materialized-view
    maintenance of a range-join aggregate with no lineitem rescan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return interval_agg_from_daily(daily_shipments(li), orders)


def daily_shipments(li: DataFrame) -> DataFrame:
    """Per-ship-date integer partials (d_cnt, d_qty) — associative
    under per-date summation, so partials from arbitrary row subsets
    (micro-batches) merge to the exact full-scan frame."""
    return (
        li.select(
            F.col("l_shipdate").cast("date").alias("ship_d"), "l_quantity"
        )
        .groupBy("ship_d")
        .agg(
            F.count("*").alias("d_cnt"),
            # l_quantity is integral by TPC-H contract (1..50): a
            # bigint sum is exact and ~2.5x cheaper than the
            # decimal(38,6) route reserved for fractional monetary
            # columns (operators/common.py)
            F.sum(F.col("l_quantity").cast("bigint")).alias("d_qty"),
        )
    )


def interval_agg_from_daily(daily: DataFrame, orders: DataFrame) -> DataFrame:
    """Binned broadcast range join + final agg over a per-date
    (ship_d, d_cnt, d_qty) frame — the shared serve path of
    q_interval_join and the streamed shipdate store."""
    start = F.col("o_orderdate").cast("date")
    iv = (
        orders.where(F.col("o_orderkey") % INTERVAL_KEY_MOD == 0)
        .select(
            F.col("o_orderkey").alias("iv_key"),
            start.alias("iv_start"),
            F.date_add(start, INTERVAL_DAYS).alias("iv_end"),
        )
    )
    day = lambda c: F.datediff(c, F.lit("1970-01-01"))  # noqa: E731
    iv_binned = iv.select(
        "*",
        F.explode(
            F.array_distinct(
                F.array(
                    (day(F.col("iv_start")) / INTERVAL_DAYS).cast("bigint"),
                    (day(F.date_sub(F.col("iv_end"), 1)) / INTERVAL_DAYS).cast(
                        "bigint"
                    ),
                )
            )
        ).alias("bin"),
    )
    probe = daily.withColumn(
        "bin", (day(F.col("ship_d")) / INTERVAL_DAYS).cast("bigint")
    )
    joined = probe.join(
        F.broadcast(iv_binned),
        (probe.bin == iv_binned.bin)
        & (F.col("ship_d") >= F.col("iv_start"))
        & (F.col("ship_d") < F.col("iv_end")),
    )
    return joined.groupBy(
        "iv_key", F.col("iv_start").cast("timestamp").alias("iv_start")
    ).agg(
        F.sum("d_cnt").alias("n_shipments"),
        F.sum("d_qty").cast("double").alias("total_qty"),
    )


REGION = "ASIA"
Q5_YEAR_START, Q5_YEAR_END = "1996-01-01", "1997-01-01"


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per nation for one
    region-year — the deepest join tree in the inventory (lineitem ⋈
    orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, with the
    c_nationkey = s_nationkey locality predicate). Only the fixed
    dims nation (25 rows) and region (5 rows, filtered to 1) carry
    broadcast hints; orders/customer/supplier are SF-proportional so
    AQE chooses per runtime stats — broadcast at bench SF, shuffle
    joins at 100 TB. The date filter reaches the orders scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_YEAR_START))
        & (F.col("o_orderdate") < F.lit(Q5_YEAR_END))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == REGION)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


PACK_BUDGET = 512  # tokens per packed training sequence


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-then-chunk step that turns curated
    documents into fixed-budget training sequences (GPT-style: documents
    are concatenated in deterministic order and cut every PACK_BUDGET
    tokens; a document may straddle a cut). Emits per document its
    packed position: sequence id and token offset within the sequence.

    Scale shape: ONE shuffle — a running-sum window partitioned by
    `source` and ordered by doc_id. Each source packs independently and
    in parallel; at 100 TB the partition key would be (split, shard)
    with the same plan. Pure integer arithmetic → hash-exact oracle."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = (
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        doc.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            cum_before.alias("cum_before"),
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor(F.col("cum_before") / PACK_BUDGET)
            .cast("bigint")
            .alias("seq_id"),
            (F.col("cum_before") % PACK_BUDGET).alias("seq_offset"),
        )
    )


DECON_N = 4  # word n-gram width for contamination matching


def _word_ngrams(n: int) -> Column:
    """Lower-cased word n-grams of `text` as an array column, entirely
    JVM-side (split / filter / zip_with — no Python; see
    common.array_ngrams for why not transform+slice). Docs shorter
    than n words yield an empty array in both engines."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )
    return array_ngrams(toks, n)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training documents sharing any
    word {DECON_N}-gram with the held-out test split (the standard
    n-gram-overlap check run before any evaluation: a train doc that
    contains an eval n-gram leaks the benchmark). Splits reuse
    q_dataset_split's md5-prefix ranges, so the contamination set is
    consistent with the pipeline's own split assignment.

    Scale shape: the benchmark n-gram set is tiny relative to the
    corpus (evals are MBs, corpora are TBs), so it is broadcast and
    the check is one corpus scan + map-side hash probe — no shuffle
    touches the 100 TB side except the final per-doc count. Emits one
    row per contaminated train doc: distinct shared n-grams and the
    lexicographically first one for audit."""
    doc = parallelize_small_scan(load_table(spark, sf_dir, "documents"), spark)
    hp = F.substring(F.md5(F.col("text")), 1, 2)
    docs = doc.select(
        "doc_id", hp.alias("hp"), _word_ngrams(DECON_N).alias("ngs")
    )
    train_ng = docs.where(F.col("hp") < F.lit(TRAIN_BOUND)).select(
        "doc_id", F.explode("ngs").alias("ng")
    )
    bench_ng = (
        docs.where(F.col("hp") >= F.lit(TEST_BOUND))
        .select(F.explode("ngs").alias("ng"))
        .distinct()
    )
    # Probe BEFORE deduplicating the corpus side: the broadcast hash
    # probe is map-side and highly selective, so the (doc_id, ng)
    # distinct runs on the few surviving hits instead of exchanging
    # every exploded n-gram of the corpus (count_distinct folds that
    # dedup into the final aggregation — one shuffle total).
    return (
        train_ng.join(F.broadcast(bench_ng), "ng")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("ng").alias("n_shared_ngrams"),
            F.min("ng").alias("first_shared"),
        )
    )


# Target token mixture per language domain. Domains absent from the
# map are excluded from the mix (weights sum to 1 over included ones).
MIX_WEIGHTS = {"en": 0.5, "de": 0.15, "es": 0.15, "fr": 0.1, "zh": 0.1}


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture token budgeting — the sampling stage that hits
    target mixture weights across domains (languages here): the total
    budget is the largest T with weight_d * T <= available_d for every
    domain (the scarcest domain binds), each domain's quota is
    floor(weight_d * T), and documents fill their domain's quota in
    deterministic content-hash order (same selection on any engine or
    cluster shape — no RNG).

    Scale shape: per-domain token totals are one partial-agg scan; the
    binding constraint is a dimension-sized reduction (broadcast back);
    the fill is ONE window shuffle partitioned by domain — the same
    plan at 100 TB with (domain, shard) partitioning. Emits the kept
    documents with their cumulative position."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = (
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("bigint")
    toks = doc.select(
        "doc_id",
        F.col("lang").alias("domain"),
        n_tokens.alias("n_tokens"),
        F.md5(t).alias("h"),
    )
    # literal VALUES relation (LocalTableScan) — not createDataFrame,
    # which plans as a Python-RDD scan and muddies the no-Python contract
    weights = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(
            f"('{d}', CAST({w} AS DOUBLE))" for d, w in sorted(MIX_WEIGHTS.items())
        )
        + " AS t(domain, weight)"
    )
    avail = toks.groupBy("domain").agg(F.sum("n_tokens").alias("avail_tokens"))
    budget = (
        avail.join(F.broadcast(weights), "domain")
        .agg(F.min(F.col("avail_tokens") / F.col("weight")).alias("t_total"))
    )
    quota = (
        avail.join(F.broadcast(weights), "domain")
        .crossJoin(F.broadcast(budget))
        .select(
            "domain",
            F.floor(F.col("weight") * F.col("t_total"))
            .cast("bigint")
            .alias("quota_tokens"),
        )
    )
    w = (
        Window.partitionBy("domain")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(quota), "domain")
        .where(F.col("cum_tokens") <= F.col("quota_tokens"))
        .select("doc_id", "domain", "n_tokens", "cum_tokens", "quota_tokens")
    )


TEMP_ALPHA = 0.7          # mixture temperature (UNIMAX/mT5-style)
TEMP_BUDGET = 1_000_000   # training-token budget to allocate


def q_domain_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture — the OTHER standard mixing
    policy next to q_domain_mix's fixed target weights: sampling
    weights w_d ∝ p_d^α derived from the OBSERVED token shares p_d
    (α = 0.7 upsamples the tail the way multilingual LM data recipes
    do; α = 1 is proportional, α = 0 uniform). Emits, per domain, the
    observed share, the temperature weight, the token allocation under
    TEMP_BUDGET, and the implied epochs (allocation ÷ available — the
    oversampling factor a repeated-epoch sampler would apply; > 1
    means the domain's data is seen more than once).

    Determinism: shares are exact bigint ratios; pow/÷ are evaluated
    from identical operands in both engines and every emitted double
    is round(·, 6) (the AVG discipline — possible 1-ulp libm pow
    differences sit ~10 orders below the rounding grid). round() runs
    BEFORE the bigint cast so Spark's truncating cast and DuckDB's
    rounding cast see an exact integer.

    Scale: one partial-agg scan for per-domain totals; everything
    after is domain-cardinality (two 1-row broadcast reductions)."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = (
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("bigint")
    avail = (
        doc.select(F.col("lang").alias("domain"), n_tokens.alias("n"))
        .groupBy("domain")
        .agg(F.sum("n").alias("avail_tokens"))
    )
    tot = avail.agg(F.sum("avail_tokens").alias("total_tokens"))
    scored = avail.join(F.broadcast(tot)).select(
        "domain",
        "avail_tokens",
        (F.col("avail_tokens").cast("double") / F.col("total_tokens")).alias(
            "p"
        ),
        F.pow(
            F.col("avail_tokens").cast("double") / F.col("total_tokens"),
            F.lit(TEMP_ALPHA),
        ).alias("s"),
    )
    z = scored.agg(F.sum("s").alias("z"))
    alloc = F.lit(float(TEMP_BUDGET)) * F.col("s") / F.col("z")
    return scored.join(F.broadcast(z)).select(
        "domain",
        "avail_tokens",
        F.round("p", 6).alias("share"),
        F.round(F.col("s") / F.col("z"), 6).alias("weight"),
        F.round(alloc).cast("bigint").alias("alloc_tokens"),
        F.round(alloc / F.col("avail_tokens"), 6).alias("epochs"),
    )


CUTOFF_FRAC = 0.1  # drop the bottom decile per source


def q_quality_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality threshold — instead of a fixed score cutoff,
    drop the bottom CUTOFF_FRAC of documents per source by quality
    score (model-based filters are calibrated this way: the threshold
    is a quantile of the observed distribution, so a clean source
    keeps more than a noisy one at the same setting). percent_rank
    with a doc_id tie-break is an exact integer ratio — engine-exact,
    no approximate percentile in the decision path; at scale swap in
    approx_percentile to pre-compute the cutoff in one pass if the
    window sort is the bottleneck. ONE window shuffle by source."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n = F.length(t).cast("double")
    n_spaces = (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))).cast(
        "double"
    )
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    score = F.round(
        F.lit(0.4) * F.least(n / F.lit(500.0), F.lit(1.0))
        + F.lit(0.4) * (n_alpha / n)
        + F.lit(0.2) * (n_spaces / n),
        6,
    )
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    pr = F.round(F.percent_rank().over(w), 6)
    return (
        doc.select("doc_id", "source", score.alias("quality_score"))
        .select(
            "doc_id",
            "source",
            "quality_score",
            pr.alias("pct_rank"),
        )
        .withColumn(
            "keep", (F.col("pct_rank") >= F.lit(CUTOFF_FRAC)).cast("int")
        )
    )


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning/redaction — the rewrite stage between scanning
    and training: emails / IPv4s / long digit runs become typed
    placeholder tokens (the q_pii_scan patterns, single source of
    truth) and whitespace collapses to single spaces. Per-row
    regexp_replace chain, JVM-side, no shuffle — at 100 TB this runs
    at scan speed and writes the curated copy; the redaction counts
    make the pass auditable against q_pii_scan."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_email = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ipv4 = F.regexp_count(t, F.lit(PII_IPV4))
    n_num = F.regexp_count(t, F.lit(PII_LONG_NUMBER))
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
                    PII_IPV4,
                    "<IP>",
                ),
                PII_LONG_NUMBER,
                "<NUM>",
            ),
            r"\s+",
            " ",
        )
    )
    return doc.select(
        "doc_id",
        cleaned.alias("clean_text"),
        (n_email + n_ipv4 + n_num).cast("bigint").alias("n_redactions"),
        F.length(cleaned).cast("bigint").alias("n_chars_clean"),
    )


QUERIES = {
    "q_gopher_rules": q_gopher_rules,
    "q_decontaminate": q_decontaminate,
    "q_domain_mix": q_domain_mix,
    "q_domain_temperature": q_domain_temperature,
    "q_quality_cutoff": q_quality_cutoff,
    "q_clean_text": q_clean_text,
    "q_pack_sequences": q_pack_sequences,
    "q_repetition": q_repetition,
    "q_pii_scan": q_pii_scan,
    "q_stratified_sample": q_stratified_sample,
    "q_weighted_sample": q_weighted_sample,
    "q_vocab_topk": q_vocab_topk,
    "q_interval_join": q_interval_join,
    "q_regional_revenue": q_regional_revenue,
}


def _occ_sql(expr: str, marker: str) -> str:
    return (
        f"((length({expr}) - length(replace({expr}, '{marker}', '')))"
        f" / {len(marker)})"
    )


_PAD = "(' ' || text || ' ')"
_NSP = _occ_sql("text", " ")
_NW = f"({_NSP} + 1.0)"
_MWL = f"((length(text) - {_NSP}) / {_NW})"
_NSYM = f"({_occ_sql('text', '#')} + {_occ_sql('text', '...')})"
_STOP = " + ".join(_occ_sql(_PAD, f" {w} ") for w in STOPWORDS)

# The gopher `keep` conjunction as a bare SQL predicate — reused by the
# full-pipeline oracle (pipeline.py) to filter before dedup stages.
KEEP_SQL = (
    f"({_NW} >= {MIN_WORDS} AND {_NW} <= {MAX_WORDS}"
    f" AND {_MWL} >= {MIN_MEAN_WL} AND {_MWL} <= {MAX_MEAN_WL}"
    f" AND {_NSYM} / {_NW} <= {MAX_SYMBOL_RATIO}"
    f" AND ({_STOP}) >= {MIN_STOPWORD_HITS})"
)

_NTOK = "(length(text) - length(replace(text, ' ', '')) + 1)"

_MIX_VALUES = ", ".join(
    f"('{d}', {w})" for d, w in sorted(MIX_WEIGHTS.items())
)

_QSCORE = (
    "round(0.4 * least(length(text) / 500.0, 1.0)"
    " + 0.4 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))"
    "          / CAST(length(text) AS DOUBLE))"
    " + 0.2 * ((length(text) - length(replace(text, ' ', '')))"
    "          / CAST(length(text) AS DOUBLE)), 6)"
)

ORACLES = {
    "q_quality_cutoff": f"""
        SELECT doc_id, source, quality_score, pct_rank,
               CAST(pct_rank >= {CUTOFF_FRAC} AS INT) AS keep
        FROM (
            SELECT doc_id, source, quality_score,
                   round(percent_rank() OVER (
                       PARTITION BY source
                       ORDER BY quality_score, doc_id), 6) AS pct_rank
            FROM (
                SELECT doc_id, source, {_QSCORE} AS quality_score
                FROM documents
            )
        )
    """,
    "q_clean_text": f"""
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                           '{PII_IPV4}', '<IP>', 'g'),
                       '{PII_LONG_NUMBER}', '<NUM>', 'g'),
                   '\\s+', ' ', 'g')) AS clean_text,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
                    + len(regexp_extract_all(text, '{PII_IPV4}'))
                    + len(regexp_extract_all(text, '{PII_LONG_NUMBER}'))
                    AS BIGINT) AS n_redactions,
               CAST(length(trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                           '{PII_IPV4}', '<IP>', 'g'),
                       '{PII_LONG_NUMBER}', '<NUM>', 'g'),
                   '\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_clean
        FROM documents
    """,
    "q_decontaminate": f"""
        WITH toks AS (
            SELECT doc_id, substr(md5(text), 1, 2) AS hp,
                   list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> length(x) > 0) AS ws
            FROM documents
        ), ngr AS (
            SELECT doc_id, hp,
                   unnest(list_transform(
                       range(1, greatest(len(ws) - {DECON_N - 2}, 1)),
                       i -> array_to_string(ws[i:i+{DECON_N - 1}], ' '))) AS ng
            FROM toks
        ), train_ng AS (
            SELECT DISTINCT doc_id, ng FROM ngr WHERE hp < '{TRAIN_BOUND}'
        ), bench_ng AS (
            SELECT DISTINCT ng FROM ngr WHERE hp >= '{TEST_BOUND}'
        )
        SELECT doc_id, count(*) AS n_shared_ngrams,
               min(ng) AS first_shared
        FROM train_ng JOIN bench_ng USING (ng)
        GROUP BY doc_id
    """,
    "q_domain_temperature": f"""
        WITH tok AS (
            SELECT lang AS domain,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1
                        AS BIGINT) AS n
            FROM documents
        ),
        a AS (
            SELECT domain, CAST(SUM(n) AS BIGINT) AS avail_tokens
            FROM tok GROUP BY domain
        ),
        t AS (SELECT CAST(SUM(avail_tokens) AS BIGINT) AS total_tokens FROM a),
        s AS (
            SELECT domain, avail_tokens,
                   CAST(avail_tokens AS DOUBLE) / total_tokens AS p,
                   pow(CAST(avail_tokens AS DOUBLE) / total_tokens,
                       {TEMP_ALPHA}) AS sc
            FROM a, t
        ),
        z AS (SELECT SUM(sc) AS z FROM s)
        SELECT domain, avail_tokens,
               round(p, 6) AS share,
               round(sc / z, 6) AS weight,
               CAST(round({float(TEMP_BUDGET)} * sc / z) AS BIGINT)
                   AS alloc_tokens,
               round({float(TEMP_BUDGET)} * sc / z / avail_tokens, 6)
                   AS epochs
        FROM s, z
    """,
    "q_domain_mix": f"""
        WITH weights(domain, weight) AS (VALUES {_MIX_VALUES}),
        toks AS (
            SELECT doc_id, lang AS domain,
                   CAST({_NTOK} AS BIGINT) AS n_tokens, md5(text) AS h
            FROM documents
        ), avail AS (
            SELECT domain, CAST(sum(n_tokens) AS BIGINT) AS avail_tokens
            FROM toks GROUP BY domain
        ), budget AS (
            SELECT min(avail_tokens / weight) AS t_total
            FROM avail JOIN weights USING (domain)
        ), quota AS (
            SELECT domain,
                   CAST(floor(weight * t_total) AS BIGINT) AS quota_tokens
            FROM avail JOIN weights USING (domain), budget
        )
        SELECT doc_id, domain, n_tokens, cum_tokens, quota_tokens
        FROM (
            SELECT doc_id, domain, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY domain ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM toks
        ) JOIN quota USING (domain)
        WHERE cum_tokens <= quota_tokens
    """,
    "q_pack_sequences": f"""
        SELECT doc_id, source, n_tokens,
               CAST(floor(cum_before / {PACK_BUDGET}.0) AS BIGINT) AS seq_id,
               cum_before % {PACK_BUDGET} AS seq_offset
        FROM (
            SELECT doc_id, source,
                   CAST({_NTOK} AS BIGINT) AS n_tokens,
                   CAST(COALESCE(SUM(CAST({_NTOK} AS BIGINT)) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM documents
        )
    """,
    "q_gopher_rules": f"""
        SELECT doc_id,
               CAST({_NW} AS BIGINT) AS n_words,
               round({_MWL}, 6) AS mean_word_len,
               round({_NSYM} / {_NW}, 6) AS symbol_ratio,
               CAST({_STOP} AS BIGINT) AS stopword_hits,
               CAST({_NW} >= {MIN_WORDS} AND {_NW} <= {MAX_WORDS} AS INT)
                   AS word_count_ok,
               CAST({_MWL} >= {MIN_MEAN_WL} AND {_MWL} <= {MAX_MEAN_WL} AS INT)
                   AS mean_wl_ok,
               CAST({_NSYM} / {_NW} <= {MAX_SYMBOL_RATIO} AS INT) AS symbol_ok,
               CAST(({_STOP}) >= {MIN_STOPWORD_HITS} AS INT) AS stopword_ok,
               CAST({_NW} >= {MIN_WORDS} AND {_NW} <= {MAX_WORDS}
                    AND {_MWL} >= {MIN_MEAN_WL} AND {_MWL} <= {MAX_MEAN_WL}
                    AND {_NSYM} / {_NW} <= {MAX_SYMBOL_RATIO}
                    AND ({_STOP}) >= {MIN_STOPWORD_HITS} AS INT) AS keep
        FROM documents
    """,
    "q_repetition": """
        SELECT doc_id,
               CAST(len(tris) AS BIGINT) AS n_trigrams,
               CAST(len(list_distinct(tris)) AS BIGINT) AS n_distinct,
               round(1.0 - len(list_distinct(tris))
                     / CAST(len(tris) AS DOUBLE), 6) AS dup_frac
        FROM (
            SELECT doc_id,
                   list_transform(
                       range(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                   ) AS tris
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        ) WHERE len(tris) > 0
    """,
    "q_pii_scan": f"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(CAST(e + i + n > 0 AS BIGINT)) AS BIGINT) AS n_flagged,
               CAST(sum(e) AS BIGINT) AS n_emails,
               CAST(sum(i) AS BIGINT) AS n_ipv4,
               CAST(sum(n) AS BIGINT) AS n_long_numbers
        FROM (
            SELECT source,
                   len(regexp_extract_all(text, '{PII_EMAIL}')) AS e,
                   len(regexp_extract_all(text, '{PII_IPV4}')) AS i,
                   len(regexp_extract_all(text, '{PII_LONG_NUMBER}')) AS n
            FROM documents
        ) GROUP BY source
    """,
    "q_weighted_sample": f"""
        SELECT doc_id,
               round(-ln((CAST(CAST(('0x' || substr(md5(text), 1, 8))
                                AS BIGINT) AS DOUBLE) + 0.5)
                         / 4294967296.0)
                     / CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS DOUBLE), 9) AS sample_key
        FROM documents
        ORDER BY sample_key, doc_id
        LIMIT {WSAMPLE_K}
    """,
    "q_stratified_sample": f"""
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(CAST(substr(md5(text), 1, 2) < '{SAMPLE_PREFIX}'
                             AS BIGINT)) AS BIGINT) AS n_kept,
               round(sum(CAST(substr(md5(text), 1, 2) < '{SAMPLE_PREFIX}'
                              AS BIGINT))
                     / CAST(count(*) AS DOUBLE), 6) AS sample_rate
        FROM documents GROUP BY source, lang
    """,
    "q_vocab_topk": f"""
        SELECT term, n, CAST(row_number() OVER (ORDER BY n DESC, term)
                             AS BIGINT) AS rank
        FROM (
            SELECT term, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS term
                  FROM documents)
            WHERE length(term) > 0 GROUP BY term
        )
        ORDER BY n DESC, term LIMIT {VOCAB_TOP}
    """,
    "q_interval_join": f"""
        SELECT o.o_orderkey AS iv_key,
               CAST(CAST(o.o_orderdate AS DATE) AS TIMESTAMP) AS iv_start,
               count(*) AS n_shipments,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE)
                   AS total_qty
        FROM orders o
        JOIN lineitem l
          ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
         AND CAST(l.l_shipdate AS DATE)
             < CAST(o.o_orderdate AS DATE) + INTERVAL {INTERVAL_DAYS} DAY
        WHERE o.o_orderkey % {INTERVAL_KEY_MOD} = 0
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    """,
    "q_regional_revenue": f"""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{REGION}'
          AND o_orderdate >= TIMESTAMP '{Q5_YEAR_START} 00:00:00'
          AND o_orderdate < TIMESTAMP '{Q5_YEAR_END} 00:00:00'
        GROUP BY n_name
    """,
}
