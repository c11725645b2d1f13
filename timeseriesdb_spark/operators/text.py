"""Text-analysis operators for LLM training-data pipelines, over the
`documents(doc_id, text, lang, source, n_chars)` table.

These extend the reference's surface (BASELINE.json north star): at
100 TB the documents table is the web-crawl corpus and every operator
below is a single narrow scan + projection — no shuffle except the
grouped stats — so they pipeline with dedup/similarity in one pass.

Engine-parity discipline: everything is built from length/replace/
md5/lower/simple-regex primitives that evaluate identically in Spark
(JVM, codegen) and DuckDB (the oracle), so results hash-match without
any Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

# RAKE/Gopher marker stopwords (canonical home: curation.py re-exports)
STOPWORDS = ["the", "a", "of", "to"]

# language → marker stopword (padded occurrences counted in ' text ')
LANG_MARKERS = [
    ("en", " the "),
    ("fr", " le "),
    ("de", " der "),
    ("es", " el "),
    ("zh", "的"),
]


def _occurrences(text: Column, marker: str) -> Column:
    """# of occurrences of `marker` = (len - len(remove(marker)))/len(marker).
    Pure string arithmetic → identical in both engines."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))
    ) / F.lit(len(marker))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + char count per document. The BPE-ish
    proxy `n_subwords` assumes ~4 chars/token (ceil(len/4)) — the
    standard budget heuristic when no tokenizer is available."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = (
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("bigint")
    return doc.select(
        "doc_id",
        F.length(t).cast("bigint").alias("n_chars_txt"),
        n_tokens.alias("n_tokens"),
        F.ceil(F.length(t) / F.lit(4.0)).cast("bigint").alias("n_subwords"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID: count per-language marker
    stopwords, argmax with a fixed priority order. Deterministic and
    engine-exact (string arithmetic only); at scale this is a scan."""
    doc = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = {lang: _occurrences(padded, m) for lang, m in LANG_MARKERS}
    # CASE: first language (in declared order) whose score hits the max
    mx = F.greatest(*[scores[lang] for lang, _ in LANG_MARKERS])
    pred = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when((scores[lang] == mx) & (mx > 0), F.lit(lang)).otherwise(pred)
    return doc.select(
        "doc_id",
        "lang",
        *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang, _ in LANG_MARKERS],
        pred.alias("pred_lang"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, mean word length, alpha ratio,
    space ratio → one [0,1] score. All ratios are double arithmetic in
    a fixed expression order, rounded once at the end."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n = F.length(t).cast("double")
    n_spaces = (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))).cast(
        "double"
    )
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    n_words = n_spaces + F.lit(1.0)
    mean_word_len = (n - n_spaces) / n_words
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = n_alpha / n
    space_ratio = n_spaces / n
    score = (
        F.lit(0.4) * len_score + F.lit(0.4) * alpha_ratio + F.lit(0.2) * space_ratio
    )
    return doc.select(
        "doc_id",
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text — the canonical-form hash used as the exact-dedup key."""
    doc = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return doc.select("doc_id", F.md5(norm).alias("fp"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus stats (the grouped scan every curation
    dashboard needs): doc count, total chars, mean doc length."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
    )


def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured metadata extraction: parse the events.props JSON
    column ('{"k": n}') and aggregate by event_type — the
    metadata-enrichment scan every crawl/telemetry pipeline runs.
    get_json_object evaluates JVM-side (no Python); at 100 TB prefer
    materializing parsed fields as typed columns at ingest (schema
    evolution), which this query's projection defines."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


TFIDF_TOP = 3  # terms reported per document


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF terms per document — the keyword/topic extraction
    scan of a text pipeline. tf = in-doc term count, idf = ln(N/df)
    with N folded as a literal (one count job at plan build), score
    rounded before ranking with a term tie-break so the top-k set is
    engine-exact. Two shuffles total: term stats, then the per-doc
    rank."""
    doc = load_table(spark, sf_dir, "documents")
    # N in-plan as a 1-row broadcast (r15, the q_bm25 treatment — the
    # count() job serialized before the main job; cast == float())
    totals = doc.agg(F.count("*").alias("_n_docs"))
    words = doc.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    scored = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("_n_docs").cast("double") / F.col("df")),
                6,
            )
            + F.lit(0.0),
        )
    )
    rank = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("w")
    )
    return (
        scored.withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= TFIDF_TOP)
        .select("doc_id", F.col("w").alias("term"), "tf", "df", "tfidf", "rn")
    )


#  BPE-ish pre-tokenization: letter runs, digit runs, single symbols —
#  the split a byte-pair tokenizer applies before merges (space as the
#  literal separator so the pattern means the same in Java regex and
#  DuckDB's RE2).
BPE_SPLIT_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex pre-tokenizer counts per document — the BPE-style budget
    estimate next to q_token_count's whitespace/char heuristics. One
    regexp_count per row at scan speed; the ratio to whitespace words
    flags symbol-heavy documents (code, tables) whose token cost
    explodes under a real tokenizer."""
    doc = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_ws = (
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("bigint")
    n_re = F.regexp_count(t, F.lit(BPE_SPLIT_PATTERN)).cast("bigint")
    return doc.select(
        "doc_id",
        n_re.alias("n_regex_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.round(n_re / n_ws.cast("double"), 6).alias("tokens_per_word"),
    )


PMI_MIN_PAIR = 5  # report collocations seen at least this often


def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-scored word collocations over the corpus — the phrase/
    tokenizer-merge analysis (what BPE merges and phrase detectors
    rank): pmi = ln( p(ab) / (p(a)·p(b)) ) over adjacent word pairs.
    Counts are exact integers; totals fold as literals (two count jobs
    at plan build, the q_tfidf_top_terms pattern); the single ln is
    rounded to the 6-decimal grid. Two shuffles (bigram agg, unigram
    agg) + two broadcast joins — at 100 TB both aggs are partial-final
    over the corpus scan."""
    from timeseriesdb_spark.operators.common import array_ngrams

    doc = load_table(spark, sf_dir, "documents")
    warr = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    words = doc.select(F.explode(warr).alias("w"))
    bigrams = doc.select(
        F.explode(array_ngrams(warr, 2)).alias("bg")
    )
    # Both corpus totals in ONE in-plan broadcast aggregate (r15, the
    # q_bm25 treatment): the two count() jobs each re-tokenized the
    # whole corpus and ran serialized before the main job.
    # sum(size(...)) counts exactly what count-after-explode counted,
    # and cast(bigint as double) is the conversion float() performed,
    # so the pmi doubles are bit-identical.
    totals = doc.agg(
        F.sum(F.size(warr)).alias("_n_uni"),
        F.sum(F.size(array_ngrams(warr, 2))).alias("_n_bi"),
    )
    n_uni = F.col("_n_uni").cast("double")
    n_bi = F.col("_n_bi").cast("double")
    uni = words.groupBy("w").agg(F.count("*").alias("c"))
    bi = bigrams.groupBy("bg").agg(F.count("*").alias("c_ab")).where(
        F.col("c_ab") >= PMI_MIN_PAIR
    )
    parts = F.split("bg", " ")
    bi = bi.withColumn("w1", parts.getItem(0)).withColumn("w2", parts.getItem(1))
    ca = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        (F.col("c_ab") / n_bi)
        / ((F.col("c_a") / n_uni) * (F.col("c_b") / n_uni))
    )
    return (
        bi.join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            "c_ab",
            "c_a",
            "c_b",
            (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"),
        )
    )


LM_MIN_CONTEXT = 50  # min context-word occurrences to emit predictions
LM_TOP = 3           # next-word candidates per context


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model head: for each frequent context word, the
    top next-word candidates with conditional probability
    p(w2|w1) = c(w1 w2)/c(w1 ·) — the count-based LM table a
    next-token-prediction pipeline materializes (the probability twin
    of q_pmi_bigrams' association score: PMI ranks collocations,
    this predicts continuations).

    Counts are exact integers; p is one integer/integer double
    division (engine-identical); the per-context top-k is a
    row_number over (count DESC, w2) — fully deterministic. Context
    totals come from counting bigram STARTS (not unigrams), so the
    probabilities sum to 1 per emitted context. Two shuffles: the
    bigram agg, then the per-context window on the same w1 key."""
    from timeseriesdb_spark.operators.common import array_ngrams

    doc = load_table(spark, sf_dir, "documents")
    warr = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    bigrams = doc.select(F.explode(array_ngrams(warr, 2)).alias("bg"))
    parts = F.split("bg", " ")
    bi = (
        bigrams.select(
            parts.getItem(0).alias("w1"), parts.getItem(1).alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_pair"))
    )
    wc = Window.partitionBy("w1")
    wr = Window.partitionBy("w1").orderBy(
        F.col("c_pair").desc(), F.col("w2")
    )
    return (
        bi.withColumn("c_ctx", F.sum("c_pair").over(wc))
        .withColumn("rn", F.row_number().over(wr))
        .filter((F.col("c_ctx") >= LM_MIN_CONTEXT) & (F.col("rn") <= LM_TOP))
        .select(
            "w1",
            "w2",
            "c_pair",
            "c_ctx",
            (
                F.col("c_pair").cast("double")
                / F.col("c_ctx").cast("double")
            ).alias("p_next"),
            "rn",
        )
    )


OVERLAP_N = 3        # word n-gram width for the source-overlap matrix
OVERLAP_SRC_CAP = 128  # drop n-grams present in > CAP sources


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: distinct word-3-gram Jaccard
    between every pair of sources — the diagnostic a curation run
    consults before mixing corpora (high overlap ⇒ boilerplate or
    mirrored content; the same check as q_decontaminate but
    corpus-to-corpus instead of corpus-to-benchmark). Shape: distinct
    (source, ngram) inverted index, intersections from one self-join
    on the ngram key. Per-ngram join fan-out is (#sources carrying
    it)², so n-grams present in > OVERLAP_SRC_CAP sources (universal
    boilerplate — they carry no contamination signal) are dropped
    from the universe before the join; the cap is a window count on
    the same ngram partitioning the self-join shuffles on, and the
    oracle applies it identically."""
    from timeseriesdb_spark.operators.common import array_ngrams

    doc = load_table(spark, sf_dir, "documents")
    warr = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    w_ng = Window.partitionBy("ng")
    # r14: ONE exchange builds the inverted index, not two. The global
    # (source, ng) dedup runs as dropDuplicates ON the ng-partitioned
    # frame — hashpartitioning(ng) satisfies the (source, ng)
    # clustering requirement (partition keys ⊆ group keys), so the
    # dedup, the cap window and the downstream self-join all reuse the
    # single repartition("ng") shuffle. The earlier .distinct() before
    # the repartition exchanged every exploded corpus n-gram a second
    # time for nothing (guide §2.4).
    ngrams = (
        doc.select(
            "source",
            F.explode(F.array_distinct(array_ngrams(warr, OVERLAP_N))).alias("ng"),
        )
        .repartition("ng")
        .dropDuplicates(["source", "ng"])
        .withColumn("_nsrc", F.count("*").over(w_ng))
        .where(F.col("_nsrc") <= OVERLAP_SRC_CAP)
        .drop("_nsrc")
    )
    sizes = ngrams.groupBy("source").agg(F.count("*").alias("n_ng"))
    a, b = ngrams.alias("a"), ngrams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.ng") == F.col("b.ng"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_ng").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_ng").alias("n_b"))
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


HASH_DIM = 64  # feature-hashing bucket count (the hashing trick)


def q_hashing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors — the
    featurization behind fastText-style quality classifiers at corpus
    scale: no vocabulary to build or broadcast, each word maps to
    bucket md5(w) % D with a ±1 sign from the next hash bit, summed
    per document. Emitted sparse as (doc_id, bucket, weight) rows —
    the layout a downstream trainer consumes; densification is a
    pivot away. One explode + one (doc, bucket) aggregation."""
    doc = load_table(spark, sf_dir, "documents")
    words = doc.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    bucket = F.pmod(h, F.lit(HASH_DIM))
    sign = F.when(
        F.pmod(F.floor(h / F.lit(HASH_DIM)), F.lit(2)) == 0, 1
    ).otherwise(-1)
    return (
        words.select("doc_id", bucket.alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("weight"))
        .where(F.col("weight") != 0)
    )


def q_idf_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rarity score: mean IDF of its (distinct) terms —
    high means the document is built from corpus-rare vocabulary
    (jargon, other languages, spam tokens), a standard quality/outlier
    signal next to q_quality_score's surface features. Determinism:
    each term's idf is rounded FIRST (ln is per-term, not
    order-dependent), then the per-doc mean runs through the decimal
    sum, so accumulation order cannot flip the hash. Two shuffles
    (term df, per-doc mean); N folds as a literal like tfidf."""
    doc = load_table(spark, sf_dir, "documents")
    # N in-plan as a 1-row broadcast (r15, the q_bm25 treatment): the
    # count() job serialized before the main job; cast(bigint as
    # double) is the conversion float() performed, so idf is bit-equal
    totals = doc.agg(F.count("*").alias("_n_docs"))
    words = doc.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    ).where(F.length("w") > 0)
    df_ = words.groupBy("w").agg(F.count("*").alias("df"))
    ridf = F.round(
        F.log(F.col("_n_docs").cast("double") / F.col("df")), 6
    )
    # integer-exact half-up mean (the q_label_centroids lesson: engine
    # round(double/count, 6) can disagree at half-way boundaries); idf
    # is non-negative so no sign branch
    agg = (
        words.join(df_, "w")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", ridf.alias("idf"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            (F.sum(F.col("idf").cast("decimal(38,6)")) * F.lit(1_000_000))
            .cast("long")
            .alias("_u"),
        )
    )
    q = F.expr("(2 * _u + n_terms) div (2 * n_terms)")
    return agg.select(
        "doc_id",
        "n_terms",
        (q.cast("double") / F.lit(1_000_000.0)).alias("mean_idf"),
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log10 unigram probability — the CCNet-style
    LM-perplexity proxy: score each token by the corpus unigram
    distribution and average. Low (very negative) means the document
    is built from improbable token sequences (gibberish, rare-script
    spam); high means boilerplate-common vocabulary. The quality
    signal that ranks next to q_quality_score (surface features) and
    q_idf_rarity (distinct-term rarity) — this one weights by actual
    token frequency, so a document repeating one rare word scores
    differently from one made of many.

    Determinism: p(term) = tf/N is a ratio of two integers (identical
    doubles in both engines), log10 rounds to 6dp per TERM before any
    accumulation, the per-doc sum is decimal, and the mean is the
    sign-branched integer half-up division (log-probs are ≤ 0).
    Shape: one term-count shuffle, the unigram table broadcasts back
    onto the token stream (vocab-sized — at 100 TB cap it with a
    min-tf floor), one per-doc shuffle."""
    doc = load_table(spark, sf_dir, "documents")
    words = doc.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    # N in-plan (r15, the q_pmi_bigrams treatment): the count() job
    # re-tokenized the corpus serialized before the main job;
    # sum(size(filter(...))) counts the same nonempty tokens and
    # cast(bigint as double) is float()'s conversion — bit-equal p.
    warr = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    totals = doc.agg(F.sum(F.size(warr)).alias("_n_total"))
    tf = words.groupBy("w").agg(F.count("*").alias("tf"))
    logp = F.round(
        F.log10(
            F.col("tf").cast("double") / F.col("_n_total").cast("double")
        ),
        6,
    )
    agg = (
        words.join(F.broadcast(tf), "w")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", logp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum(F.col("lp").cast("decimal(38,6)")) * F.lit(1_000_000))
            .cast("long")
            .alias("_u"),
        )
    )
    q = F.expr(
        "CASE WHEN _u >= 0 THEN (2 * _u + n_tokens) div (2 * n_tokens) "
        "ELSE -((2 * -_u + n_tokens) div (2 * n_tokens)) END"
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        (q.cast("double") / F.lit(1_000_000.0)).alias("mean_logp10"),
    )


SPLIT_BOUNDS = ("cc", "e6")  # md5-hex prefixes: ~80% train, 10% val, 10% test


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — hash-range splitting
    on content identity, the reproducibility backbone of a training
    pipeline: the same document lands in the same split on any
    cluster, any run, any engine (md5 is the portable hash here as in
    dedup). Emits (doc_id, split) plus the hash prefix for audit."""
    doc = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("text")), 1, 2)
    lo, hi = SPLIT_BOUNDS
    split = (
        F.when(prefix < F.lit(lo), "train")
        .when(prefix < F.lit(hi), "val")
        .otherwise("test")
    )
    return doc.select("doc_id", prefix.alias("hash_prefix"), split.alias("split"))


ZIPF_TOP = 30  # head terms entering the log-log fit


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: OLS slope of ln(freq) on ln(rank)
    over the top-30 terms — the corpus-health diagnostic (natural text
    sits near slope ≈ −1; templated/spammy crawls flatten it).

    The fit runs on the source's head vocabulary (a top-k per group,
    bounded rows), never the full term table. Exactness: ln() of
    identical doubles is engine-identical in practice; each moment is
    rounded to the 1e-9 grid and decimal-summed, so the OLS formula
    divides bit-identical inputs."""
    doc = load_table(spark, sf_dir, "documents")
    words = doc.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    counts = words.groupBy("source", "w").agg(F.count("*").alias("c"))
    rk = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("w"))
    ranked = counts.withColumn("rank", F.row_number().over(rk)).where(
        F.col("rank") <= ZIPF_TOP
    )
    lx = F.round(F.log(F.col("rank").cast("double")), 9)
    ly = F.round(F.log(F.col("c").cast("double")), 9)
    d9 = "decimal(38,9)"
    m = (
        ranked.select("source", lx.alias("lx"), ly.alias("ly"))
        .groupBy("source")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.col("lx").cast(d9)).cast("double").alias("sx"),
            F.sum(F.col("ly").cast(d9)).cast("double").alias("sy"),
            F.sum(F.round(F.col("lx") * F.col("ly"), 9).cast(d9))
            .cast("double")
            .alias("sxy"),
            F.sum(F.round(F.col("lx") * F.col("lx"), 9).cast(d9))
            .cast("double")
            .alias("sxx"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "source",
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


KS_SRC_A, KS_SRC_B = "src0", "src1"


def q_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between two
    sources' document-length distributions — the drift test a corpus
    pipeline runs on every new crawl against the reference corpus.

    D = max |ECDF_a − ECDF_b| computed as pure integer arithmetic:
    per distinct length, per-source counts; cumulative counts c1, c2;
    the max of |c1·n2 − c2·n1| (bigint, exact) divided once by n1·n2.
    The ordered cumulative runs over the distribution SUPPORT
    (distinct lengths — bounded, nothing like row count), so the
    single-partition window is aggregate-sized, same as any final
    top-k. One scan, one narrow shuffle."""
    doc = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin(KS_SRC_A, KS_SRC_B)
    )
    b = doc.groupBy("n_chars").agg(
        F.sum((F.col("source") == KS_SRC_A).cast("long")).alias("c1"),
        F.sum((F.col("source") == KS_SRC_B).cast("long")).alias("c2"),
    )
    tot = b.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = b.select(
        F.sum("c1").over(w).alias("u1"), F.sum("c2").over(w).alias("u2")
    ).crossJoin(F.broadcast(tot))
    return (
        cum.select(
            "n1",
            "n2",
            F.abs(F.col("u1") * F.col("n2") - F.col("u2") * F.col("n1")).alias(
                "d"
            ),
        )
        .groupBy("n1", "n2")
        .agg(F.max("d").alias("ks_num"))
        .select(
            "n1",
            "n2",
            "ks_num",
            F.round(
                F.col("ks_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ).alias("ks_stat"),
        )
    )


SRC_TOP_K = 5  # head terms per source


def q_top_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: the 5 most frequent terms per source with a
    deterministic (count desc, term) rank — q_vocab_topk's per-group
    form (the "what does each crawl talk about" profile). The rank
    window runs per source over the vocab-sized count frame; at any
    corpus size that frame is |vocab × sources|, never rows."""
    doc = load_table(spark, sf_dir, "documents")
    words = doc.select(
        "source", F.explode(F.split("text", " ")).alias("term")
    ).where(F.length("term") > 0)
    counts = words.groupBy("source", "term").agg(F.count("*").alias("n"))
    rk = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(rk).cast("bigint"))
        .where(F.col("rank") <= SRC_TOP_K)
    )


GROWTH_BUCKET = 50  # documents per growth-curve point


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth per source: as documents
    accumulate (in doc_id order, bucketed 50 docs per point), the
    cumulative token count and cumulative distinct vocabulary — the
    curve that exposes templated/duplicated crawls (vocabulary
    flat-lining while tokens grow).

    Cumulative-distinct is made one-pass by attributing each word to
    the bucket of its FIRST occurrence (min doc_id per (source,
    word)) and cumulatively summing first-occurrence counts — no
    per-prefix re-distincting. The cumulative window runs over curve
    points (buckets), not rows."""
    doc = load_table(spark, sf_dir, "documents")
    bucket = F.expr(f"doc_id div {GROWTH_BUCKET}")
    words = doc.select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)
    toks = words.groupBy("source", bucket.alias("bucket")).agg(
        F.count("*").alias("n_tokens")
    )
    firsts = (
        words.groupBy("source", "w")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(
            "source",
            F.expr(f"first_doc div {GROWTH_BUCKET}").alias("bucket"),
        )
        .agg(F.count("*").alias("new_words"))
    )
    joined = toks.join(firsts, ["source", "bucket"], "left").na.fill(
        0, ["new_words"]
    )
    w = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "source",
        "bucket",
        "n_tokens",
        "new_words",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("new_words").over(w).alias("cum_vocab"),
    )


KP_TOPK = 3  # keyphrases reported per document


def q_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the indexing/
    curation primitive the text family still lacked: candidate phrases
    are maximal stopword-free word runs, per-document word scores are
    degree/freq (degree(w) = Σ phrase length over w's occurrences,
    freq(w) = w's occurrence count), and a phrase scores the sum of
    its words' scores; top KP_TOPK phrases per doc.

    Engine-exact formulation: phrase extraction is gaps-and-islands
    over positioned words (pos − row_number over non-stop rows — the
    q_dup_spans machinery), word scores are half-up integer millionths
    of the exact degree/freq rational, and the phrase score is the
    integer SUM of its member-word micros (per occurrence) — so the
    whole extraction hash-checks against DuckDB. Ties break by phrase
    text then start position.

    Scale: one narrow scan explodes to positioned words (zero
    shuffle), one (doc, island) aggregate and one (doc, word)
    aggregate — both partition on doc-sized keys, per-task state
    bounded by one document. The stopword set ships as a literal
    (dimension-in-the-plan, the broadcast-dictionary pattern)."""
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = doc.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    ).where(F.length("w") > 0)
    nonstop = words.where(~F.col("w").isin(STOPWORDS))
    wn = Window.partitionBy("doc_id").orderBy("pos")
    islands = nonstop.withColumn(
        "island", F.col("pos") - F.row_number().over(wn)
    )
    # per-phrase rows (phrase text in word order) + length
    phrases = islands.groupBy("doc_id", "island").agg(
        F.concat_ws(
            " ", F.array_sort(F.collect_list(F.struct("pos", "w"))).getField("w")
        ).alias("phrase"),
        F.count("*").alias("plen"),
        F.min("pos").alias("start_pos"),
    )
    # per-document word stats over phrase members
    member = islands.join(
        phrases.select("doc_id", "island", "plen"), ["doc_id", "island"]
    )
    wstats = member.groupBy("doc_id", "w").agg(
        F.count("*").alias("freq"),
        F.sum("plen").alias("degree"),
    )
    wscore = wstats.select(
        "doc_id",
        "w",
        F.expr("(2 * degree * 1000000 + freq) div (2 * freq)").alias(
            "w_micros"
        ),
    )
    scored = (
        member.join(wscore, ["doc_id", "w"])
        .groupBy("doc_id", "island")
        .agg(F.sum("w_micros").alias("score_micros"))
        .join(phrases, ["doc_id", "island"])
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score_micros").desc(), "phrase", "start_pos"
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= KP_TOPK)
        .select("doc_id", "rank", "phrase", "plen", "score_micros")
    )


def term_source_counts(doc: DataFrame) -> DataFrame:
    """(source, term) exact counts — the linear partial of the
    trending-terms tier: one fact-sized map-side-combinable exchange,
    associative under sum-merge (per-micro-batch partials merge to
    exactly the one-pass frame, api.maintain_trending_terms_stream).
    Terms are whitespace tokens (the q_token_count convention) with
    stopwords dropped — trending 'the' is noise by definition."""
    return (
        doc.select(
            "source", F.explode(F.split("text", " ")).alias("term")
        )
        .where(
            (F.length("term") > 0) & (~F.col("term").isin(STOPWORDS))
        )
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )


def trending_from_term_counts(counts: DataFrame) -> DataFrame:
    """Shared finalize: the heavy-hitter tier summarization
    (aggregates.hh_from_day_counts) applied with `source` in the day
    role — per source the exact term counts collapse to a bounded
    top-K + residual tier, and any term's corpus-wide count lies in
    the deterministic [lb, ub] those tiers imply. Batch query and
    streamed read path both call THIS function, so streamed == batch
    is structural."""
    from timeseriesdb_spark.operators.aggregates import (
        hh_from_day_counts,
    )

    tier = counts.select(
        F.col("source").alias("day"), F.col("term").alias("key"), "cnt"
    )
    return hh_from_day_counts(tier).select(
        "hh_rank", F.col("key").alias("term"), "lb", "ub", "exact_n"
    )


def q_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending terms across sources — the streamed-text tier the
    heavy-hitter machinery gives for free (r8 judge item 8): a
    (source, term) count tier (mergeable, bounded per source after
    summarization) finalized by the SpaceSaving-style top-K + residual
    summary, so the corpus-wide hot vocabulary surfaces with
    deterministic [lb, ub] bounds even though no single source tier
    kept every term. q_top_terms_by_source is the plain grouped
    top-k; THIS is the maintained-store form — streamed maintenance
    (api.maintain_trending_terms_stream) equals this batch query
    exactly on the shared finalize, compaction-invariant
    (tests/test_streaming_trending.py). All integer arithmetic with
    total-order tie-breaks → hash-checked cross-engine."""
    doc = load_table(spark, sf_dir, "documents")
    return trending_from_term_counts(term_source_counts(doc))


BACKOFF_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)


def q_bigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score with stupid backoff — the CCNet-style
    perplexity filter one rung above q_unigram_logprob: train bigram/
    unigram counts on the TRAIN hash split (q_dataset_split's md5
    bounds, so the LM never sees val/test text), then score EVERY
    document's adjacent word pairs: s(w2|w1) = c12/c1 when the bigram
    was seen in training, else α·(c2+1)/(N+V) (add-one unigram
    backoff — OOV words bottom out at 1/(N+V)). Emits the per-doc
    mean log10 score plus the backoff count (the out-of-LM rate, a
    quality column in its own right: templated text backs off rarely,
    gibberish constantly).

    Determinism: every probability is a ratio of exact integers (the
    α product is a fixed two-op IEEE chain), log10 rounds to 6dp per
    bigram BEFORE accumulation, sums are decimal, and the mean is the
    sign-branched half-up integer division — the q_unigram_logprob
    discipline. Shape: two train-split count shuffles; the count
    tables broadcast back onto the token stream (at 100 TB floor them
    with min-count like any production LM); one per-doc shuffle."""
    from timeseriesdb_spark.operators.common import array_ngrams

    doc = load_table(spark, sf_dir, "documents")
    warr = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    lo = SPLIT_BOUNDS[0]
    train = doc.where(F.substring(F.md5(F.col("text")), 1, 2) < F.lit(lo))
    # one pass over the train split: N (token count) and V (vocab)
    # both come off the checkpointed unigram table — N = Σc1 — so the
    # explode/split runs once, not three times (ADVICE r11), and the
    # two broadcast self-views below reuse the same checkpoint
    tuni = (
        train.select(F.explode(warr).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint()
    )
    tbi = (
        train.select(F.explode(array_ngrams(warr, 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c12"))
    )
    n_v = tuni.agg(F.sum("c1"), F.count("*")).first()
    nv = float(int(n_v[0] or 0) + int(n_v[1]))
    docbg = doc.select(
        "doc_id", F.explode(array_ngrams(warr, 2)).alias("bg")
    )
    parts = F.split("bg", " ")
    j = (
        docbg.join(F.broadcast(tbi), "bg", "left")
        .withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(
            F.broadcast(tuni.select(F.col("w").alias("w1"), "c1")),
            "w1",
            "left",
        )
        .join(
            F.broadcast(
                tuni.select(F.col("w").alias("w2"), F.col("c1").alias("c2"))
            ),
            "w2",
            "left",
        )
    )
    seen = F.col("c12").isNotNull()
    p = F.when(seen, F.col("c12") / F.col("c1")).otherwise(
        F.lit(BACKOFF_ALPHA)
        * ((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)) / F.lit(nv))
    )
    lp = F.round(F.log10(p), 6)
    agg = (
        j.select("doc_id", lp.alias("lp"), seen.alias("hit"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count(F.when(~F.col("hit"), 1)).alias("n_backoff"),
            (F.sum(F.col("lp").cast("decimal(38,6)")) * F.lit(1_000_000))
            .cast("long")
            .alias("_u"),
        )
    )
    q = F.expr(
        "CASE WHEN _u >= 0 THEN (2 * _u + n_bigrams) div (2 * n_bigrams) "
        "ELSE -((2 * -_u + n_bigrams) div (2 * n_bigrams)) END"
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "n_backoff",
        (q.cast("double") / F.lit(1_000_000.0)).alias("mean_lp10"),
    )


QUERIES = {
    "q_trending_terms": q_trending_terms,
    "q_bigram_backoff": q_bigram_backoff,
    "q_keyphrases": q_keyphrases,
    "q_regex_tokens": q_regex_tokens,
    "q_pmi_bigrams": q_pmi_bigrams,
    "q_bigram_lm": q_bigram_lm,
    "q_source_overlap": q_source_overlap,
    "q_hashing_features": q_hashing_features,
    "q_idf_rarity": q_idf_rarity,
    "q_unigram_logprob": q_unigram_logprob,
    "q_dataset_split": q_dataset_split,
    "q_tfidf_top_terms": q_tfidf_top_terms,
    "q_props_extract": q_props_extract,
    "q_token_count": q_token_count,
    "q_lang_id": q_lang_id,
    "q_quality_score": q_quality_score,
    "q_fingerprint": q_fingerprint,
    "q_text_stats": q_text_stats,
    "q_zipf_slope": q_zipf_slope,
    "q_length_ks": q_length_ks,
    "q_vocab_growth": q_vocab_growth,
    "q_top_terms_by_source": q_top_terms_by_source,
}

_OCC = "CAST((length({p}) - length(replace({p}, '{m}', ''))) / {ml} AS BIGINT)"


def _occ_sql(marker: str) -> str:
    p = "(' ' || text || ' ')"
    return f"((length({p}) - length(replace({p}, '{marker}', ''))) / {len(marker)})"


_SCORES = {lang: _occ_sql(m) for lang, m in LANG_MARKERS}
_MX = "greatest(" + ", ".join(_SCORES.values()) + ")"
_PRED = "CASE "
for _lang, _ in LANG_MARKERS:
    _PRED += f"WHEN {_MX} > 0 AND {_SCORES[_lang]} = {_MX} THEN '{_lang}' "
_PRED += "ELSE 'und' END"

def _keyphrases_oracle() -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH wordsx AS (
            SELECT doc_id, i - 1 AS pos, w
            FROM (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS i
                FROM documents
            )
            WHERE length(w) > 0
        ),
        isl AS (
            SELECT doc_id, pos, w,
                   pos - row_number() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS island
            FROM wordsx WHERE w NOT IN ({stop_list})
        ),
        ph AS (
            SELECT doc_id, island,
                   string_agg(w, ' ' ORDER BY pos) AS phrase,
                   CAST(count(*) AS BIGINT) AS plen,
                   min(pos) AS start_pos
            FROM isl GROUP BY 1, 2
        ),
        member AS (
            SELECT i.doc_id, i.island, i.w, p.plen
            FROM isl i JOIN ph p USING (doc_id, island)
        ),
        wscore AS (
            SELECT doc_id, w,
                   (2 * CAST(sum(plen) AS BIGINT) * 1000000 + count(*))
                       // (2 * count(*)) AS w_micros
            FROM member GROUP BY 1, 2
        ),
        sc AS (
            SELECT m.doc_id, m.island,
                   CAST(sum(s.w_micros) AS BIGINT) AS score_micros
            FROM member m JOIN wscore s USING (doc_id, w)
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT p.doc_id, p.phrase, p.plen, sc.score_micros,
                   CAST(row_number() OVER (
                       PARTITION BY p.doc_id
                       ORDER BY sc.score_micros DESC, p.phrase,
                                p.start_pos) AS INT) AS rank
            FROM sc JOIN ph p USING (doc_id, island)
        )
        SELECT doc_id, rank, phrase, plen, score_micros
        FROM ranked WHERE rank <= {KP_TOPK}
    """


def _trending_terms_oracle() -> str:
    from timeseriesdb_spark.operators.aggregates import HH_K, HH_M

    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH day_counts AS (
            SELECT source AS day, term AS key, count(*) AS cnt
            FROM (SELECT source,
                         unnest(string_split(text, ' ')) AS term
                  FROM documents)
            WHERE length(term) > 0 AND term NOT IN ({stoplist})
            GROUP BY 1, 2
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
        SELECT hh_rank, key AS term, lb, ub, exact_n
        FROM scored WHERE hh_rank <= {HH_M}
    """


ORACLES = {
    "q_trending_terms": _trending_terms_oracle(),
    "q_keyphrases": _keyphrases_oracle(),
    "q_top_terms_by_source": f"""
        SELECT source, term, n, rank FROM (
            SELECT source, term, n,
                   CAST(row_number() OVER (PARTITION BY source
                                           ORDER BY n DESC, term)
                        AS BIGINT) AS rank
            FROM (
                SELECT source, term, count(*) AS n
                FROM (SELECT source,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents)
                WHERE length(term) > 0 GROUP BY source, term
            )
        ) WHERE rank <= {SRC_TOP_K}
    """,
    "q_zipf_slope": f"""
        WITH counts AS (
            SELECT source, w, count(*) AS c FROM (
                SELECT source, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE length(w) > 0 GROUP BY source, w
        ),
        ranked AS (
            SELECT source, c,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY c DESC, w) AS rank
            FROM counts
        ),
        t AS (
            SELECT source,
                   round(ln(CAST(rank AS DOUBLE)), 9) AS lx,
                   round(ln(CAST(c AS DOUBLE)), 9) AS ly
            FROM ranked WHERE rank <= {ZIPF_TOP}
        ),
        m AS (
            SELECT source, CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CAST(lx AS DECIMAL(38,9))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(ly AS DECIMAL(38,9))) AS DOUBLE) AS sy,
                   CAST(sum(CAST(round(lx * ly, 9) AS DECIMAL(38,9)))
                        AS DOUBLE) AS sxy,
                   CAST(sum(CAST(round(lx * lx, 9) AS DECIMAL(38,9)))
                        AS DOUBLE) AS sxx
            FROM t GROUP BY source
        )
        SELECT source, CAST(n AS BIGINT) AS n_terms,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n, 6) AS intercept
        FROM m
    """,
    "q_length_ks": f"""
        WITH b AS (
            SELECT n_chars,
                   CAST(count(*) FILTER (source = '{KS_SRC_A}') AS BIGINT)
                       AS c1,
                   CAST(count(*) FILTER (source = '{KS_SRC_B}') AS BIGINT)
                       AS c2
            FROM documents
            WHERE source IN ('{KS_SRC_A}', '{KS_SRC_B}')
            GROUP BY n_chars
        ),
        t AS (
            SELECT CAST(sum(c1) AS BIGINT) AS n1,
                   CAST(sum(c2) AS BIGINT) AS n2
            FROM b
        ),
        c AS (
            SELECT CAST(sum(c1) OVER w AS BIGINT) AS u1,
                   CAST(sum(c2) OVER w AS BIGINT) AS u2
            FROM b WINDOW w AS (ORDER BY n_chars
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)
        )
        SELECT n1, n2, max(abs(u1 * n2 - u2 * n1)) AS ks_num,
               round(CAST(max(abs(u1 * n2 - u2 * n1)) AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
                   AS ks_stat
        FROM c, t GROUP BY n1, n2
    """,
    "q_vocab_growth": f"""
        WITH words AS (
            SELECT source, doc_id, w FROM (
                SELECT source, doc_id,
                       unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE length(w) > 0
        ),
        toks AS (
            SELECT source, doc_id // {GROWTH_BUCKET} AS bucket,
                   count(*) AS n_tokens
            FROM words GROUP BY 1, 2
        ),
        firsts AS (
            SELECT source, first_doc // {GROWTH_BUCKET} AS bucket,
                   count(*) AS new_words
            FROM (SELECT source, w, min(doc_id) AS first_doc
                  FROM words GROUP BY source, w)
            GROUP BY 1, 2
        )
        SELECT t.source, t.bucket, t.n_tokens,
               COALESCE(f.new_words, 0) AS new_words,
               CAST(sum(t.n_tokens) OVER w AS BIGINT) AS cum_tokens,
               CAST(sum(COALESCE(f.new_words, 0)) OVER w AS BIGINT)
                   AS cum_vocab
        FROM toks t LEFT JOIN firsts f
             ON t.source = f.source AND t.bucket = f.bucket
        WINDOW w AS (PARTITION BY t.source ORDER BY t.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q_regex_tokens": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{BPE_SPLIT_PATTERN}'))
                    AS BIGINT) AS n_regex_tokens,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_ws_tokens,
               round(len(regexp_extract_all(text, '{BPE_SPLIT_PATTERN}'))
                     / CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS DOUBLE), 6) AS tokens_per_word
        FROM documents
    """,
    "q_pmi_bigrams": f"""
        WITH toks AS (
            SELECT doc_id, w, i FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS i
                FROM documents
            ) WHERE length(w) > 0
        ),
        seq AS (
            SELECT doc_id, w,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
            FROM toks
        ),
        bg2 AS (
            SELECT bg FROM (
                SELECT w || ' ' || lead(w, 1)
                       OVER (PARTITION BY doc_id ORDER BY j) AS bg
                FROM seq
            ) WHERE bg IS NOT NULL
        ),
        uni AS (SELECT w, count(*) AS c FROM seq GROUP BY w),
        bic AS (
            SELECT bg, count(*) AS c_ab FROM bg2 GROUP BY bg
            HAVING count(*) >= {PMI_MIN_PAIR}
        ),
        nu AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seq),
        nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bg2)
        SELECT bg, c_ab, ua.c AS c_a, ub.c AS c_b,
               round(ln((c_ab / nb.n) / ((ua.c / nu.n) * (ub.c / nu.n))), 6)
                   + 0.0 AS pmi
        FROM bic
        JOIN uni ua ON ua.w = string_split(bg, ' ')[1]
        JOIN uni ub ON ub.w = string_split(bg, ' ')[2]
        CROSS JOIN nu CROSS JOIN nb
    """,
    "q_bigram_lm": f"""
        WITH toks AS (
            SELECT doc_id, w, i FROM (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS i
                FROM documents
            ) WHERE length(w) > 0
        ),
        clean AS (
            SELECT doc_id, w,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
            FROM toks
        ),
        pairs AS (
            SELECT w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY j) AS w2
            FROM clean
        ),
        bi AS (
            SELECT w1, w2, count(*) AS c_pair FROM pairs
            WHERE w2 IS NOT NULL GROUP BY 1, 2
        ),
        r AS (
            SELECT w1, w2, CAST(c_pair AS BIGINT) AS c_pair,
                   CAST(sum(c_pair) OVER (PARTITION BY w1) AS BIGINT)
                       AS c_ctx,
                   row_number() OVER (PARTITION BY w1
                                      ORDER BY c_pair DESC, w2) AS rn
            FROM bi
        )
        SELECT w1, w2, c_pair, c_ctx,
               CAST(c_pair AS DOUBLE) / c_ctx AS p_next,
               CAST(rn AS INT) AS rn
        FROM r WHERE c_ctx >= {LM_MIN_CONTEXT} AND rn <= {LM_TOP}
    """,
    "q_unigram_logprob": """
        WITH words AS (
            SELECT doc_id, w FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE length(w) > 0
        ),
        tf AS (SELECT w, count(*) AS tf FROM words GROUP BY w),
        scored AS (
            SELECT doc_id,
                   round(log10(CAST(tf.tf AS DOUBLE) /
                               (SELECT CAST(count(*) AS DOUBLE)
                                FROM words)), 6) AS lp
            FROM words JOIN tf USING (w)
        ),
        agg AS (
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(CAST(lp AS DECIMAL(38,6))) * 1000000
                        AS BIGINT) AS u
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_tokens,
               CAST(CASE WHEN u >= 0
                         THEN (2 * u + n_tokens) // (2 * n_tokens)
                         ELSE -((2 * -u + n_tokens) // (2 * n_tokens)) END
                    AS DOUBLE) / 1000000.0 AS mean_logp10
        FROM agg
    """,
    "q_bigram_backoff": f"""
        WITH toks AS (
            SELECT doc_id, w, i FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS i
                FROM documents
            ) WHERE length(w) > 0
        ),
        seq AS (
            SELECT doc_id, w,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
            FROM toks
        ),
        docbg AS (
            SELECT doc_id, bg FROM (
                SELECT doc_id, w || ' ' || lead(w, 1)
                       OVER (PARTITION BY doc_id ORDER BY j) AS bg
                FROM seq
            ) WHERE bg IS NOT NULL
        ),
        train AS (
            SELECT doc_id FROM documents
            WHERE substring(md5(text), 1, 2) < '{SPLIT_BOUNDS[0]}'
        ),
        ttoks AS (SELECT s.doc_id, s.w FROM seq s JOIN train USING (doc_id)),
        tuni AS (SELECT w, count(*) AS c1 FROM ttoks GROUP BY w),
        tbi AS (
            SELECT bg, count(*) AS c12
            FROM docbg JOIN train USING (doc_id) GROUP BY bg
        ),
        nv AS (SELECT CAST((SELECT count(*) FROM ttoks)
                         + (SELECT count(*) FROM tuni) AS DOUBLE) AS x),
        scored AS (
            SELECT d.doc_id,
                   round(log10(CASE WHEN b.c12 IS NOT NULL
                                    THEN CAST(b.c12 AS DOUBLE) / u1.c1
                                    ELSE 4e-1 * ((coalesce(u2.c1, 0) + 1)
                                                 / nv.x)
                               END), 6) AS lp,
                   b.c12 IS NOT NULL AS hit
            FROM docbg d
            LEFT JOIN tbi b USING (bg)
            LEFT JOIN tuni u1 ON u1.w = string_split(d.bg, ' ')[1]
            LEFT JOIN tuni u2 ON u2.w = string_split(d.bg, ' ')[2]
            CROSS JOIN nv
        ),
        agg AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   count(CASE WHEN NOT hit THEN 1 END) AS n_backoff,
                   CAST(sum(CAST(lp AS DECIMAL(38,6))) * 1000000
                        AS BIGINT) AS u
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams, n_backoff,
               CAST(CASE WHEN u >= 0
                         THEN (2 * u + n_bigrams) // (2 * n_bigrams)
                         ELSE -((2 * -u + n_bigrams) // (2 * n_bigrams))
                    END AS DOUBLE) / 1000000.0 AS mean_lp10
        FROM agg
    """,
    "q_idf_rarity": """
        WITH words AS (
            SELECT DISTINCT doc_id, w FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE length(w) > 0
        ),
        df AS (SELECT w, count(*) AS df FROM words GROUP BY w),
        scored AS (
            SELECT doc_id,
                   round(ln((SELECT CAST(count(*) AS DOUBLE)
                             FROM documents) / df.df), 6) AS idf
            FROM words JOIN df USING (w)
        )
        SELECT doc_id, n_terms,
               CAST((2 * u + n_terms) // (2 * n_terms) AS DOUBLE)
                   / 1000000.0 AS mean_idf
        FROM (
            SELECT doc_id, count(*) AS n_terms,
                   CAST(sum(CAST(idf AS DECIMAL(38,6))) * 1000000
                        AS BIGINT) AS u
            FROM scored GROUP BY doc_id
        )
    """,
    "q_source_overlap": f"""
        WITH toks AS (
            SELECT doc_id, source, w, i FROM (
                SELECT doc_id, source,
                       unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS i
                FROM documents
            ) WHERE length(w) > 0
        ),
        seq AS (
            SELECT doc_id, source, w,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
            FROM toks
        ),
        ngrams0 AS (
            SELECT DISTINCT source, ng FROM (
                SELECT source,
                       w || ' ' || lead(w, 1) OVER win
                         || ' ' || lead(w, 2) OVER win AS ng
                FROM seq WINDOW win AS (PARTITION BY doc_id ORDER BY j)
            ) WHERE ng IS NOT NULL
        ),
        ngrams AS (
            SELECT source, ng FROM (
                SELECT source, ng,
                       count(*) OVER (PARTITION BY ng) AS nsrc
                FROM ngrams0
            ) WHERE nsrc <= {OVERLAP_SRC_CAP}
        ),
        sizes AS (SELECT source, count(*) AS n_ng FROM ngrams GROUP BY source),
        inter AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_inter
            FROM ngrams a JOIN ngrams b
              ON a.ng = b.ng AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, n_inter,
               round(n_inter
                     / CAST(sa.n_ng + sb.n_ng - n_inter AS DOUBLE), 6)
                   AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = source_a
        JOIN sizes sb ON sb.source = source_b
    """,
    "q_hashing_features": f"""
        WITH words AS (
            SELECT doc_id, w FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE length(w) > 0
        ),
        h AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h
            FROM words
        )
        SELECT doc_id, bucket, weight FROM (
            SELECT doc_id, h % {HASH_DIM} AS bucket,
                   CAST(sum(CASE WHEN CAST(floor(h / {HASH_DIM}.0) AS BIGINT)
                                      % 2 = 0
                            THEN 1 ELSE -1 END) AS BIGINT) AS weight
            FROM h GROUP BY doc_id, h % {HASH_DIM}
        ) WHERE weight <> 0
    """,
    "q_token_count": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_txt,
               CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                   AS n_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords
        FROM documents
    """,
    "q_lang_id": (
        "SELECT doc_id, lang, "
        + ", ".join(
            f"CAST({_SCORES[lang]} AS BIGINT) AS score_{lang}"
            for lang, _ in LANG_MARKERS
        )
        + f", {_PRED} AS pred_lang FROM documents"
    ),
    "q_quality_score": """
        SELECT doc_id,
            round((length(text) - (length(text) - length(replace(text,' ',''))))
                  / ((length(text) - length(replace(text,' ',''))) + 1.0), 6)
                AS mean_word_len,
            round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                  / CAST(length(text) AS DOUBLE), 6) AS alpha_ratio,
            round(0.4 * least(length(text) / 500.0, 1.0)
                + 0.4 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         / CAST(length(text) AS DOUBLE))
                + 0.2 * ((length(text) - length(replace(text,' ','')))
                         / CAST(length(text) AS DOUBLE)), 6) AS quality_score
        FROM documents
    """,
    "q_fingerprint": r"""
        SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        FROM documents
    """,
    "q_text_stats": """
        SELECT source, count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               round(avg(length(text)), 6) AS avg_chars
        FROM documents GROUP BY source
    """,
    "q_dataset_split": f"""
        SELECT doc_id, substr(md5(text), 1, 2) AS hash_prefix,
               CASE WHEN substr(md5(text), 1, 2) < '{SPLIT_BOUNDS[0]}'
                        THEN 'train'
                    WHEN substr(md5(text), 1, 2) < '{SPLIT_BOUNDS[1]}'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "q_tfidf_top_terms": f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ), tf AS (
            SELECT doc_id, w, count(*) AS tf FROM words
            WHERE length(w) > 0 GROUP BY doc_id, w
        ), df AS (
            SELECT w, count(*) AS df FROM tf GROUP BY w
        ), scored AS (
            SELECT tf.doc_id, tf.w, tf.tf, df.df,
                   round(tf.tf * ln((SELECT CAST(count(*) AS DOUBLE)
                                     FROM documents) / df.df), 6) + 0.0
                       AS tfidf
            FROM tf JOIN df USING (w)
        )
        SELECT doc_id, w AS term, tf, df, tfidf, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, w) AS rn
            FROM scored
        ) WHERE rn <= {TFIDF_TOP}
    """,
    "q_props_extract": """
        SELECT event_type, count(k) AS n, min(k) AS min_k, max(k) AS max_k,
               CAST(sum(k) AS BIGINT) AS sum_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        ) GROUP BY event_type
    """,
}
