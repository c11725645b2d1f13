"""Ranked retrieval over the documents corpus: inverted-index stats
and BM25 scoring.

The reference has no text search, but its byte-plane "index on
compressed bytes + candidate refinement" posture (SURVEY.md §2.2,
split_double.rs:4983 progressive filters) maps to the retrieval-side
index of a training-data pipeline: build the term→postings index once,
answer ranked queries by touching only the terms in the query. These
are first-class LLM-pipeline operators (corpus search powers dataset
debugging, contamination audits, and eval-set retrieval).

Scale design:
- The index build is ONE explode + groupBy(term) shuffle; postings are
  emitted bounded (head of the sorted list) because at 100 TB the full
  postings live partitioned BY TERM PREFIX in the store, not in a
  query result. df/total_tf are the index's routing statistics.
- BM25 scans only rows containing a query term (filter pushed to the
  scan via array_contains on the split — Catalyst folds the tiny term
  list), so the corpus is read once and only matching docs shuffle.
- Determinism discipline (q_idf_rarity convention): ln() per term is
  rounded to 6dp BEFORE the per-doc decimal sum, so the float total
  is order-independent and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ["dup", "query", "merge"]  # one rare + two common terms
BM25_TOP = 10
POSTINGS_HEAD = 16  # doc ids reported per term (full list stays stored)


def _words(doc: DataFrame) -> DataFrame:
    return doc.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.length("w") > 0)


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, document frequency, total term
    frequency, and the head of the doc_id-sorted postings list.

    One shuffle builds (term, doc) tf partials; the bounded postings
    head keeps the result size O(vocab), not O(corpus) — the full
    postings would be written partitioned by term, and this query's
    aggregates are exactly the per-term footer stats that index
    needs for query routing."""
    doc = load_table(spark, sf_dir, "documents")
    tf = (
        _words(doc)
        .groupBy("w", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    head_rank = Window.partitionBy("w").orderBy("doc_id")
    heads = (
        tf.withColumn("rn", F.row_number().over(head_rank))
        .filter(F.col("rn") <= POSTINGS_HEAD)
        .groupBy("w")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    stats = tf.groupBy("w").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
    return (
        stats.join(heads, "w")
        .select(F.col("w").alias("term"), "df", "total_tf", "postings_head")
    )


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval for a fixed query term set.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N−df+0.5)/(df+0.5) + 1). N and avgdl fold as scalar
    literals (one tiny agg job at plan build — the q_tfidf_top_terms
    pattern); per-term scores are rounded to 6dp then decimal-summed
    per doc so the total is engine- and order-exact. Ranking breaks
    ties by doc_id; the result is the global top-k (tiny set —
    single-partition sort only over docs containing a query term)."""
    doc = load_table(spark, sf_dir, "documents")
    nonempty = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    corpus = doc.agg(
        F.count("*").alias("n"),
        F.sum(F.size(nonempty)).alias("total"),
    ).collect()[0]
    n_docs, avgdl = corpus["n"], corpus["total"] / corpus["n"]

    words = _words(doc)
    dl = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf = (
        words.filter(F.col("w").isin(BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))

    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_part = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl)
        )
    )
    term_score = F.round(idf * tf_part, 6).cast("decimal(38,6)")

    scored = (
        tf.join(df_, "w")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score_d"))
    )
    rank = Window.orderBy(F.col("score_d").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= BM25_TOP)
        .select(
            "doc_id", F.col("score_d").cast("double").alias("score"), "rn"
        )
    )


QUERIES = {
    "q_inverted_index": q_inverted_index,
    "q_bm25": q_bm25,
}

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

ORACLES = {
    "q_inverted_index": f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        tf AS (
            SELECT w, doc_id, count(*) AS tf FROM words
            WHERE length(w) > 0 GROUP BY w, doc_id
        ),
        ranked AS (
            SELECT w, doc_id,
                   row_number() OVER (PARTITION BY w ORDER BY doc_id) AS rn
            FROM tf
        )
        SELECT s.w AS term, s.df, s.total_tf, h.postings_head
        FROM (SELECT w, count(*) AS df,
                     CAST(sum(tf) AS BIGINT) AS total_tf
              FROM tf GROUP BY w) s
        JOIN (SELECT w, string_agg(CAST(doc_id AS VARCHAR), ','
                                   ORDER BY doc_id) AS postings_head
              FROM ranked
              WHERE rn <= {POSTINGS_HEAD} GROUP BY w) h
        USING (w)
    """,
    "q_bm25": f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        clean AS (SELECT * FROM words WHERE length(w) > 0),
        corpus AS (
            SELECT count(*)::DOUBLE AS n,
                   (SELECT count(*) FROM clean)::DOUBLE
                     / count(*) AS avgdl
            FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM clean GROUP BY doc_id),
        tf AS (
            SELECT doc_id, w, count(*) AS tf FROM clean
            WHERE w IN ({_TERMS_SQL}) GROUP BY doc_id, w
        ),
        df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        scored AS (
            SELECT tf.doc_id,
                   sum(CAST(round(
                       ln((corpus.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                       * (tf.tf * {BM25_K1 + 1.0})
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
                          + {BM25_B} * dl.dl / corpus.avgdl)), 6)
                       AS DECIMAL(38,6))) AS score_d
            FROM tf
            JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN corpus
            GROUP BY tf.doc_id
        )
        SELECT doc_id, CAST(score_d AS DOUBLE) AS score, rn
        FROM (SELECT doc_id, score_d,
                     row_number() OVER (ORDER BY score_d DESC, doc_id) AS rn
              FROM scored)
        WHERE rn <= {BM25_TOP}
    """,
}
