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


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc decimal BM25 total (`doc_id`, `score_d`) for the fixed
    query term set — shared by q_bm25's top-k and q_hybrid_rrf's text
    leg. See q_bm25 for the scoring/determinism discipline."""
    doc = load_table(spark, sf_dir, "documents")
    nonempty = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    # N and avgdl as a 1-row broadcast CROSS JOIN — the oracle's own
    # shape — instead of a collect() at plan build (r15): the collect
    # serialized a full corpus tokenize pass BEFORE the main job could
    # start; in-plan the scalar subtree runs inside the one job. Value
    # parity is exact: cast(bigint as double) is the same conversion
    # float() did, and the division/idf chains keep the identical
    # left-associative IEEE order the Python-literal form compiled to.
    corpus = doc.agg(
        F.count("*").alias("_n"),
        F.sum(F.size(nonempty)).alias("_total"),
    )

    words = _words(doc)
    dl = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf = (
        words.filter(F.col("w").isin(BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))

    nd = F.col("_n").cast("double")
    avgdl = F.col("_total").cast("double") / nd
    idf = F.log(
        (nd - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_part = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl") / avgdl
        )
    )
    term_score = F.round(idf * tf_part, 6).cast("decimal(38,6)")

    return (
        tf.join(df_, "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score_d"))
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
    scored = _bm25_scored(spark, sf_dir)
    rank = Window.orderBy(F.col("score_d").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") <= BM25_TOP)
        .select(
            "doc_id", F.col("score_d").cast("double").alias("score"), "rn"
        )
    )


def write_postings_store(doc: DataFrame, path: str) -> None:
    """Stored inverted index: full (term, doc_id, tf) postings laid
    out as parquet partitioned by 2-char TERM PREFIX — the
    materialization q_inverted_index's bounded result points at. The
    prefix keeps directory count bounded (alphabet², independent of
    vocab size) while a term probe prunes to one directory; within a
    partition rows sort by (term, doc_id), so row-group min/max stats
    narrow the scan to the probed term's groups. Same design as the
    stored-IVF layout (similarity.write_ivf_store): the index
    structure IS the partition scheme."""
    tf = (
        _words(doc)
        .groupBy("w", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("pfx", F.substring("w", 1, 2))
    )
    (
        tf.repartition("pfx")
        .sortWithinPartitions("pfx", "w", "doc_id")
        .write.partitionBy("pfx")
        .mode("overwrite")
        .parquet(path)
    )


def postings_probe(spark: SparkSession, path: str, terms: list[str]) -> DataFrame:
    """Read the postings of `terms` from a write_postings_store layout:
    the prefix predicate becomes PartitionFilters (directories never
    opened), the term predicate reaches PushedFilters (row-group
    pruning within the partition)."""
    pfx = sorted({t[:2] for t in terms})
    return (
        spark.read.parquet(path)
        .filter(F.col("pfx").isin(pfx))
        .filter(F.col("w").isin(terms))
        .select("w", "doc_id", "tf")
    )


RRF_K = 60     # reciprocal-rank-fusion damping constant
RRF_POOL = 20  # per-leg candidate pool depth
RRF_TOP = 10   # fused results returned


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and quantized-dot-product
    (vector) candidate lists fused with Reciprocal Rank Fusion —
    score = Σ_legs 1/(K + rank). The standard production pattern for
    combining an inverted index with an ANN index over the same
    corpus (documents ⋈ embeddings on doc_id = vec_id here).

    Determinism: both legs rank on exact quantities (decimal BM25
    totals, integer quantized dots) with id tie-breaks, and the RRF
    terms 1/(K+rank) are identical-operand IEEE divisions, so the
    fused ordering is engine-exact. Absent legs report rank 0 (keeps
    the column integral; the fused score contributes nothing). Shape:
    each leg is its own bounded top-RRF_POOL (tiny), fused by a
    doc_id full-outer join of two ≤RRF_POOL-row frames — free at any
    corpus size."""
    from timeseriesdb_spark.operators.similarity import (
        QUANT_SCALE,
        QUERY_VEC_ID,
    )

    scored = _bm25_scored(spark, sf_dir)
    wt = Window.orderBy(F.col("score_d").desc(), F.col("doc_id"))
    text_ranks = (
        scored.withColumn("rank_text", F.row_number().over(wt))
        .filter(F.col("rank_text") <= RRF_POOL)
        .select("doc_id", "rank_text")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qz = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"),
    )
    emb_q = emb.withColumn("qe", qz)
    probe = emb_q.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("qe").alias("qq")
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("qq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wv = Window.orderBy(F.col("qdot").desc(), F.col("vec_id"))
    vec_ranks = (
        emb_q.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", qdot.alias("qdot"))
        .withColumn("rank_vec", F.row_number().over(wv))
        .filter(F.col("rank_vec") <= RRF_POOL)
        .select(F.col("vec_id").alias("doc_id"), "rank_vec")
    )

    fused = text_ranks.join(vec_ranks, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_text")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0)),
        6,
    )
    return (
        fused.select(
            "doc_id",
            F.coalesce("rank_text", F.lit(0)).alias("rank_text"),
            F.coalesce("rank_vec", F.lit(0)).alias("rank_vec"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(RRF_TOP)
    )


QUERIES = {
    "q_inverted_index": q_inverted_index,
    "q_bm25": q_bm25,
    "q_hybrid_rrf": q_hybrid_rrf,
}

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

# Shared BM25 CTE chain (words → … → scored) used by q_bm25 and the
# q_hybrid_rrf text leg — one source, so the fragments cannot drift.
_BM25_SCORED_CTES = f"""
        words AS (
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
"""

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
        WITH {_BM25_SCORED_CTES}
        SELECT doc_id, CAST(score_d AS DOUBLE) AS score, rn
        FROM (SELECT doc_id, score_d,
                     row_number() OVER (ORDER BY score_d DESC, doc_id) AS rn
              FROM scored)
        WHERE rn <= {BM25_TOP}
    """,
}


def _rrf_oracle() -> str:
    from timeseriesdb_spark.operators.similarity import (
        DIM,
        QUANT_SCALE,
        QUERY_VEC_ID,
    )

    return f"""
        WITH {_BM25_SCORED_CTES},
        tr AS (
            SELECT doc_id, rank_text FROM (
                SELECT doc_id,
                       row_number() OVER (ORDER BY score_d DESC, doc_id)
                           AS rank_text
                FROM scored)
            WHERE rank_text <= {RRF_POOL}
        ),
        qv AS (
            SELECT i,
                   CAST(round(CAST(embedding[i] AS DOUBLE) * {QUANT_SCALE})
                        AS BIGINT) AS qx
            FROM embeddings, range(1, {DIM + 1}) t(i)
            WHERE vec_id = {QUERY_VEC_ID}
        ),
        vd AS (
            SELECT e.vec_id,
                   CAST(sum(CAST(round(CAST(e.embedding[t.ti] AS DOUBLE)
                                       * {QUANT_SCALE}) AS BIGINT) * qv.qx)
                        AS BIGINT) AS qdot
            FROM embeddings e
            CROSS JOIN range(1, {DIM + 1}) t(ti)
            JOIN qv ON qv.i = t.ti
            WHERE e.vec_id != {QUERY_VEC_ID}
            GROUP BY e.vec_id
        ),
        vr AS (
            SELECT vec_id AS doc_id, rank_vec FROM (
                SELECT vec_id,
                       row_number() OVER (ORDER BY qdot DESC, vec_id)
                           AS rank_vec
                FROM vd)
            WHERE rank_vec <= {RRF_POOL}
        ),
        fused AS (
            SELECT COALESCE(tr.doc_id, vr.doc_id) AS doc_id,
                   CAST(COALESCE(tr.rank_text, 0) AS BIGINT) AS rank_text,
                   CAST(COALESCE(vr.rank_vec, 0) AS BIGINT) AS rank_vec,
                   round(COALESCE(CAST(1.0 AS DOUBLE)
                                  / ({RRF_K} + tr.rank_text), 0.0)
                       + COALESCE(CAST(1.0 AS DOUBLE)
                                  / ({RRF_K} + vr.rank_vec), 0.0), 6) AS rrf
            FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id
        )
        SELECT doc_id, rank_text, rank_vec, rrf FROM fused
        ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """


ORACLES["q_hybrid_rrf"] = _rrf_oracle()
