"""End-to-end training-data curation pipeline — the composition a
100 TB corpus actually runs, built from the operator building blocks:

    quality rules → exact dedup → near-dup cluster drop → split

`CurationPipeline.run(docs)` returns the curated corpus (lazy
DataFrame: doc_id, text, lang, source, split, n_tokens) and
`audit(docs)` the per-stage survivor counts. Beyond the individual
operators (each driver-checked on its own), the pipeline pins the
INTERACTION invariants a curation run must hold — every output doc
passes the rules, no two outputs share a fingerprint or a near-dup
cluster, splits partition the output — see tests/test_pipeline.py.

Scale shape: stages communicate only by doc_id semi/anti joins against
small decision frames (hash survivors, cluster survivors), never by
re-materializing text; the text column moves exactly once, at the
final write. Each stage's shuffle is on its own natural key (content
hash, shingle/band key, cluster label), so nothing accumulates state
and the whole pipeline streams corpus-sized input through
corpus-independent memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.operators import curation, dedup


class CurationPipeline:
    """Composable curation run over a documents-shaped frame
    (doc_id, text, lang, source, ...)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # ---- stages (each: docs -> surviving docs, same schema) ----------

    def quality_filter(self, docs: DataFrame) -> DataFrame:
        """Gopher-rule keep set (curation.q_gopher_rules semantics,
        recomputed inline so the pipeline works on any frame). The
        predicate parses from curation.KEEP_SQL — the SAME text the
        full-pipeline oracle filters with (r15 build-time pass: the
        Column fold was ~50 py4j round trips per invocation; Spark
        parses the identical length/replace arithmetic, and dropping
        the fold's leading +0 on non-negative doubles is exact)."""
        return docs.where(F.expr(curation.KEEP_SQL))

    def exact_dedup(self, docs: DataFrame) -> DataFrame:
        """Keep the min-doc_id survivor per whitespace-normalized
        lowercase content hash (q_fingerprint's canonical form)."""
        fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
        survivors = (
            docs.select(F.col("doc_id"), fp.alias("fp"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return docs.join(survivors, "doc_id", "semi")

    def neardup_dedup(self, docs: DataFrame) -> DataFrame:
        """Drop everything but the canonical survivor (min doc_id ==
        cluster label) of each near-dup cluster — connected components
        over the MinHash-LSH candidate graph (operators/dedup.py).
        Uses the dropped-ids fast path (neardup_dropped_ids): the
        pipeline only needs the drop SET, so the full cluster decision
        frame (singleton union, cluster-size aggregate + join) is
        never built — one anti-join against a dup-graph-sized frame
        instead (r9 q_curation profiling)."""
        return docs.join(
            dedup.neardup_dropped_ids(docs), "doc_id", "anti"
        )

    def assign_splits(self, docs: DataFrame) -> DataFrame:
        """Deterministic hash-range train/val/test + token budget
        columns (q_dataset_split / q_token_count semantics)."""
        prefix = F.substring(F.md5(F.col("text")), 1, 2)
        lo, hi = curation_split_bounds()
        split = (
            F.when(prefix < F.lit(lo), "train")
            .when(prefix < F.lit(hi), "val")
            .otherwise("test")
        )
        t = F.col("text")
        n_tokens = (
            F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
        ).cast("bigint")
        return docs.select(
            "doc_id", "text", "lang", "source",
            split.alias("split"), n_tokens.alias("n_tokens"),
        )

    def decontaminate(self, docs: DataFrame) -> DataFrame:
        """Drop train-range documents sharing a word n-gram with the
        test-range documents of the same frame (q_decontaminate
        semantics as a pipeline stage: the benchmark set is the
        pipeline's own held-out split, so eval leakage is removed
        before the corpus ships). Broadcast n-gram probe — the flagged
        set is decision-frame-sized, the corpus moves nowhere."""
        from timeseriesdb_spark.operators.curation import (
            DECON_N,
            TEST_BOUND,
            TRAIN_BOUND,
            _word_ngrams,
        )

        hp = F.substring(F.md5(F.col("text")), 1, 2)
        tagged = docs.select("doc_id", hp.alias("hp"), _word_ngrams(DECON_N).alias("ngs"))
        bench_ng = (
            tagged.where(F.col("hp") >= F.lit(TEST_BOUND))
            .select(F.explode("ngs").alias("ng"))
            .distinct()
        )
        flagged = (
            tagged.where(F.col("hp") < F.lit(TRAIN_BOUND))
            .select("doc_id", F.explode("ngs").alias("ng"))
            .join(F.broadcast(bench_ng), "ng")
            .select("doc_id")
            .distinct()
        )
        return docs.join(flagged, "doc_id", "anti")

    # ---- composition --------------------------------------------------

    def _deduped(self, docs: DataFrame) -> DataFrame:
        """quality_filter → exact_dedup, with the surviving doc_id SET
        materialized once (lazy localCheckpoint). The near-dup stage
        references its input several times (shingle side, node side,
        singleton anti-join, final survivor join); without the barrier
        each reference re-runs the stopword counters, the fingerprint
        md5, and the dedup groupBy shuffle. Checkpointing only the
        doc_id column keeps the barrier corpus-row-sized but ~16
        bytes/row — at 10B docs that is GBs across a cluster, not TBs;
        the text column still moves zero extra times (every re-read is
        the columnar base scan + a semi-join against this set)."""
        kept_ids = (
            self.exact_dedup(self.quality_filter(docs))
            .select("doc_id")
            .localCheckpoint(eager=False)
        )
        return docs.join(kept_ids, "doc_id", "semi")

    def run(self, docs: DataFrame) -> DataFrame:
        """Full pipeline; lazy until written/collected."""
        return self.assign_splits(self.neardup_dedup(self._deduped(docs)))

    def run_incremental(
        self, new_docs: DataFrame, corpus: DataFrame
    ) -> DataFrame:
        """The per-crawl composition: quality rules → exact dedup
        WITHIN the batch → near-dup probe of batch + corpus
        (operators/dedup.incremental_neardup, keep-first policy) →
        splits. Never re-clusters the corpus — the whole point at
        100 TB; pass a persisted band index via
        dedup.incremental_neardup_stored for the production probe."""
        from timeseriesdb_spark.operators.dedup import incremental_neardup

        batch = self.exact_dedup(self.quality_filter(new_docs))
        kept = (
            incremental_neardup(batch, corpus)
            .where(F.col("keep") == 1)
            .select("doc_id")
        )
        return self.assign_splits(batch.join(kept, "doc_id", "semi"))

    def run_decontaminated(self, docs: DataFrame) -> DataFrame:
        """run() plus the decontamination stage between dedup and
        splits — the composition a corpus that ships next to its own
        eval split runs."""
        return self.assign_splits(
            self.decontaminate(self.neardup_dedup(self._deduped(docs)))
        )

    def audit(self, docs: DataFrame) -> DataFrame:
        """Per-stage survivor counts (stage, n_docs) — the funnel every
        curation report starts with. Triggers one count per stage."""
        stages = [
            ("0_input", docs),
            ("1_quality", self.quality_filter(docs)),
            ("2_exact_dedup", self.exact_dedup(self.quality_filter(docs))),
        ]
        full = self.run(docs)
        rows = [(name, df.count()) for name, df in stages]
        rows.append(("3_neardup_split", full.count()))
        return self.spark.createDataFrame(rows, "stage string, n_docs long")


def curation_split_bounds() -> tuple[str, str]:
    """The text module's hash-range split bounds (single source)."""
    from timeseriesdb_spark.operators.text import SPLIT_BOUNDS

    return SPLIT_BOUNDS


def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as one driver-checked query — the
    flagship composition: every stage (quality rules, exact dedup,
    near-dup CC survivor drop, hash-range splits) is oracle-checked
    END TO END, not just in isolation."""
    from timeseriesdb_spark.tables import load_table

    return CurationPipeline(spark).run(load_table(spark, sf_dir, "documents"))


def _curation_oracle() -> str:
    """Composed DuckDB SQL for the whole pipeline: the per-stage CTEs
    are generated from the SAME constants/fragments as the per-stage
    oracles (curation.KEEP_SQL, dedup.lsh_pairs_ctes), so stage and
    pipeline oracles cannot drift apart."""
    from timeseriesdb_spark.operators.curation import KEEP_SQL

    lo, hi = curation_split_bounds()
    return f"""
        WITH RECURSIVE
        q AS (SELECT * FROM documents WHERE {KEEP_SQL}),
        ed AS (
            SELECT min(doc_id) AS doc_id FROM q
            GROUP BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))
        ),
        kept AS (SELECT q.* FROM q JOIN ed USING (doc_id)),
        {dedup.lsh_pairs_ctes("kept")},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            WHERE est_jaccard >= {dedup.CC_MIN_EST}
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
            WHERE est_jaccard >= {dedup.CC_MIN_EST}
        ),
        r AS (
            SELECT doc_id AS v, doc_id AS m FROM kept
            UNION
            SELECT e.b AS v, r.m AS m FROM r JOIN edges e ON e.a = r.v
        ),
        comp AS (SELECT v AS doc_id, min(m) AS cluster_id FROM r GROUP BY v)
        SELECT k.doc_id, k.text, k.lang, k.source,
               CASE WHEN substr(md5(k.text), 1, 2) < '{lo}' THEN 'train'
                    WHEN substr(md5(k.text), 1, 2) < '{hi}' THEN 'val'
                    ELSE 'test' END AS split,
               CAST(length(k.text) - length(replace(k.text, ' ', '')) + 1
                    AS BIGINT) AS n_tokens
        FROM kept k
        JOIN comp c ON c.doc_id = k.doc_id AND c.doc_id = c.cluster_id
    """


QUERIES = {"q_curation": q_curation}
ORACLES = {"q_curation": _curation_oracle()}
