"""Document chunking + mergeable distinct sketches — two scale
primitives the LLM-pipeline surface still lacked.

`q_chunk_documents` is the embedding-pipeline front door: split each
document into overlapping sliding word windows (chunk_id, chunk_text,
n_tokens) ready for an embedding model. Shape at 100 TB: one narrow
scan + one generator explode, NO shuffle — chunks inherit the input
partitioning, and the fan-out factor is words/stride (bounded, known).
Everything is built-in array ops (split/sequence/slice/concat_ws), so
the whole operator lives inside whole-stage codegen; the same
construction in DuckDB (string_split/generate_series/list_slice) makes
it hash-exact oracle-checkable.

`q_distinct_hll` is the mergeable-sketch rollup pattern (the scale
path behind q_distinct_count's exact answer): per (signal, day) HLL
sketches aggregated once at ingest time, then ANY time-range distinct
query is a cheap union of daily sketches instead of a re-scan of raw
data. The reference's distinct estimate builds a HashSet per sample
(predict/cr_predictor.rs:35-52) — exact but unmergeable; Apache
DataSketches HLL gives the associative-merge property that makes the
rollup tier work. Deterministic sketches ⇒ rollup-merge == direct
(pinned by pytest); cross-engine hash parity is impossible (DuckDB's
HLL is a different sketch), so the driver records rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.functions.codecs import scaled_int
from timeseriesdb_spark.tables import load_table

CHUNK_WORDS = 32   # words per chunk (the embedding-model context)
CHUNK_STRIDE = 24  # window stride → CHUNK_WORDS - CHUNK_STRIDE words overlap


def chunk_documents(doc: DataFrame) -> DataFrame:
    """Sliding word-window chunks of a documents-shaped frame."""
    words = F.split(F.col("text"), " ")
    start = F.explode(
        F.sequence(F.lit(1), F.size(words), F.lit(CHUNK_STRIDE))
    ).alias("start")
    exploded = doc.select("doc_id", words.alias("words"), start)
    chunk = F.slice(F.col("words"), F.col("start"), CHUNK_WORDS)
    return exploded.select(
        "doc_id",
        F.floor((F.col("start") - 1) / F.lit(CHUNK_STRIDE))
        .cast("bigint")
        .alias("chunk_id"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-declared wrapper over :func:`chunk_documents`."""
    return chunk_documents(load_table(spark, sf_dir, "documents"))


def daily_distinct_sketches(ev: DataFrame) -> DataFrame:
    """The ingest-time rollup: one HLL sketch of the scaled value per
    (signal, day). This is the frame a 100 TB store would persist next
    to the AggStats summary table — bytes per (signal, day), not rows."""
    return ev.groupBy(
        "user_id", F.to_date("ts").alias("event_date")
    ).agg(F.hll_sketch_agg(scaled_int(F.col("value"))).alias("sketch"))


def q_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal distinct-value estimate answered FROM the daily
    sketch rollup (union-merge, never re-scanning raw events) — the
    associative partial/final shape of q_agg_stats, applied to the one
    aggregate (COUNT DISTINCT) that plain partial aggregation cannot
    split. Estimate is deterministic: pytest pins rollup == direct
    one-pass sketch exactly, and ±2% of the exact distinct count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        daily_distinct_sketches(ev)
        .groupBy("user_id")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
                "approx_distinct"
            )
        )
    )


QUERIES = {
    "q_chunk_documents": q_chunk_documents,
    "q_distinct_hll": q_distinct_hll,  # rows-only: engine-specific sketch
}

ORACLES = {
    "q_chunk_documents": f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ), s AS (
            SELECT doc_id, words,
                   unnest(generate_series(1, len(words), {CHUNK_STRIDE}))
                       AS start
            FROM w
        )
        SELECT doc_id,
               CAST(floor((start - 1) / {CHUNK_STRIDE}.0) AS BIGINT)
                   AS chunk_id,
               array_to_string(
                   list_slice(words, start,
                              least(start + {CHUNK_WORDS} - 1, len(words))),
                   ' ') AS chunk_text,
               CAST(least({CHUNK_WORDS}, len(words) - start + 1) AS BIGINT)
                   AS n_tokens
        FROM s
    """,
}
