"""Chunking + HLL sketch-rollup invariants (operators/chunking.py).

The chunker's oracle parity is covered by test_oracle_parity; here we
pin the PROPERTIES a downstream embedding pipeline relies on. The HLL
rollup has no cross-engine oracle (engine-specific sketch bytes), so
its correctness case is determinism: daily-sketch union-merge must
equal the direct one-pass sketch EXACTLY, and land within sketch error
of the exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.functions.codecs import scaled_int
from timeseriesdb_spark.operators import chunking
from timeseriesdb_spark.tables import load_table


def test_chunks_cover_every_word(spark):
    """Union of [start, start+W) windows covers [1, n_words] with no
    gaps: stride <= width, and the last chunk starts <= n_words."""
    assert chunking.CHUNK_STRIDE <= chunking.CHUNK_WORDS
    doc = load_table(spark, SF_DIR, "documents")
    chunks = chunking.chunk_documents(doc)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.max("chunk_id").alias("last_chunk"),
    )
    words = doc.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_words")
    )
    joined = per_doc.join(words, "doc_id")
    # chunk_ids are dense 0..last: count == last+1
    assert joined.where(F.col("n_chunks") != F.col("last_chunk") + 1).count() == 0
    # total tokens across overlapping chunks ≥ word count (coverage),
    # ≤ words + overlap * (chunks-1) (no over-fan-out)
    overlap = chunking.CHUNK_WORDS - chunking.CHUNK_STRIDE
    bad = joined.where(
        (F.col("sum_tokens") < F.col("n_words"))
        | (
            F.col("sum_tokens")
            > F.col("n_words") + F.lit(overlap) * (F.col("n_chunks") - 1)
        )
    )
    assert bad.count() == 0


def test_chunk_reconstruction_roundtrip(spark):
    """Concatenating the non-overlapping prefix (stride words) of each
    chunk in order reproduces the document exactly — the property that
    makes chunked storage lossless."""
    doc = load_table(spark, SF_DIR, "documents").limit(50)
    chunks = chunking.chunk_documents(doc)
    prefix = F.concat_ws(
        " ",
        F.slice(
            F.split("chunk_text", " "), 1, chunking.CHUNK_STRIDE
        ),
    )
    rebuilt = (
        chunks.withColumn("prefix", prefix)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_id", "prefix")))
                .getField("prefix")
            ).alias("rebuilt")
        )
    )
    merged = rebuilt.join(doc, "doc_id").where(
        F.col("rebuilt") != F.col("text")
    )
    assert merged.count() == 0


def test_hll_rollup_merge_equals_direct(spark):
    """Daily-sketch union == direct one-pass sketch (associativity of
    the HLL merge — the property the rollup tier depends on), and both
    within 2% of the exact distinct count."""
    ev = load_table(spark, SF_DIR, "events")
    rolled = (
        chunking.daily_distinct_sketches(ev)
        .groupBy("user_id")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("rolled")
        )
    )
    direct = ev.groupBy("user_id").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(scaled_int(F.col("value")))
        ).alias("direct"),
        F.countDistinct(scaled_int(F.col("value"))).alias("exact"),
    )
    j = rolled.join(direct, "user_id")
    assert j.where(F.col("rolled") != F.col("direct")).count() == 0
    off = j.where(
        F.abs(F.col("rolled") - F.col("exact")) > F.col("exact") * 0.02 + 1
    )
    assert off.count() == 0


def test_chunking_is_stream_legal(spark, tmp_path):
    """chunk_documents is a pure stateless projection+generator, so it
    runs unchanged on a stream and lands the batch result exactly."""
    src = str(tmp_path / "csrc")
    out = str(tmp_path / "cout")
    ckpt = str(tmp_path / "cckpt")
    doc = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    doc.coalesce(2).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        chunking.chunk_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in spark.read.parquet(out).collect()
    }
    exp = {
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunking.chunk_documents(doc).collect()
    }
    assert got == exp
