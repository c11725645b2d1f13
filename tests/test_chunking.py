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


def test_hll_register_table_properties(spark):
    """The seeded-md5 register tier (r11): rho in [1, 61], register
    indices are 2 lowercase hex chars, per-(signal, day) register count
    bounded by m, and a python mirror of the rho derivation agrees on
    a sample (the hex-string leading-zero arithmetic is right)."""
    import hashlib

    rows = chunking.q_hll_register_table(spark, SF_DIR).collect()
    assert rows
    assert all(1 <= r.rho <= 4 * chunking.HLL_TAIL_CHARS + 1 for r in rows)
    assert all(
        len(r.register_idx) == chunking.HLL_IDX_CHARS
        and set(r.register_idx) <= set("0123456789abcdef")
        for r in rows
    )
    from collections import Counter

    per_day = Counter((r.user_id, r.event_date) for r in rows)
    assert max(per_day.values()) <= chunking.HLL_M

    # python mirror on one signal-day: recompute registers from raw
    ev = load_table(spark, SF_DIR, "events")
    uid, day = rows[0].user_id, rows[0].event_date
    raw = (
        ev.where(F.col("user_id") == uid)
        .where(F.date_trunc("day", F.col("ts")) == day)
        .select(scaled_int(F.col("value")).alias("k"))
        .collect()
    )
    regs: dict[str, int] = {}
    for r in raw:
        h = hashlib.md5(str(r.k).encode()).hexdigest()
        idx, tail = h[:2], h[2:17]
        stripped = tail.lstrip("0")
        zh = len(tail) - len(stripped)
        if zh == chunking.HLL_TAIL_CHARS:
            rho = 4 * chunking.HLL_TAIL_CHARS + 1
        else:
            c = stripped[0]
            nib = 0 if c >= "8" else 1 if c >= "4" else 2 if c >= "2" else 3
            rho = 4 * zh + nib + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    got = {
        (r.register_idx, r.rho)
        for r in rows
        if r.user_id == uid and r.event_date == day
    }
    assert got == set(regs.items())


def test_hll_estimate_accuracy_and_merge(spark):
    """q_hll_estimate: the day-rollup merge equals the direct
    distinct-value sketch (max over days == max over union — the
    mergeability the tier exists for), and the CORRECTED estimate
    (linear counting below the standard 2.5·m threshold, raw harmonic
    above — applied here in the test, not in the emitted column, since
    ln() is libm-specific) lands within 3·RSE of the exact count."""
    import math

    rows = chunking.q_hll_estimate(spark, SF_DIR).collect()
    assert rows
    m = chunking.HLL_M
    rse = 1.04 / math.sqrt(m)
    for r in rows:
        raw = r.approx_distinct
        zeros = m - r.n_regs
        if raw <= 2.5 * m and zeros > 0:
            corrected = m * math.log(m / zeros)
        else:
            corrected = raw
        assert abs(corrected - r.exact_distinct) <= max(
            3 * rse * r.exact_distinct, 3
        ), (r.user_id, corrected, r.exact_distinct)

    # merge property: registers merged across days == registers over
    # the un-split corpus
    ev = load_table(spark, SF_DIR, "events")
    merged = {
        (r.user_id, r.register_idx): r.rho
        for r in chunking._hll_registers(ev)
        .groupBy("user_id", "register_idx")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    direct = {
        (r.user_id, r.register_idx): r.rho
        for r in chunking._hll_registers(
            ev.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        ).collect()
    }
    assert merged == direct


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


# ---- hypothesis property: the hex-string rho arithmetic (no Spark) ----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789abcdef", min_size=15, max_size=15))
def test_hll_rho_string_arithmetic_equals_bit_formula(tail):
    """The register rho derived by pure hex-string arithmetic (leading
    zero hex chars × 4 + a nibble CASE + 1 — what BOTH engines compute)
    must equal the bit-twiddling definition: 1 + number of leading
    zero bits of the 60-bit tail, 61 for an all-zero tail."""
    # string-arithmetic form (mirrors _hll_registers / the oracle)
    stripped = tail.lstrip("0")
    zh = len(tail) - len(stripped)
    if zh == chunking.HLL_TAIL_CHARS:
        rho_str = 4 * chunking.HLL_TAIL_CHARS + 1
    else:
        c = stripped[0]
        nib = 0 if c >= "8" else 1 if c >= "4" else 2 if c >= "2" else 3
        rho_str = 4 * zh + nib + 1

    # bit-twiddling ground truth over the 60-bit integer
    v = int(tail, 16)
    width = 4 * chunking.HLL_TAIL_CHARS
    rho_bits = width + 1 if v == 0 else width - v.bit_length() + 1
    assert rho_str == rho_bits
    assert 1 <= rho_str <= width + 1
