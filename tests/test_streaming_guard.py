"""Fresh-checkpoint guard across EVERY batch_id-partitioned partial
writer (VERDICT r13 #1 — the drift stream's r13 guard generalized via
api.guard_fresh_checkpoint).

The hazard: each maintain_* stream writes micro-batch partials to
`{store}/batch_id={bid}`. Restart with a NEW checkpoint against a
non-empty store and foreachBatch's batch ids restart at 0 — the new
tranche's partials silently overwrite the oldest stored partials.

Per family this file proves:
- default ('error'): a fresh checkpoint against a non-empty store
  refuses loudly instead of corrupting;
- 'append': a second tranche of NEW rows resumes above the store's
  max batch_id and the served answers equal a single full run;
- 'replay' (ADVICE r13, rollup representative): a COARSER replay
  (availableNow one-batch where the original run used
  maxFilesPerTrigger=1) deletes the stale higher-id partitions
  instead of leaving them to double-count at merge.

Tranches split by user/doc hash parity so every key's full history
lands in exactly one tranche — the stateful trigram tail (event
ngrams) then closes identically to the one-shot run, making the
equality exact for all families.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import CorpusEngine, SignalEngine
from timeseriesdb_spark.tables import load_table


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


def _documents(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )


def _lineitem(spark):
    return load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )


def _merged(spark, path, keys, aggs):
    return spark.read.parquet(path).groupBy(*keys).agg(*aggs)


SPECS = {
    # name: (engine kind, source kind, split column, maintain attr,
    #        serve(spark, eng, path) -> DataFrame)
    "rollup": (
        "signal", "events", "user_id", "maintain_rollup_stream",
        lambda spark, eng, p: _merged(
            spark, p, ["user_id", "bucket_start"],
            [
                F.sum("cnt").alias("cnt"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
                F.sum("dsum").cast("double").alias("sum_value"),
            ],
        ),
    ),
    "distinct": (
        "signal", "events", "user_id", "maintain_distinct_stream",
        lambda spark, eng, p: eng.distinct_estimate(p),
    ),
    "hll_register": (
        "signal", "events", "user_id", "maintain_hll_register_stream",
        lambda spark, eng, p: eng.hll_distinct_estimate(p),
    ),
    "frequency": (
        "signal", "events", "user_id", "maintain_frequency_stream",
        lambda spark, eng, p: _merged(
            spark, p, ["user_id", "day", "depth", "bucket"],
            [F.sum("partial_n").alias("partial_n")],
        ),
    ),
    "ohlc": (
        "signal", "events", "user_id", "maintain_ohlc_stream",
        lambda spark, eng, p: eng.ohlc_bars(p),
    ),
    "histogram": (
        "signal", "events", "user_id", "maintain_histogram_stream",
        lambda spark, eng, p: eng.histogram_bins(p),
    ),
    "quantile": (
        "signal", "events", "user_id", "maintain_quantile_stream",
        lambda spark, eng, p: eng.quantile_estimates(p),
    ),
    "event_ngrams": (
        "signal", "events", "user_id", "maintain_event_ngrams_stream",
        lambda spark, eng, p: eng.event_ngrams(p),
    ),
    "heavyhitters": (
        "signal", "events", "user_id", "maintain_heavyhitters_stream",
        lambda spark, eng, p: eng.heavy_hitters(p),
    ),
    "trending_terms": (
        "corpus", "documents", "doc_id", "maintain_trending_terms_stream",
        lambda spark, eng, p: eng.trending_terms(p),
    ),
    # r14: materialized-view maintenance of the interval-join aggregate
    "shipdate": (
        "signal", "lineitem", "l_orderkey", "maintain_shipdate_stream",
        lambda spark, eng, p: eng.interval_join_from_store(p, SF_DIR),
    ),
}


def _engine(kind, spark, tmp_path):
    if kind == "corpus":
        return CorpusEngine(spark, str(tmp_path / "corpus"))
    return SignalEngine(spark, str(tmp_path / "store"))


def _run_stream(spark, eng, attr, src, store, ckpt, schema, **kw):
    stream = spark.readStream.schema(schema).parquet(src)
    getattr(eng, attr)(stream, store, ckpt, **kw).awaitTermination(180)


def _pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (
        pdf.sort_values(list(pdf.columns))
        .reset_index(drop=True)
        .astype(str)
    )


@pytest.mark.parametrize("family", sorted(SPECS))
def test_guarded_maintenance_refuse_and_append(spark, tmp_path, family):
    kind, source, split_col, attr, serve = SPECS[family]
    src_full = str(tmp_path / "src_full")
    src_a = str(tmp_path / "src_a")
    src_b = str(tmp_path / "src_b")

    rows = {
        "events": _events,
        "documents": _documents,
        "lineitem": _lineitem,
    }[source](spark)
    even = F.pmod(F.xxhash64(F.col(split_col)), F.lit(2)) == 0
    rows.coalesce(1).write.parquet(src_full)
    rows.filter(even).coalesce(1).write.parquet(src_a)
    rows.filter(~even).coalesce(1).write.parquet(src_b)
    schema = rows.schema

    eng = _engine(kind, spark, tmp_path)

    # reference: one full run into its own store
    ref = str(tmp_path / "ref")
    _run_stream(
        spark, eng, attr, src_full, ref, str(tmp_path / "ck_ref"), schema
    )
    exp = _pdf(serve(spark, eng, ref))
    assert len(exp) > 0

    # tranche A, then the checkpoint is "lost"
    store = str(tmp_path / "tier")
    _run_stream(spark, eng, attr, src_a, store, str(tmp_path / "ck1"), schema)

    # default: loud refusal, store untouched
    with pytest.raises(ValueError, match="fresh checkpoint"):
        _run_stream(
            spark, eng, attr, src_b, store, str(tmp_path / "ck2"), schema
        )

    # declared intent: tranche B carries only NEW rows -> append above
    # the store's max batch_id; served answers equal the full run
    _run_stream(
        spark, eng, attr, src_b, store, str(tmp_path / "ck3"), schema,
        on_fresh_checkpoint="append",
    )
    bids = sorted(
        d for d in os.listdir(store) if d.startswith("batch_id=")
    )
    assert len(bids) >= 2  # tranche B wrote ABOVE, overwrote nothing
    got = _pdf(serve(spark, eng, store))
    pd.testing.assert_frame_equal(got, exp)


def test_replay_deletes_stale_partitions(spark, tmp_path):
    """ADVICE r13 (api.py replay mode): original run micro-batches
    finely (4 files, maxFilesPerTrigger=1 -> batch_id=0..3); the replay
    drains the identical corpus in ONE availableNow batch. Stale
    batch_id>=1 partitions must be deleted, not left to double-count."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "tier")
    ev = _events(spark)
    for i in range(4):
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(4)) == i).coalesce(
            1
        ).write.mode("append").parquet(src)

    eng = SignalEngine(spark, str(tmp_path / "store"))
    fine = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    eng.maintain_rollup_stream(
        fine, store, str(tmp_path / "ck1")
    ).awaitTermination(180)
    assert len(
        [d for d in os.listdir(store) if d.startswith("batch_id=")]
    ) == 4
    exp = _pdf(SPECS["rollup"][4](spark, eng, store))

    coarse = spark.readStream.schema(ev.schema).parquet(src)
    eng.maintain_rollup_stream(
        coarse, store, str(tmp_path / "ck2"), on_fresh_checkpoint="replay"
    ).awaitTermination(180)
    bids = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert bids == ["batch_id=0"]  # stale 1..3 deleted, not double-counted
    got = _pdf(SPECS["rollup"][4](spark, eng, store))
    pd.testing.assert_frame_equal(got, exp)


def test_ann_probe_stream_guarded(spark, tmp_path):
    """The ANN probe result log shares the batch_id idiom and the same
    hazard: a second query tranche under a fresh checkpoint must refuse
    by default and append above the stored max batch_id with declared
    intent — never overwrite tranche 1's results."""
    from timeseriesdb_spark.api import CorpusEngine

    eng = CorpusEngine(spark, str(tmp_path / "corpus"))
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivf")
    eng.build_ann_index(emb, idx)

    q = emb.orderBy("vec_id").limit(8)
    src1, src2 = str(tmp_path / "q1"), str(tmp_path / "q2")
    q.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(src1)
    q.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(src2)
    out = str(tmp_path / "hits")

    def run(src, ck, **kw):
        stream = spark.readStream.schema(q.schema).parquet(src)
        eng.ann_probe_stream(
            stream, idx, out, str(tmp_path / ck), **kw
        ).awaitTermination(180)

    run(src1, "ck1")
    first = _pdf(spark.read.parquet(out))
    with pytest.raises(ValueError, match="fresh checkpoint"):
        run(src2, "ck2")
    run(src2, "ck3", on_fresh_checkpoint="append")
    merged = spark.read.parquet(out)
    # tranche 1's rows survived verbatim under batch_id=0 ...
    pd.testing.assert_frame_equal(
        _pdf(merged.where(F.col("batch_id") == 0)), first
    )
    # ... and tranche 2 landed above, so every query has results
    assert merged.select("query_id").distinct().count() == 8
