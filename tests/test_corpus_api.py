"""CorpusEngine lifecycle: bootstrap == batch pipeline, incremental
append == run_incremental survivors, split reads prune partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import CorpusEngine
from timeseriesdb_spark.operators import dedup
from timeseriesdb_spark.pipeline import CurationPipeline
from timeseriesdb_spark.plans import checks
from timeseriesdb_spark.tables import load_table


def test_corpus_lifecycle(spark, tmp_path):
    doc = load_table(spark, SF_DIR, "documents")
    corpus_raw = doc.where(F.col("source") == dedup.CORPUS_SOURCE)
    crawl = doc.where(F.col("source") != dedup.CORPUS_SOURCE)

    eng = CorpusEngine(spark, str(tmp_path / "corpus"))
    eng.bootstrap(corpus_raw)
    pipe = CurationPipeline(spark)

    base = eng.docs().collect()
    expect_base = pipe.run(corpus_raw).collect()
    assert {r.doc_id for r in base} == {r.doc_id for r in expect_base}

    # incremental crawl: appended rows == run_incremental survivors
    # (computed against the bootstrapped corpus BEFORE the append)
    expect_inc = {
        r.doc_id for r in pipe.run_incremental(crawl, eng.docs()).collect()
    }
    eng.ingest_increment(crawl)
    after = {r.doc_id for r in eng.docs().collect()}
    assert after == {r.doc_id for r in base} | expect_inc
    assert expect_inc, "fixture crawl should contribute survivors"

    # split read prunes on the partition column
    train = eng.split("train")
    plan = checks.formatted_plan(train)
    assert "PartitionFilters: [isnotnull(split" in plan.replace("#", "", 1) or (
        "split" in plan and "PartitionFilters" in plan
    ), plan
    assert {r.split for r in train.collect()} <= {"train"}

    # read surfaces
    st = eng.stats().collect()
    assert sum(r.n_docs for r in st) == len(after)
    assert eng.chunks().count() >= len(after)
