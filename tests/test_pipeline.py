"""End-to-end curation pipeline invariants: the INTERACTION contracts
between stages that no single-operator check covers — every output doc
passes the quality rules, output fingerprints and near-dup clusters
are unique, splits partition the output, and the whole run is
deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import dedup
from timeseriesdb_spark.pipeline import CurationPipeline
from timeseriesdb_spark.registry import QUERIES
from timeseriesdb_spark.tables import load_table


def _run(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs, CurationPipeline(spark).run(docs)


def test_output_schema_and_nonempty(spark):
    _, out = _run(spark)
    assert out.columns == ["doc_id", "text", "lang", "source", "split", "n_tokens"]
    assert out.count() > 0


def test_every_output_doc_passes_quality_rules(spark):
    spark_docs, out = _run(spark)
    rules = QUERIES["q_gopher_rules"](spark, SF_DIR).select("doc_id", "keep")
    bad = out.join(rules, "doc_id").where(F.col("keep") == 0).count()
    assert bad == 0


def test_output_fingerprints_unique(spark):
    _, out = _run(spark)
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    n = out.count()
    n_fp = out.select(fp.alias("fp")).distinct().count()
    assert n == n_fp


def test_no_two_outputs_share_a_neardup_cluster(spark):
    docs, out = _run(spark)
    # clusters over the PRE-neardup corpus the stage actually saw
    pipe = CurationPipeline(spark)
    pre = pipe.exact_dedup(pipe.quality_filter(docs))
    clusters = dedup.dedup_clusters(pre)
    dup = (
        out.join(clusters, "doc_id")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0


def test_splits_partition_the_output(spark):
    _, out = _run(spark)
    counts = dict(
        out.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == out.count()
    assert counts.get("train", 0) > 0  # ~80% band must dominate


def test_pipeline_deterministic(spark):
    _, out1 = _run(spark)
    _, out2 = _run(spark)
    r1 = sorted((r.doc_id, r.split, r.n_tokens) for r in out1.collect())
    r2 = sorted((r.doc_id, r.split, r.n_tokens) for r in out2.collect())
    assert r1 == r2


def test_audit_funnel_monotonic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    audit = CurationPipeline(spark).audit(docs)
    rows = {r.stage: r.n_docs for r in audit.collect()}
    assert (
        rows["0_input"]
        >= rows["1_quality"]
        >= rows["2_exact_dedup"]
        >= rows["3_neardup_split"]
        > 0
    )


def test_decontaminated_run_is_clean_subset(spark):
    """run_decontaminated() output = run() output minus exactly the
    train docs that share an n-gram with the test range (and test/val
    docs are untouched by the stage)."""
    from timeseriesdb_spark.pipeline import CurationPipeline
    from timeseriesdb_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pipe = CurationPipeline(spark)
    base = {r.doc_id: r.split for r in pipe.run(docs).select("doc_id", "split").collect()}
    decon = {r.doc_id for r in pipe.run_decontaminated(docs).select("doc_id").collect()}
    assert decon <= set(base)
    removed = set(base) - decon
    assert all(base[d] == "train" for d in removed), "only train docs drop"
    # the flagged set computed on the deduped frame must drive removal
    deduped = pipe.neardup_dedup(pipe.exact_dedup(pipe.quality_filter(docs)))
    flagged_frame = deduped.join(
        pipe.decontaminate(deduped).select("doc_id"), "doc_id", "anti"
    )
    assert removed == {r.doc_id for r in flagged_frame.select("doc_id").collect()}


def test_run_incremental_invariants(spark):
    """Per-crawl entry: outputs pass the rules, are exact-unique,
    near-dup-free against the corpus, and carry valid splits."""
    from timeseriesdb_spark.operators import dedup

    doc = load_table(spark, SF_DIR, "documents")
    corpus = doc.where(F.col("source") == dedup.CORPUS_SOURCE)
    new = doc.where(F.col("source") != dedup.CORPUS_SOURCE)
    pipe = CurationPipeline(spark)
    out = pipe.run_incremental(new, corpus)
    rows = out.collect()
    assert rows
    ids = {r.doc_id for r in rows}
    # 1. every output passes the quality rules (it came from new)
    q_ids = {r.doc_id for r in pipe.quality_filter(new).select("doc_id").collect()}
    assert ids <= q_ids
    # 2. no output doc is flagged against the corpus
    flags = dedup.incremental_neardup(
        pipe.exact_dedup(pipe.quality_filter(new)), corpus
    ).collect()
    assert ids == {r.doc_id for r in flags if r.keep == 1}
    # 3. splits partition the output
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_dropped_ids_fast_path_matches_full_decision(spark):
    """neardup_dropped_ids (the pipeline's anti-join set) must equal
    the complement of dedup_clusters' survivor set — the fast path
    skips the singleton/size tail, never changes the decision. Checked
    on both CC execution paths (driver union-find and distributed
    min-label via driver_bound=0 ... the distributed loop shares
    _cluster_labels, pinned in test_dedup_clusters)."""
    docs = load_table(spark, SF_DIR, "documents")
    dropped = {
        r.doc_id for r in dedup.neardup_dropped_ids(docs).collect()
    }
    clusters = dedup.dedup_clusters(docs).collect()
    expect = {r.doc_id for r in clusters if r.doc_id != r.cluster_id}
    assert dropped == expect
