"""Bucketed co-located join: zero shuffle exchanges in the plan and
results identical to the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.plans import checks
from timeseriesdb_spark.sources import bucketed
from timeseriesdb_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the session's spark-warehouse dir;
    # DROP TABLE below removes data and metadata
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    stats = ev.groupBy("user_id").agg(F.avg("value").alias("sig_avg"))
    bucketed.write_bucketed(ev, "ev_bucketed")
    bucketed.write_bucketed(stats, "stats_bucketed", sort_by=None)
    yield "ev_bucketed", "stats_bucketed"
    for t in ("ev_bucketed", "stats_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the test exercises the bucketed path, as it
    # would at fact-x-fact scale where broadcast is impossible
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.colocated_join(spark, left, right)
        assert checks.exchange_count(joined) == 0, checks.formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_plain(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed.colocated_join(spark, left, right)
    ev = load_table(spark, SF_DIR, "events")
    plain = ev.join(
        ev.groupBy("user_id").agg(F.avg("value").alias("sig_avg")), "user_id"
    )
    assert joined.count() == plain.count()
    g = joined.agg(F.sum(F.col("value").cast("decimal(38,6)"))).first()[0]
    p = plain.agg(F.sum(F.col("value").cast("decimal(38,6)"))).first()[0]
    assert g == p


def test_incremental_neardup_stored_matches_direct(spark):
    """Probing the persisted band_key-bucketed index gives exactly the
    in-memory incremental_neardup result, and the probe join reaches
    the bucketed scan without an exchange on the corpus side."""
    from timeseriesdb_spark.operators import dedup

    doc = load_table(spark, SF_DIR, "documents")
    corpus = doc.where(F.col("source") == dedup.CORPUS_SOURCE)
    batch = doc.where(F.col("source") != dedup.CORPUS_SOURCE)
    dedup.write_band_store(corpus, "band_store_t")
    try:
        direct = dedup.incremental_neardup(batch, corpus)
        stored = dedup.incremental_neardup_stored(spark, batch, "band_store_t")
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, stored.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS band_store_t")
