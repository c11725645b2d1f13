"""Retention/tiering lifecycle: aged partitions leave the raw store
and their PAA summary lands in the tier — total information coverage
preserved across the two stores.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.tables import load_table

CUTOFF = "2024-01-15"


def test_retention_tiers_old_partitions(spark, tmp_path):
    store = str(tmp_path / "store")
    tier = str(tmp_path / "tier")
    eng = SignalEngine(spark, store)
    ev = load_table(spark, SF_DIR, "events")
    eng.ingest(ev)

    n_old = ev.filter(F.to_date("ts") < CUTOFF).count()
    n_new = ev.filter(F.to_date("ts") >= CUTOFF).count()
    assert n_old > 0 and n_new > 0

    eng.apply_retention(tier, CUTOFF, chunk=8)

    # raw store holds only the recent window
    raw = eng.events()
    assert raw.count() == n_new
    assert raw.filter(F.col("event_date") < CUTOFF).count() == 0

    # tier covers every aged row, ~chunk× smaller
    tiered = spark.read.parquet(tier)
    assert tiered.agg(F.sum("n_src_rows")).first()[0] == n_old
    assert tiered.count() <= n_old // 8 + tiered.select("user_id").distinct().count()

    # tier values are true chunk means: global weighted mean matches
    raw_mean = ev.filter(F.to_date("ts") < CUTOFF).agg(F.avg("value")).first()[0]
    tier_mean = (
        tiered.agg(
            F.sum(F.col("value") * F.col("n_src_rows")) / F.sum("n_src_rows")
        ).first()[0]
    )
    assert abs(raw_mean - tier_mean) < 1e-4
