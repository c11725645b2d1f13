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


def test_second_retention_run_preserves_tier(spark, tmp_path):
    """Tiering must ACCUMULATE: a later run tiers newly-aged data
    without destroying what earlier runs tiered (whose raw partitions
    are already gone)."""
    store = str(tmp_path / "store")
    tier = str(tmp_path / "tier")
    eng = SignalEngine(spark, store)
    ev = load_table(spark, SF_DIR, "events")
    eng.ingest(ev)

    n_old_1 = ev.filter(F.to_date("ts") < "2024-01-10").count()
    n_old_2 = ev.filter(F.to_date("ts") < "2024-01-20").count()
    eng.apply_retention(tier, "2024-01-10", chunk=8)
    eng.apply_retention(tier, "2024-01-20", chunk=8)

    tiered = spark.read.parquet(tier)
    # every aged row is represented exactly once across both runs
    assert tiered.agg(F.sum("n_src_rows")).first()[0] == n_old_2
    assert (
        tiered.filter(F.col("tiered_before") == "2024-01-10")
        .agg(F.sum("n_src_rows"))
        .first()[0]
        == n_old_1
    )
    assert eng.events().filter(F.col("event_date") < "2024-01-20").count() == 0


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


def test_retention_rerun_same_cutoff_is_sealed(spark, tmp_path):
    """A completed cutoff is sealed by its manifest: re-invoking with
    the same cutoff must not duplicate, overwrite, or re-shrink the
    tier — only the (idempotent) delete phase re-runs."""
    store = str(tmp_path / "store")
    tier = str(tmp_path / "tier")
    eng = SignalEngine(spark, store)
    ev = load_table(spark, SF_DIR, "events")
    eng.ingest(ev)

    eng.apply_retention(tier, CUTOFF, chunk=8)
    first = spark.read.parquet(tier).agg(F.sum("n_src_rows")).first()[0]
    eng.apply_retention(tier, CUTOFF, chunk=8)
    assert spark.read.parquet(tier).agg(F.sum("n_src_rows")).first()[0] == first


def test_retention_late_rows_survive_and_tier_later(spark, tmp_path):
    """Rows ingested into an already-aged date between runs are NOT in
    the sealed cutoff's manifest: a same-cutoff rerun must leave them
    in the raw store untouched; a later cutoff tiers them."""
    store = str(tmp_path / "store")
    tier = str(tmp_path / "tier")
    eng = SignalEngine(spark, store)
    ev = load_table(spark, SF_DIR, "events")
    eng.ingest(ev)
    eng.apply_retention(tier, CUTOFF, chunk=8)

    late = ev.filter(F.to_date("ts") < CUTOFF).limit(100)
    n_late = late.count()
    assert n_late > 0
    eng.ingest(late, mode="append")

    # same cutoff again: late rows are not in the sealed manifest
    eng.apply_retention(tier, CUTOFF, chunk=8)
    assert eng.events().count() >= n_late
    assert (
        eng.events().filter(F.col("event_date") < CUTOFF).count() == n_late
    )

    # a later cutoff picks them up
    n_before = spark.read.parquet(tier).agg(F.sum("n_src_rows")).first()[0]
    eng.apply_retention(tier, "2024-02-01", chunk=8)
    tiered = spark.read.parquet(tier)
    n_old_total = ev.filter(F.to_date("ts") < "2024-02-01").count() + n_late
    assert tiered.agg(F.sum("n_src_rows")).first()[0] == n_old_total
    assert n_before < n_old_total
