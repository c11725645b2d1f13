"""Behavioral invariants for the warehouse-shape event operators:
SCD-2 interval build and the point-in-time feature snapshot.
(Hash-equality vs DuckDB is the driver's job; these pin the semantics
that a hash can't explain — interval tiling, leak-freedom.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.funnels import (
    FEATURE_EVENTS,
    q_feature_snapshot,
    q_scd2,
)
from timeseriesdb_spark.tables import load_table


def test_scd2_intervals_tile_each_user(spark):
    pdf = q_scd2(spark, SF_DIR).toPandas()
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("version").reset_index(drop=True)
        # versions are 1..n dense
        assert list(g["version"]) == list(range(1, len(g) + 1))
        # exactly one open (current) interval, and it is the last
        assert int(g["is_current"].sum()) == 1
        assert g["is_current"].iloc[-1] == 1
        # intervals tile: valid_to(k) == valid_from(k+1), no gaps/overlap
        assert (
            g["valid_to"].iloc[:-1].reset_index(drop=True)
            == g["valid_from"].iloc[1:].reset_index(drop=True)
        ).all()
        # consecutive states genuinely differ (repeats collapsed)
        assert (g["state"].iloc[:-1].values != g["state"].iloc[1:].values).all()


def test_scd2_point_in_time_lookup_matches_raw(spark):
    """Looking up the state valid at an arbitrary ts must equal the
    user's most recent raw event_type at that ts — SCD2 is a lossless
    reshaping of the change stream."""
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_type", "event_id")
        .toPandas()
    )
    scd = q_scd2(spark, SF_DIR).toPandas()
    probe_ts = ev["ts"].quantile(0.5)
    raw = (
        ev[ev["ts"] <= probe_ts]
        .sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")["event_type"]
    )
    hit = scd[
        (scd["valid_from"] <= probe_ts)
        & (scd["valid_to"].isna() | (scd["valid_to"] > probe_ts))
    ].set_index("user_id")["state"]
    assert len(hit) == len(raw)
    pd.testing.assert_series_equal(
        hit.sort_index(), raw.sort_index(), check_names=False
    )


def test_feature_snapshot_is_leak_free(spark):
    """Every feature column must be computable from events STRICTLY
    before the purchase — recompute one user's snapshots from the raw
    stream and compare all columns."""
    snap = q_feature_snapshot(spark, SF_DIR).toPandas()
    uid = int(snap["user_id"].iloc[0])
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("user_id") == uid)
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    got = (
        snap[snap["user_id"] == uid]
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    rows = []
    for _, p in got.iterrows():
        prior = ev[
            (ev["ts"] < p["purchase_ts"])
            | ((ev["ts"] == p["purchase_ts"]) & (ev["event_id"] < p["purchase_id"]))
        ]
        row = {}
        for f in FEATURE_EVENTS:
            fe = prior[prior["event_type"] == f]
            row[f"last_{f}_value"] = (
                fe["value"].iloc[-1] if len(fe) else None
            )
            row[f"n_{f}_before"] = len(fe)
        rows.append(row)
    want = pd.DataFrame(rows)
    for f in FEATURE_EVENTS:
        assert list(got[f"n_{f}_before"]) == list(want[f"n_{f}_before"]), f
        g = got[f"last_{f}_value"].astype(float)
        w = want[f"last_{f}_value"].astype(float)
        assert ((g == w) | (g.isna() & w.isna())).all(), f


def test_feature_snapshot_counts_monotone_per_user(spark):
    snap = q_feature_snapshot(spark, SF_DIR).toPandas()
    for _, g in snap.groupby("user_id"):
        g = g.sort_values(["purchase_ts", "purchase_id"])
        for f in FEATURE_EVENTS:
            assert g[f"n_{f}_before"].is_monotonic_increasing
