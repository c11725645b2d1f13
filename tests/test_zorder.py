"""Z-order clustered layout (sources/store.py::write_zorder_store).

The property that makes the layout worth paying a range shuffle for:
every file's parquet footer min/max range is NARROW IN BOTH dimensions
simultaneously, so a range predicate on either column rules out most
files by stats alone. We measure that directly from the footers with
pyarrow (Spark's file-level stat pruning is not visible in explain
output) and compare against the theoretical bound: a z-curve over F
files gives per-file spans ~ full_range/sqrt(F) per dimension.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.sources import store
from timeseriesdb_spark.tables import load_table


def _footer_spans(path: str, col: str) -> list[tuple]:
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    return spans


def test_zorder_files_narrow_in_both_dims(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "zstore")
    store.write_zorder_store(ev, path, n_files=16)

    for col in ("user_id", "ts"):
        spans = _footer_spans(path, col)
        assert len(spans) >= 8  # the range shuffle actually fanned out
        full_lo = min(s[0] for s in spans)
        full_hi = max(s[1] for s in spans)
        width = (full_hi - full_lo) or 1
        mean_frac = sum((hi - lo) / width for lo, hi in spans) / len(spans)
        # sqrt(16) = 4 → ideal 0.25/dim; allow generous slack for the
        # discrete rank grid and range-sampler imbalance. A
        # single-column-sorted layout scores ~1.0 on the other column.
        assert mean_frac < 0.6, f"{col}: mean footer span {mean_frac:.2f}"

    # a signal-range predicate must be prunable to a minority of files
    spans = _footer_spans(path, "user_id")
    uids = sorted({lo for lo, _ in spans} | {hi for _, hi in spans})
    probe_lo, probe_hi = uids[0], uids[len(uids) // 8]
    overlapping = sum(
        1 for lo, hi in spans if not (hi < probe_lo or lo > probe_hi)
    )
    assert overlapping <= len(spans) // 2


def test_zorder_roundtrip_lossless(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "zstore_rt")
    store.write_zorder_store(ev, path, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert "__z" not in back.columns
    a = ev.agg(
        F.sum("event_id"), F.sum("user_id"), F.min("ts"), F.max("ts")
    ).first()
    b = back.agg(
        F.sum("event_id"), F.sum("user_id"), F.min("ts"), F.max("ts")
    ).first()
    assert tuple(a) == tuple(b)
