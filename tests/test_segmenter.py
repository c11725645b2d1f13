"""Stateful count-based segmentation parity: the streaming segmenter
(applyInPandasWithState) must produce exactly the segments a batch
row_number() bucketing computes, for every COMPLETED segment — the
in-progress tail per signal stays in state, mirroring the reference's
buffer holding the unfinished segment (future_signal.rs:154).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.streaming import segmenter
from timeseriesdb_spark.tables import load_table

SEG = 64  # small segment size so sf0.001 yields many complete segments


def test_stream_segments_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "value"
    )

    # Stage as 4 time-ordered files written sequentially (increasing
    # mtime) — the file source processes oldest-first, reproducing the
    # reference's arrival-order assumption.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    import pandas as pd

    edges = pd.date_range(lo, hi, periods=5)
    for i in range(4):
        chunk = ev.filter(
            (F.col("ts") >= str(edges[i]))
            & (F.col("ts") < str(edges[i + 1]) if i < 3 else F.lit(True))
        )
        chunk.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        segmenter.segment_stats_stream(stream, segment_size=SEG)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["user_id", "seg_idx"])
        .reset_index(drop=True)
    )

    # batch oracle: row_number bucketing, complete segments only
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    exp = (
        ev.withColumn("pos", F.row_number().over(w) - 1)
        .groupBy("user_id", F.floor(F.col("pos") / SEG).alias("seg_idx"))
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("seg_min"),
            F.max("value").alias("seg_max"),
            F.sum("value").alias("seg_sum"),
        )
        .filter(F.col("cnt") == SEG)
        .toPandas()
        .sort_values(["user_id", "seg_idx"])
        .reset_index(drop=True)
    )

    assert len(got) == len(exp), (len(got), len(exp))
    for c in ["user_id", "seg_idx", "cnt"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    for c in ["seg_min", "seg_max"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # float sum: stream accumulates sequentially, batch sum may
    # associate differently — bit-for-bit is not required here
    assert np.allclose(got["seg_sum"], exp["seg_sum"], rtol=0, atol=1e-9)
    # state never held raw values: completed segments appeared as soon
    # as their closing row arrived (implicit in equality above)


class _FakeState:
    """Minimal GroupState double for driving the kernel directly."""

    def __init__(self, tup=None, timed_out=False):
        self._tup = tup
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_set = None

    @property
    def exists(self):
        return self._tup is not None

    @property
    def get(self):
        return self._tup

    def update(self, tup):
        self.updated = tup

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_timeout_flushes_partial_segment_and_clears_state():
    chunk = segmenter.make_chunk(64, idle_timeout_ms=1000)
    st = _FakeState(tup=(3, 10, -1.5, 2.5, 7.0), timed_out=True)
    out = list(chunk((42,), iter([]), st))
    assert st.removed and len(out) == 1
    row = out[0].iloc[0]
    assert (row.user_id, row.seg_idx, row.cnt) == (42, 3, 10)
    assert (row.seg_min, row.seg_max, row.seg_sum) == (-1.5, 2.5, 7.0)


def test_timeout_with_empty_partial_emits_nothing():
    chunk = segmenter.make_chunk(64, idle_timeout_ms=1000)
    st = _FakeState(tup=(5, 0, 0.0, 0.0, 0.0), timed_out=True)
    assert list(chunk((42,), iter([]), st)) == []
    assert st.removed


def test_active_signal_rearms_timeout():
    import pandas as pd

    chunk = segmenter.make_chunk(4, idle_timeout_ms=1000)
    st = _FakeState()
    pdf = pd.DataFrame(
        {"ts": range(6), "event_id": range(6), "value": [1.0, 2, 3, 4, 5, 6]}
    )
    out = list(chunk((7,), iter([pdf]), st))
    assert st.timeout_set == 1000
    assert len(out) == 1 and out[0].iloc[0].cnt == 4  # one full segment
    assert st.updated[:2] == (1, 2)  # partial: seg 1, 2 values carried
