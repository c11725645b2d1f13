"""Streaming sustained-threshold parity: every episode CLOSED by a
later sample must equal the batch gaps-and-islands query exactly;
episodes still open at end-of-stream stay in state (an alert that
never clears never resolves)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.tsanalytics import (
    SUSTAIN_K,
    SUSTAIN_TH,
    q_sustained_threshold,
)
from timeseriesdb_spark.streaming import alerts
from timeseriesdb_spark.tables import load_table

COLS = ["user_id", "start_ts", "end_ts", "n_samples", "peak_value"]


def test_stream_alerts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
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
        alerts.alert_stream(stream, SUSTAIN_TH, SUSTAIN_K)
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
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )

    # Expected = batch episodes minus each signal's still-open tail run
    # (signals whose LAST sample breaches have an unresolved episode).
    exp_all = q_sustained_threshold(spark, SF_DIR).toPandas()
    last = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value")
        .toPandas()
    )
    open_tail = last[last["value"] > SUSTAIN_TH][["user_id", "ts"]].rename(
        columns={"ts": "end_ts"}
    )
    exp = (
        exp_all.merge(
            open_tail.assign(_open=True), on=["user_id", "end_ts"], how="left"
        )
        .query("_open.isna()")
        .drop(columns="_open")
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )

    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)


class _FakeState:
    """Minimal GroupState stand-in for kernel-level unit tests."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def test_episode_kernel_handles_out_of_order_chunks():
    # applyInPandasWithState delivers a key's micro-batch in arbitrary
    # post-shuffle order split into Arrow chunks: the kernel must
    # concat + sort ONCE, not per chunk. One 6-sample breaching
    # episode split across two chunks with interleaved timestamps
    # must come out as exactly one episode, not two.
    import pandas as pd

    from timeseriesdb_spark.streaming.alerts import make_detector

    def row(eid, us, v):
        return {"user_id": 1, "event_id": eid,
                "ts": pd.Timestamp(us * 1000), "value": v}

    # breach at ts 1..6, calm at 7 closes it; chunks interleave ts
    chunk_a = pd.DataFrame([row(2, 2, 9.0), row(4, 4, 9.5), row(6, 6, 9.0),
                            row(7, 7, 0.0)])
    chunk_b = pd.DataFrame([row(1, 1, 9.0), row(3, 3, 9.0), row(5, 5, 9.0)])
    detect = make_detector(threshold=5.0, min_len=4)
    st = _FakeState()
    out = list(detect((1,), iter([chunk_a, chunk_b]), st))
    assert len(out) == 1 and len(out[0]) == 1, out
    ep = out[0].iloc[0]
    assert ep["n_samples"] == 6
    assert ep["peak_value"] == 9.5
    assert not st.exists  # calm sample cleared the open episode


def test_rate_kernel_handles_out_of_order_chunks():
    import numpy as np
    import pandas as pd

    from timeseriesdb_spark.streaming.rates import make_counter_rate

    def row(eid, us, v):
        return {"user_id": 1, "event_id": eid,
                "ts": pd.Timestamp(us * 1000), "value": v}

    # monotone counter 10,20,30,40 split into interleaved chunks:
    # per-chunk processing would see 20,40 then 10,30 and emit a
    # phantom reset; whole-batch sort gives deltas 10,10,10.
    chunk_a = pd.DataFrame([row(2, 2, 20.0), row(4, 4, 40.0)])
    chunk_b = pd.DataFrame([row(1, 1, 10.0), row(3, 3, 30.0)])
    rate = make_counter_rate()
    st = _FakeState()
    out = pd.concat(list(rate((1,), iter([chunk_a, chunk_b]), st)))
    out = out.sort_values("event_id")
    assert out["is_reset"].sum() == 0, out
    assert np.allclose(out["inc_raw"].to_numpy()[1:], [10.0, 10.0, 10.0])
    assert st.get == (40.0,)

def test_stream_alerts_key_spanning_many_arrow_chunks(spark, tmp_path):
    """The cross-chunk contract: a key whose micro-batch slice exceeds
    spark.sql.execution.arrow.maxRecordsPerBatch arrives at the kernel
    split into several Arrow chunks, in arbitrary order — the kernel
    must concat the whole slice and sort ONCE before the island scan.
    Forced here with 100-row chunks, 360 rows for one key in a single
    micro-batch, written to the source in shuffled row order so any
    per-chunk sort (the pre-fix bug) would split or merge episodes."""
    import numpy as np

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # pattern: 36 cycles of (7 breaching, 3 calm) → 36 closed episodes
    # of exactly 7 samples each; ends calm, so nothing stays open
    n_cycles, hot, calm = 36, 7, 3
    vals, ids, tss = [], [], []
    t0 = pd.Timestamp("2024-01-01")
    i = 0
    for _ in range(n_cycles):
        for _ in range(hot):
            vals.append(200.0 + (i % 5))
            ids.append(i)
            tss.append(t0 + pd.Timedelta(seconds=i))
            i += 1
        for _ in range(calm):
            vals.append(1.0)
            ids.append(i)
            tss.append(t0 + pd.Timedelta(seconds=i))
            i += 1
    pdf = pd.DataFrame(
        {"user_id": 1, "event_id": ids, "ts": tss, "value": vals}
    )
    rng = np.random.RandomState(7)
    pdf = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("overwrite").parquet(src)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "100")
        stream = spark.readStream.schema(sdf.schema).parquet(src)
        q = (
            alerts.alert_stream(stream, SUSTAIN_TH, SUSTAIN_K)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set(key, old)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("start_ts")
        .reset_index(drop=True)
    )
    assert len(got) == n_cycles, len(got)
    assert (got["n_samples"] == hot).all(), got["n_samples"].tolist()
    # episode i spans seconds [10i, 10i+6]
    starts = [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=10 * c)
              for c in range(n_cycles)]
    ends = [s + pd.Timedelta(seconds=hot - 1) for s in starts]
    assert got["start_ts"].tolist() == starts
    assert got["end_ts"].tolist() == ends
    assert (got["peak_value"] >= 200.0).all()
