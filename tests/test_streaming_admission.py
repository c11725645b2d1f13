"""Admission-control parity: per-signal caps hold per tumbling window
across micro-batch AND Arrow-chunk boundaries, admission order is
deterministic earliest-(ts, event_id), and no row is lost — every
input comes out exactly once, flagged."""

from __future__ import annotations

import pandas as pd

from timeseriesdb_spark.streaming import admission

CAP, WIN_S = 10, 60


def _mk(uid: int, n: int, t0: str, step_s: int = 1) -> pd.DataFrame:
    base = pd.Timestamp(t0)
    return pd.DataFrame(
        {
            "user_id": uid,
            "event_id": range(n),
            "ts": [base + pd.Timedelta(seconds=i * step_s) for i in range(n)],
            "value": [float(i) for i in range(n)],
        }
    )


def test_cap_holds_across_micro_batches_and_chunks(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # 50 rows for key 1 inside ONE 60 s window, split across two
    # micro-batch files (25 + 25) — the cap must count ACROSS batches.
    # Key 2 gets 8 rows (under cap, all admitted). Files are written
    # in shuffled row order to exercise the sort contract.
    pdf = _mk(1, 50, "2024-01-01 00:00:00")
    k2 = _mk(2, 8, "2024-01-01 00:00:00")
    first = pd.concat(
        [pdf.iloc[:25].sample(frac=1, random_state=3), k2],
        ignore_index=True,
    )
    second = pdf.iloc[25:].sample(frac=1, random_state=4)
    sdf1 = spark.createDataFrame(first)
    sdf1.coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(second).coalesce(1).write.mode("append").parquet(src)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")  # force multi-chunk key slices
        stream = (
            spark.readStream.schema(sdf1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            admission.admitted_stream(stream, CAP, WIN_S)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set(key, old)

    got = spark.read.parquet(out).toPandas()
    # conservation: every row exactly once
    assert len(got) == 58
    k1 = got[got.user_id == 1].sort_values("event_id")
    # deterministic earliest-CAP admission: event_ids 0..9 (seconds
    # 0..9, all within the first window) admitted, the rest shed
    assert k1[k1.admitted]["event_id"].tolist() == list(range(CAP))
    assert (~k1[k1.event_id >= CAP]["admitted"]).all()
    # under-cap key fully admitted
    assert got[got.user_id == 2]["admitted"].all()


def test_cap_resets_per_window(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # 30 rows at 4 s spacing spans two 60 s windows (15 rows each);
    # cap 10 → 10 admitted per window, 5 shed per window.
    pdf = _mk(1, 30, "2024-01-01 00:00:00", step_s=4)
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(sdf.schema).parquet(src)
    q = (
        admission.admitted_stream(stream, CAP, WIN_S)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).toPandas().sort_values("event_id")
    win = (
        got["ts"].astype("datetime64[us]").astype("int64")
        // (WIN_S * 1_000_000)
    )
    per_win = got.groupby(win)["admitted"].agg(["sum", "count"])
    assert per_win["count"].tolist() == [15, 15]
    assert per_win["sum"].tolist() == [CAP, CAP]
    # within each window the admitted rows are the earliest ones
    for _, grp in got.groupby(win):
        grp = grp.sort_values(["ts", "event_id"])
        assert grp["admitted"].tolist() == [True] * CAP + [False] * 5


def test_engine_ingest_stream_admitted(spark, tmp_path):
    # Facade wiring: admitted rows land in the signal store, shed rows
    # in the dead-letter path, nothing lost.
    from timeseriesdb_spark.api import SignalEngine

    src = str(tmp_path / "src")
    store_path = str(tmp_path / "store")
    shed = str(tmp_path / "shed")
    ckpt = str(tmp_path / "ckpt")

    pdf = _mk(1, 30, "2024-01-01 00:00:00")  # one window, cap 10
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("overwrite").parquet(src)

    eng = SignalEngine(spark, store_path)
    stream = spark.readStream.schema(sdf.schema).parquet(src)
    q = eng.ingest_stream_admitted(stream, ckpt, CAP, WIN_S, shed_path=shed)
    q.awaitTermination(180)

    kept = eng.events().toPandas()
    dropped = spark.read.parquet(shed).toPandas()
    assert len(kept) == CAP
    assert len(dropped) == 30 - CAP
    assert sorted(kept["event_id"]) == list(range(CAP))
    assert set(kept.columns) & {"admitted"} == set()
