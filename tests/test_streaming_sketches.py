"""Streamed Count-Min maintenance parity: counter partials written
per micro-batch, merged at read, must equal the one-pass batch sketch
EXACTLY (CM is linear — partitioning the rows cannot change any
counter), and every point estimate must dominate the exact count."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.operators.aggregates import (
    CM_PROBE_KEYS,
    q_countmin_estimate,
)
from timeseriesdb_spark.tables import load_table


def test_streamed_cm_equals_batch_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    sketch = str(tmp_path / "sketch")
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

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_frequency_stream(stream, sketch, ckpt)
    q.awaitTermination(180)

    got = (
        eng.frequency_estimate(sketch, CM_PROBE_KEYS)
        .toPandas()
        .sort_values(["user_id", "key"])
        .reset_index(drop=True)
    )
    exp = (
        q_countmin_estimate(spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "key"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[["user_id", "key", "est_n"]],
        exp[["user_id", "key", "est_n"]],
        check_dtype=False,
    )
    # CM guarantee: estimates never under-count
    assert (exp["est_n"] >= exp["exact_n"]).all()

    # Compaction invariance: CM is linear, so collapsing batch
    # partitions cannot change any counter or estimate.
    n = eng.compact_partials(sketch, "cm")
    assert n >= 4
    got2 = (
        eng.frequency_estimate(sketch, CM_PROBE_KEYS)
        .toPandas()
        .sort_values(["user_id", "key"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got2[["user_id", "key", "est_n"]],
        got[["user_id", "key", "est_n"]],
        check_dtype=False,
    )


def test_streamed_heavy_hitters_equals_batch(spark, tmp_path):
    """The (day, key) partial is linear, and the top-K + residual
    summarization runs downstream of the merged exact counts — so the
    streamed tier must reproduce q_heavy_hitters EXACTLY, and stay
    identical through compaction."""
    from timeseriesdb_spark.operators.aggregates import q_heavy_hitters

    src = str(tmp_path / "src")
    tier = str(tmp_path / "hh")
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

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_heavyhitters_stream(stream, tier, ckpt)
    q.awaitTermination(180)

    cols = ["hh_rank", "key", "lb", "ub", "exact_n"]
    got = eng.heavy_hitters(tier).toPandas()[cols]
    exp = q_heavy_hitters(spark, SF_DIR).toPandas()[cols]
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got.sort_values("hh_rank").reset_index(drop=True),
        exp.sort_values("hh_rank").reset_index(drop=True),
        check_dtype=False,
    )

    n = eng.compact_partials(tier, "hh")
    assert n >= 4
    got2 = eng.heavy_hitters(tier).toPandas()[cols]
    pd.testing.assert_frame_equal(
        got2.sort_values("hh_rank").reset_index(drop=True),
        got.sort_values("hh_rank").reset_index(drop=True),
        check_dtype=False,
    )

    # day-range read path: pruning tier partials to [lo2, hi2] must
    # equal the batch sketch over the same event slice (residual
    # accounting re-derives for exactly the days in range)
    from timeseriesdb_spark.operators.aggregates import (
        hh_day_counts,
        hh_from_day_counts,
    )

    lo2, hi2 = str(edges[1]), str(edges[3])
    ranged = eng.heavy_hitters(tier, start_day=lo2, end_day=hi2)
    sliced = ev.filter(
        (F.date_trunc("day", F.col("ts")) >= lo2)
        & (F.date_trunc("day", F.col("ts")) <= hi2)
    )
    exp_ranged = hh_from_day_counts(hh_day_counts(sliced))
    pd.testing.assert_frame_equal(
        ranged.toPandas()[cols].sort_values("hh_rank").reset_index(drop=True),
        exp_ranged.toPandas()[cols]
        .sort_values("hh_rank")
        .reset_index(drop=True),
        check_dtype=False,
    )


def test_streamed_hll_registers_equal_batch(spark, tmp_path):
    """The seeded-md5 HLL register tier (r11): max is associative and
    idempotent, so registers merged from per-micro-batch partials must
    equal q_hll_register_table EXACTLY however the rows were split,
    stay identical through compaction, and the served estimate must
    equal q_hll_estimate's column bit-for-bit."""
    from timeseriesdb_spark.operators.chunking import (
        q_hll_estimate,
        q_hll_register_table,
    )

    src = str(tmp_path / "src")
    tier = str(tmp_path / "hllreg")
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

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_hll_register_stream(stream, tier, ckpt)
    q.awaitTermination(180)

    key = ["user_id", "event_date", "register_idx"]
    got = eng.hll_registers(tier).toPandas().sort_values(key)
    exp = (
        q_hll_register_table(spark, SF_DIR).toPandas().sort_values(key)
    )
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )

    n = eng.compact_partials(tier, "hllreg")
    assert n >= 4
    got2 = eng.hll_registers(tier).toPandas().sort_values(key)
    pd.testing.assert_frame_equal(
        got2.reset_index(drop=True),
        got.reset_index(drop=True),
        check_dtype=False,
    )

    est = (
        eng.hll_distinct_estimate(tier)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp_est = (
        q_hll_estimate(spark, SF_DIR)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert (est["n_regs"].values == exp_est["n_regs"].values).all()
    assert (
        est["approx_distinct"].values == exp_est["approx_distinct"].values
    ).all()  # bit-identical doubles, not approx-equal

    # day-range read path: pruning tier partials to [lo2, hi2] must
    # equal the batch register table over the same event slice
    from timeseriesdb_spark.operators.chunking import _hll_registers

    lo2, hi2 = str(edges[1]), str(edges[2])
    ranged = (
        eng.hll_registers(tier, start_day=lo2, end_day=hi2)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    sliced = ev.filter(
        (F.date_trunc("day", F.col("ts")) >= lo2)
        & (F.date_trunc("day", F.col("ts")) <= hi2)
    )
    exp_ranged = (
        _hll_registers(sliced)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(ranged) == len(exp_ranged) > 0
    pd.testing.assert_frame_equal(ranged, exp_ranged, check_dtype=False)
