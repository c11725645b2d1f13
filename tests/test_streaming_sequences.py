"""Streamed sequence-mining parity: the stateful trigram operator
(two-event tail per user) must close every triple exactly once across
batch boundaries, so the maintained tier reproduces q_event_ngrams
EXACTLY — including n_users — and stays identical through
compaction."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import SignalEngine
from timeseriesdb_spark.operators.funnels import q_event_ngrams
from timeseriesdb_spark.tables import load_table

COLS = ["rank", "e1", "e2", "e3", "n", "n_users"]


def test_streamed_event_ngrams_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    tier = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    edges = pd.date_range(lo, hi, periods=5)
    for i in range(4):
        chunk = ev.filter(
            (F.col("ts") >= str(edges[i]))
            & (F.col("ts") < str(edges[i + 1]) if i < 3 else F.lit(True))
        )
        # every user appears in several chunks -> trigram triples
        # genuinely straddle micro-batch boundaries
        chunk.coalesce(1).write.mode("append").parquet(src)

    eng = SignalEngine(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_event_ngrams_stream(stream, tier, ckpt)
    q.awaitTermination(180)

    got = eng.event_ngrams(tier).toPandas()[COLS]
    exp = q_event_ngrams(spark, SF_DIR).toPandas()[COLS]
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got.sort_values("rank").reset_index(drop=True),
        exp.sort_values("rank").reset_index(drop=True),
        check_dtype=False,
    )

    # compaction invariance: the per-(trigram, user) partial grain is
    # linear, so collapsing batch partitions cannot change any count
    n = eng.compact_partials(tier, "ngrams")
    assert n >= 4
    got2 = eng.event_ngrams(tier).toPandas()[COLS]
    pd.testing.assert_frame_equal(
        got2.sort_values("rank").reset_index(drop=True),
        got.sort_values("rank").reset_index(drop=True),
        check_dtype=False,
    )
