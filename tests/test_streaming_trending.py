"""Streamed trending-terms parity: (source, term) count partials
written per micro-batch, merged at read, finalized by the shared
heavy-hitter summarization — must equal the batch q_trending_terms
EXACTLY, and stay identical through compaction."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.api import CorpusEngine
from timeseriesdb_spark.operators.text import q_trending_terms
from timeseriesdb_spark.tables import load_table


def _sorted(df) -> pd.DataFrame:
    return df.toPandas().sort_values("hh_rank").reset_index(drop=True)


def test_streamed_trending_terms_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    tier = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")

    doc = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )
    n = doc.count()
    for i in range(4):  # 4 doc_id-range files → 4 micro-batches
        chunk = doc.filter(
            (F.col("doc_id") % 4) == i
        )
        chunk.coalesce(1).write.mode("append").parquet(src)

    eng = CorpusEngine(spark, str(tmp_path / "corpus"))
    stream = (
        spark.readStream.schema(doc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = eng.maintain_trending_terms_stream(stream, tier, ckpt)
    q.awaitTermination(180)

    got = _sorted(eng.trending_terms(tier))
    exp = _sorted(q_trending_terms(spark, SF_DIR))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # tier sanity: bounds bracket the exact count
    assert ((got["lb"] <= got["exact_n"]) & (got["exact_n"] <= got["ub"])).all()
    assert n > 0

    # compaction invariance: the (source, term) partial is linear
    nc = eng.compact_partials(tier, "terms")
    assert nc >= 4
    pd.testing.assert_frame_equal(
        _sorted(eng.trending_terms(tier)), got, check_dtype=False
    )
