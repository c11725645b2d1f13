"""RAKE keyphrase semantics pinned on a hand-computed document:
phrase segmentation at stopwords, degree/freq word scores, phrase
score = sum of member-word micros, tie-breaks."""

from __future__ import annotations

import timeseriesdb_spark.operators.text as text_mod
from timeseriesdb_spark.operators.text import KP_TOPK, q_keyphrases


def test_rake_hand_computed(spark, monkeypatch):
    # doc: "deep learning of deep models a fast scan"
    #   stopwords: of, a  ->  phrases:
    #   P1 = "deep learning" (len 2), P2 = "deep models" (len 2),
    #   P3 = "fast scan" (len 2)
    # word stats (per doc): deep freq=2 degree=4; learning 1/2;
    #   models 1/2; fast 1/2; scan 1/2
    # w_micros: deep 2.0 -> 2_000_000; others 2_000_000 each
    # phrase scores: every phrase = 4_000_000 -> ties break by phrase
    # text ASC: "deep learning" < "deep models" < "fast scan"
    doc = spark.createDataFrame(
        [
            (1, "deep learning of deep models a fast scan"),
            # single phrase, repeated word: "big big data"
            #   big freq=2 degree=6, data freq=1 degree=3
            #   w_micros: big 3_000_000, data 3_000_000
            #   phrase score = 3M + 3M + 3M = 9_000_000 (per occurrence)
            (2, "big big data"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(
        text_mod, "load_table", lambda sp, sf, t: doc
    )
    rows = {
        (r.doc_id, r.rank): (r.phrase, r.plen, r.score_micros)
        for r in q_keyphrases(spark, "ignored").collect()
    }
    assert rows[(1, 1)] == ("deep learning", 2, 4_000_000)
    assert rows[(1, 2)] == ("deep models", 2, 4_000_000)
    assert rows[(1, 3)] == ("fast scan", 2, 4_000_000)
    assert rows[(2, 1)] == ("big big data", 3, 9_000_000)
    assert len([k for k in rows if k[0] == 1]) == KP_TOPK
    assert len([k for k in rows if k[0] == 2]) == 1
