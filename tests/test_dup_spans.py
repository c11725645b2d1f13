"""q_dup_spans structural invariants: spans lie inside their document,
are disjoint and >= SPAN_MIN_WORDS words, and every span's text
actually occurs verbatim in at least one other document (the
exact-substring-dedup contract)."""

from __future__ import annotations

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.dedup import (
    SPAN_MIN_WORDS,
    q_dup_spans,
)
from timeseriesdb_spark.tables import load_table


def test_dup_spans_invariants(spark):
    out = q_dup_spans(spark, SF_DIR).toPandas()
    assert len(out) > 0
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    corpus_text = {d: " ".join(w) for d, w in docs.items()}
    checked = 0
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("span_start")
        prev_end = -1
        for _, r in g.iterrows():
            # islands are maximal runs of HIT POSITIONS; two islands
            # one missing position apart have shingle extents touching
            # (k−1 word overlap is impossible, touching is) — so
            # starts never precede the previous extent's end
            assert r["span_start"] >= prev_end  # ordered, near-disjoint
            assert r["span_end"] < len(docs[doc_id])
            assert r["span_end"] - r["span_start"] + 1 >= SPAN_MIN_WORDS
            prev_end = r["span_end"]
        # spot-check the first span per doc: its words appear verbatim
        # in some OTHER document (bounded work: one span per doc)
        r = g.iloc[0]
        span = " ".join(
            docs[doc_id][int(r["span_start"]) : int(r["span_start"]) + 3]
        )
        assert any(
            span in t for d, t in corpus_text.items() if d != doc_id
        ), (doc_id, span)
        checked += 1
    assert checked > 0


def test_trim_spans_invariants(spark):
    """locate→trim contract: counts reconcile, trimmed text is the
    doc's uncovered words in order, and no trimmed doc still contains
    its own first duplicated span verbatim."""
    from timeseriesdb_spark.operators.dedup import q_trim_spans

    spans = q_dup_spans(spark, SF_DIR).toPandas()
    out = q_trim_spans(spark, SF_DIR).toPandas()
    assert set(out["doc_id"]) == set(spans["doc_id"])
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for _, r in out.iterrows():
        words = docs[r["doc_id"]]
        assert r["n_kept"] + r["n_removed"] == len(words)
        g = spans[spans.doc_id == r["doc_id"]]
        cov = set()
        for _, s in g.iterrows():
            cov |= set(range(int(s["span_start"]), int(s["span_end"]) + 1))
        expect = " ".join(
            w for i, w in enumerate(words) if i not in cov
        )
        assert r["trimmed_text"] == expect
        assert r["n_removed"] == len(cov)
