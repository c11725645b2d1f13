"""BPE merge learning: the kernel is pinned on the classic
low/lower/newest/widest corpus (hand-computed merge sequence), and the
corpus query smoke-runs with a full, deterministic merge table."""

from __future__ import annotations

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.tokenizer import (
    BPE_MERGES,
    learn_bpe_merges,
    q_bpe_merges,
)

CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_classic_corpus_merge_sequence():
    merges = learn_bpe_merges(CLASSIC, 5)
    assert merges == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_merges_deterministic_under_vocab_order():
    a = learn_bpe_merges(CLASSIC, 5)
    b = learn_bpe_merges(list(reversed(CLASSIC)), 5)
    assert a == b


def test_merge_is_left_to_right_non_overlapping():
    # 'aaaa' ×1: pairs (a,a)=3 → left-to-right merge yields
    # ('aa','aa','</w>') — NOT ('aa','a','a','</w>'). The count 3
    # (overlapping pairs counted) and the next round's candidates
    # {('aa','aa'), ('aa','</w>')} both pin that. Tie at 1 breaks
    # lexicographically: '</w>' < 'aa' ('<' sorts before letters).
    merges = learn_bpe_merges([("aaaa", 1)], 3)
    assert merges[0] == (0, "a", "a", 3)
    assert merges[1] == (1, "aa", "</w>", 1)
    assert merges[2] == (2, "aa", "aa</w>", 1)


def test_corpus_query_smoke(spark):
    got = q_bpe_merges(spark, SF_DIR).toPandas()
    assert len(got) == BPE_MERGES
    assert got["rank"].tolist() == list(range(BPE_MERGES))
    # merge table is internally consistent: every later symbol either
    # is a single char or was produced by an earlier merge
    produced = set()
    for _, row in got.iterrows():
        for s in (row["left"], row["right"]):
            assert len(s) == 1 or s == "</w>" or s in produced
        produced.add(row["left"] + row["right"])
    assert (got["pair_count"] > 0).all()
