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


def test_apply_bpe_round_trip_and_trainer_parity():
    # Applying the learned table in rank order must reproduce the
    # trainer's final symbol sequences on its own corpus, and tokens
    # must concat back to word + end-of-word marker for ANY word.
    from timeseriesdb_spark.operators.tokenizer import (
        END_OF_WORD,
        apply_bpe,
        learn_bpe_merges,
    )

    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = [(a, b) for _, a, b, _ in learn_bpe_merges(vocab, 10)]
    # trainer-side final sequences
    seqs = {w: tuple(w) + (END_OF_WORD,) for w, _ in vocab}
    for a, b in merges:
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = tuple(out)
    for w, _ in vocab:
        assert tuple(apply_bpe(w, merges)) == seqs[w], w
    for w in ["lowest", "newlow", "zzz", "a", ""]:
        toks = apply_bpe(w, merges)
        assert "".join(toks) == w + END_OF_WORD
        assert len(toks) <= len(w) + 1


def test_bpe_encode_query_accounting(spark):
    from tests.conftest import SF_DIR
    from timeseriesdb_spark.operators.tokenizer import q_bpe_encode

    rows = q_bpe_encode(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:200]:
        # merges only shrink: chars + eow-markers bounds tokens above,
        # one token per word bounds below
        assert r.n_words <= r.n_tokens <= r.n_chars + r.n_words, r
        if r.n_tokens:
            # half-up integer millionths, pure bigint arithmetic
            want = (2 * r.n_chars * 1000000 + r.n_tokens) // (2 * r.n_tokens)
            assert r.cpt_micros == want
        else:
            assert r.cpt_micros is None


def test_bpe_encode_matches_apply_kernel(spark):
    # The distributed encoder must produce EXACTLY the token counts of
    # the module-level apply_bpe kernel under the corpus_merges table —
    # pinning the executor closure to the tested kernel (no drift
    # between trainer-derived merges and the encoder's).
    from tests.conftest import SF_DIR
    from timeseriesdb_spark.operators.tokenizer import (
        apply_bpe,
        corpus_merges,
        q_bpe_encode,
    )
    from timeseriesdb_spark.tables import load_table

    merges = [(a, b) for _, a, b, _ in corpus_merges(spark, SF_DIR)]
    got = {r.doc_id: r.n_tokens for r in q_bpe_encode(spark, SF_DIR).collect()}
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    )
    assert docs
    for r in docs:
        words = [w for w in r.text.split(" ") if w]
        want = sum(len(apply_bpe(w, merges)) for w in words)
        assert got[r.doc_id] == want, r.doc_id
