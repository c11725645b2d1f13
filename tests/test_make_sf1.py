"""Properties of the sf1 generator's per-replica document transform
(scripts/make_sf1.py) — the absolute-scale corpus must grow HONESTLY:

- the stride word permutation is a bijection (same word multiset, so
  unigram stats / token counts / lengths are scale-invariant),
- replicas are NOT shingle-space near-copies of their source document
  (the failure the first sf1 cut had with a plain rotation: every
  interior 3-shingle survived, so ngram dedup saw one 10x-duplicated
  corpus instead of a 10x corpus),
- distinct replicas of the same document differ from each other.

Pure-python tests over the imported generator — no Spark, no I/O.
"""

import importlib.util
import os
import sys
from collections import Counter

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_SPEC = importlib.util.spec_from_file_location(
    "make_sf1",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "make_sf1.py"),
)
make_sf1 = importlib.util.module_from_spec(_SPEC)
sys.modules["make_sf1"] = make_sf1
_SPEC.loader.exec_module(make_sf1)


def _perm_text(text: str, k: int) -> str:
    tk = pa.Table.from_pylist([
        {"doc_id": 1, "text": text, "n_chars": len(text)}
    ])
    out = make_sf1._doc_transform(tk, k)
    return out.to_pylist()[0]["text"]


def _shingles(text: str, n: int = 3) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=2,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(words=WORDS, k=st.integers(min_value=1, max_value=9))
def test_stride_perm_is_bijection_preserving_multiset(words, k):
    text = " ".join(words)
    out = _perm_text(text, k)
    assert Counter(out.split(" ")) == Counter(words)
    assert len(out) == len(text)  # n_chars scale-invariant


@settings(max_examples=100, deadline=None)
@given(words=WORDS)
def test_distinct_replicas_differ_when_permutable(words):
    """Two replicas with different strides produce different word
    orders whenever the document has enough distinct structure for a
    permutation to show (skip degenerate all-same-word docs)."""
    text = " ".join(words)
    if len(set(words)) < 2 or len(words) < 4:
        return
    outs = {_perm_text(text, k) for k in (1, 2, 3)}
    # at least two of three replicas must differ (identical strides
    # can collide only when the effective stride coincides mod n)
    assert len(outs) >= 2


def test_replica_breaks_shingle_identity_on_long_docs():
    """The property the rotation LACKED: on a realistic document the
    replica's 3-shingle set must be nearly disjoint from the source's
    (interior shingles must not survive wholesale)."""
    words = [f"w{i % 17}" for i in range(120)]
    text = " ".join(words)
    src = _shingles(text)
    for k in (1, 2, 5):
        rep = _shingles(_perm_text(text, k))
        overlap = len(src & rep) / len(src)
        assert overlap < 0.25, (
            f"replica k={k} kept {overlap:.0%} of source shingles — "
            "shingle-space near-copy, the rotation bug"
        )


def test_rowcount_and_schema_preserved():
    tk = pa.Table.from_pylist(
        [
            {"doc_id": i, "text": "a b c d e f g h", "n_chars": 15}
            for i in range(10)
        ]
    )
    out = make_sf1._doc_transform(tk, 3)
    assert out.num_rows == 10
    assert set(out.column_names) == {"doc_id", "text", "n_chars"}


@pytest.mark.parametrize("n", [2, 3, 4, 5, 6, 9, 10, 15, 33])
def test_stride_coprime_fallback_every_length(n):
    """gcd escalation must yield a bijection for every word count,
    including counts sharing factors with every base stride."""
    words = [f"u{i}" for i in range(n)]
    out = _perm_text(" ".join(words), 1)
    assert sorted(out.split(" ")) == sorted(words)
