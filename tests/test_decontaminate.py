"""Semantic invariants for q_decontaminate and q_domain_mix (hash
parity with the oracle is covered by test_oracle_parity; these pin the
properties parity alone can't express: set membership, quota
maximality, determinism)."""

from __future__ import annotations

import re

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators.curation import (
    DECON_N,
    MIX_WEIGHTS,
    TEST_BOUND,
    TRAIN_BOUND,
)
from timeseriesdb_spark.registry import QUERIES


def _ngrams(text: str, n: int) -> set[str]:
    ws = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_decontaminate_flags_are_real_overlaps(spark):
    """Every flagged doc is a train doc whose text really contains the
    reported n-gram, and that n-gram really appears in some test doc
    (recomputed independently in Python)."""
    import hashlib

    flagged = QUERIES["q_decontaminate"](spark, SF_DIR).toPandas()
    assert len(flagged), "fixture should produce at least one overlap"
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    docs["hp"] = docs["text"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest()[:2]
    )
    train = docs[docs.hp < TRAIN_BOUND].set_index("doc_id")["text"]
    test_ng = set()
    for t in docs[docs.hp >= TEST_BOUND]["text"]:
        test_ng |= _ngrams(t, DECON_N)
    for row in flagged.itertuples():
        assert row.doc_id in train.index, "flagged doc must be in train split"
        doc_ng = _ngrams(train.loc[row.doc_id], DECON_N)
        shared = doc_ng & test_ng
        assert row.first_shared in shared
        assert row.n_shared_ngrams == len(shared)


def test_domain_mix_quota_maximality(spark):
    """Selected docs fill each domain's quota greedily in hash order:
    total selected tokens <= quota, and the first unselected doc in
    hash order would overflow it (the selection is maximal)."""
    import hashlib

    sel = QUERIES["q_domain_mix"](spark, SF_DIR).toPandas()
    assert set(sel.domain) <= set(MIX_WEIGHTS)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "text")
        .toPandas()
    )
    docs["n_tokens"] = docs["text"].map(lambda t: t.count(" ") + 1)
    docs["h"] = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    for dom, grp in sel.groupby("domain"):
        quota = grp.quota_tokens.iloc[0]
        assert grp.n_tokens.sum() == grp.cum_tokens.max() <= quota
        pool = docs[docs.lang == dom].sort_values(["h", "doc_id"])
        chosen = set(grp.doc_id)
        # docs in hash order: the prefix is exactly the selection, and
        # the first doc past it overflows the quota
        prefix = []
        for row in pool.itertuples():
            if row.doc_id in chosen:
                prefix.append(row.doc_id)
            else:
                assert grp.cum_tokens.max() + row.n_tokens > quota
                break
        assert len(prefix) == len(chosen)


def test_domain_mix_respects_weights(spark):
    """The realized token mixture tracks MIX_WEIGHTS: every domain's
    share is within one document's tokens of weight_d * T (exact up to
    the floor and the last-doc boundary)."""
    sel = QUERIES["q_domain_mix"](spark, SF_DIR).toPandas()
    got = sel.groupby("domain").n_tokens.sum()
    quotas = sel.groupby("domain").quota_tokens.first()
    max_doc = sel.n_tokens.max()
    for dom in got.index:
        assert quotas[dom] - got[dom] <= max_doc
    # at least one domain binds (its quota is nearly exhausted)
    assert (quotas - got).min() <= max_doc
