"""Connected-components dedup clustering: the distributed min-label
propagation must reproduce a driver-side union-find over the same
candidate edges, and the canonical-survivor rule must be total.
"""

from __future__ import annotations

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import dedup


def _union_find(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component (find roots are already mins only if
    # unions always attached the larger root — which they did)
    return {n: find(n) for n in nodes}


def test_clusters_match_union_find(spark):
    docs = [
        r.doc_id
        for r in dedup.load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    ]
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.q_minhash_lsh_pairs(spark, SF_DIR)
        .filter(f"est_jaccard >= {dedup.CC_MIN_EST}")
        .collect()
    ]
    assert pairs, "no candidate edges at this sf — hollow test"
    expected = _union_find(docs, pairs)
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.q_dedup_clusters(spark, SF_DIR).collect()
    }
    assert got == expected


def test_clusters_total_and_canonical(spark):
    rows = dedup.q_dedup_clusters(spark, SF_DIR).collect()
    n_docs = dedup.load_table(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs  # every doc decided, incl. singletons
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members)  # canonical = min id
        assert all(m.cluster_size == len(members) for m in members)


import pytest


@pytest.mark.parametrize("driver_bound", [None, 0])
def test_cluster_pairs_adversarial_topologies(spark, driver_bound):
    """CC core on hand-adversarial graphs: a long chain (worst case for
    label propagation depth — pointer jumping must converge within
    CC_MAX_ITERS), disjoint cliques, a star, and isolated nodes.
    Parametrized over BOTH execution paths (r8 hybrid): driver
    union-find (default at this size) and, with driver_bound=0, the
    distributed min-label loop — identical labels required."""
    chain = [(i, i + 1) for i in range(300)]
    clique = [(1000 + a, 1000 + b) for a in range(8) for b in range(a + 1, 8)]
    star = [(2000, 2000 + k) for k in range(1, 20)]
    pairs = chain + clique + star
    nodes = list(range(0, 301)) + [1000 + k for k in range(8)] + [
        2000 + k for k in range(20)
    ] + [9999, 10000]  # isolated

    docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.cluster_pairs(docs, pdf, driver_bound=driver_bound).collect()
    }
    exp = _union_find(nodes, pairs)
    assert got == exp
    # chain collapses to one component labeled by its min node
    assert {got[i] for i in range(301)} == {0}
    assert got[9999] == 9999 and got[10000] == 10000


@pytest.mark.parametrize("driver_bound", [None, 0])
def test_cluster_pairs_random_graphs(spark, driver_bound):
    """Randomized graphs (fixed seeds — deterministic) vs union-find,
    over both CC execution paths."""
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        nodes = list(range(rng.randint(2, 120)))
        n_edges = rng.randint(0, 150)
        pairs = [
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(n_edges)
            if len(nodes) >= 2
        ]
        docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
        pdf = spark.createDataFrame(
            pairs or [(0, 0)], "doc_a long, doc_b long"
        )
        if not pairs:
            pdf = pdf.limit(0)
        got = {
            r.doc_id: r.cluster_id
            for r in dedup.cluster_pairs(
                docs, pdf, driver_bound=driver_bound
            ).collect()
        }
        assert got == _union_find(nodes, pairs), f"seed {seed}"


def test_lsh_recall_invariants(spark):
    """q_lsh_recall's accounting invariants on a crafted corpus with a
    full similarity spectrum (identical, high-, mid-, low-overlap and
    disjoint docs): truth counts non-increasing in the threshold,
    caught <= min(truth, candidates), candidate count constant across
    thresholds, and both ratios equal to their half-up integer-
    millionths definition recomputed from the counts."""
    from pyspark.sql import functions as F

    from timeseriesdb_spark.operators.dedup import (
        LSH_EVAL_T_MICROS,
        lsh_pairs,
        q_lsh_recall,
    )
    import timeseriesdb_spark.tables as tables

    texts = []
    words = [f"w{i}" for i in range(200)]
    # pairs of docs sharing a prefix of varying length -> a spread of
    # exact Jaccard values across the eval thresholds
    for share in (40, 30, 20, 10, 4, 0):
        a = " ".join(words[:40])
        b = " ".join(words[:share] + words[100 : 140 - share])
        texts += [a, b]
    rows = [
        (i, t, "en", "crafted", len(t)) for i, t in enumerate(texts)
    ]
    doc = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    # run the query body against the crafted frame via monkeypatched
    # load_table (q_lsh_recall only reads `documents`)
    orig = tables.load_table
    try:
        tables.load_table = lambda sp, sf, t: doc
        import timeseriesdb_spark.operators.dedup as dd

        dd_orig = dd.load_table
        dd.load_table = lambda sp, sf, t: doc
        try:
            out = {
                r.t_micros: r for r in q_lsh_recall(spark, "ignored").collect()
            }
        finally:
            dd.load_table = dd_orig
    finally:
        tables.load_table = orig

    assert sorted(out) == sorted(LSH_EVAL_T_MICROS)
    n_cands = {r.n_cand for r in out.values()}
    assert len(n_cands) == 1  # candidate set independent of threshold
    prev_truth = None
    for t in sorted(out):
        r = out[t]
        assert 0 <= r.n_caught <= min(r.n_truth, r.n_cand), r
        if prev_truth is not None:
            assert r.n_truth <= prev_truth  # truth shrinks as t grows
        prev_truth = r.n_truth
        if r.n_truth:
            want = (2 * r.n_caught * 1_000_000 + r.n_truth) // (2 * r.n_truth)
            assert r.recall_micros == want
        else:
            assert r.recall_micros is None
        if r.n_cand:
            want = (2 * r.n_caught * 1_000_000 + r.n_cand) // (2 * r.n_cand)
            assert r.precision_micros == want
    # the spectrum actually spans the thresholds: strictly more truth
    # at the lowest threshold than the highest
    assert out[min(out)].n_truth > out[max(out)].n_truth
