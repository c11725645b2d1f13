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
