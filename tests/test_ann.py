"""ANN correctness properties: IVF with full probing is exact
(== brute force), partial probing trades recall for the scan skip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import similarity
from timeseriesdb_spark.registry import QUERIES


def _topk_ids(df):
    return [r.vec_id for r in df.collect()]


def test_ivf_full_probe_is_exact(spark, monkeypatch):
    monkeypatch.setattr(similarity, "IVF_NPROBE", similarity.IVF_CELLS)
    brute = _topk_ids(QUERIES["q_ann_topk"](spark, SF_DIR))
    ivf = _topk_ids(similarity.q_ann_ivf(spark, SF_DIR))
    assert ivf == brute


def test_ivf_partial_probe_recall(spark):
    brute = set(_topk_ids(QUERIES["q_ann_topk"](spark, SF_DIR)))
    ivf = set(_topk_ids(QUERIES["q_ann_ivf"](spark, SF_DIR)))
    assert len(ivf) == similarity.TOP_K
    recall = len(brute & ivf) / len(brute)
    # nprobe/cells = 2/8; cosine-homogeneous synthetic corpus → recall
    # well above the 25% scan fraction
    assert recall >= 0.3, recall


def test_ivf_results_are_real_neighbors(spark):
    rows = QUERIES["q_ann_ivf"](spark, SF_DIR).collect()
    sims = [r.cos_t for r in rows]  # integer ten-thousandths
    assert sims == sorted(sims, reverse=True)
    assert all(-10_000 <= s <= 10_000 for s in sims)


def test_neardup_block_count_scales_with_corpus():
    """One packed block must stay ≈ NEARDUP_BLOCK_BYTES at any corpus
    size (the collect_list row / 2 GB Arrow wall)."""
    B = similarity.NEARDUP_BLOCK_BYTES
    for n in (0, 1, 10_000, 1_000_000, 33_000_000, 1_000_000_000):
        b = similarity.neardup_blocks(n)
        assert b >= similarity.NEARDUP_MIN_BLOCKS
        per_block_bytes = (n / b) * similarity.DIM * 8
        assert per_block_bytes <= B, (n, b, per_block_bytes)
    # monotone: bigger corpora never get fewer blocks
    sizes = [similarity.neardup_blocks(n) for n in (1, 10**6, 10**8, 10**9)]
    assert sizes == sorted(sizes)


def test_neardup_skewed_corpus_block_invariant(spark, tmp_path, monkeypatch):
    """Skewed synthetic corpus (dense low vec_ids, sparse tail): every
    packed block row stays under the byte target after mod-B hashing,
    and the pair output matches a direct numpy check."""
    import numpy as np

    rng = np.random.default_rng(7)
    # dense ids in [0, 180), sparse tail spread to 100k — mod-B still spreads
    ids = np.concatenate(
        [np.arange(180), np.unique(rng.integers(200, 100_000, 40))]
    )
    dim = similarity.DIM
    vecs = rng.normal(size=(len(ids), dim))
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": ids.astype("int64"),
         "embedding": [v.astype("float32").tolist() for v in vecs],
         "label": np.zeros(len(ids), dtype="int64")}
    )
    d = str(tmp_path / "emb")
    spark.createDataFrame(pdf).write.parquet(d)
    # shrink the byte target so the small corpus still exercises B > min
    monkeypatch.setattr(similarity, "NEARDUP_BLOCK_BYTES", 8 * dim * 8)

    def fake_load(sp, sf_dir, name):
        assert name == "embeddings"
        return sp.read.parquet(d)

    monkeypatch.setattr(similarity, "load_table", fake_load)
    b = similarity.neardup_blocks(len(ids))
    # block-size invariant under the skewed id distribution
    emb = spark.read.parquet(d)
    from pyspark.sql import functions as F

    per_blk = (
        emb.groupBy(F.pmod("vec_id", F.lit(b)).alias("blk")).count().collect()
    )
    assert max(r["count"] for r in per_blk) * dim * 8 <= 2 * similarity.NEARDUP_BLOCK_BYTES
    # end-to-end result matches a direct numpy all-pairs check
    got = {
        (r.vec_a, r.vec_b)
        for r in similarity.q_embedding_neardup(spark, "ignored").collect()
    }
    # mirror the stored float32 round-trip before the float64 math
    Vf = vecs.astype(np.float32).astype(np.float64)
    n2 = np.sqrt((Vf * Vf).sum(axis=1))
    sims = np.round((Vf @ Vf.T) / np.outer(n2, n2), 4)
    exp = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] >= similarity.NEARDUP_COS:
                exp.add((int(ids[i]), int(ids[j])))
    assert got == exp


def test_ivf_stored_cells_partition_prune(spark, tmp_path):
    """The stored-IVF layout: cell partitions prune at scan time
    (PartitionFilters carries the probe's cell IN filter) and the
    pruned probe returns exactly the in-memory q_ann_ivf answer."""
    import numpy as np

    from timeseriesdb_spark.plans.checks import formatted_plan
    from timeseriesdb_spark.tables import load_table

    C = similarity._ivf_centroids(spark, SF_DIR)
    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf_store")
    similarity.write_ivf_store(emb, path, C)

    qv = np.asarray(
        emb.filter(f"vec_id = {similarity.QUERY_VEC_ID}").first()["embedding"],
        dtype=np.float64,
    )
    probed = similarity.ivf_probe_stored(
        spark, path, qv, C, exclude_vec_id=similarity.QUERY_VEC_ID
    )
    plan = formatted_plan(probed)
    assert "PartitionFilters" in plan
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "cell" in part_line and ("IN" in part_line or "in(" in part_line.lower())

    got = [(r.vec_id, r.cos_t) for r in probed.collect()]
    exp = [
        (r.vec_id, r.cos_t)
        for r in similarity.q_ann_ivf(spark, SF_DIR).collect()
    ]
    assert got == exp


def test_pq_adc_equals_reconstructed_distance(spark):
    # ADC is EXACT over the reconstruction: sum_m lut[m][code_m] must
    # equal ||q - recon(x)||^2 recomputed in numpy from the same
    # codebooks — pins both the JVM encoder (argmin over literal dots)
    # and the LUT lookup path
    import numpy as np

    CB = similarity._pq_codebooks(spark, SF_DIR)
    rows = similarity.q_ann_pq(spark, SF_DIR).collect()
    from timeseriesdb_spark.tables import load_table

    all_emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    qv = all_emb[similarity.QUERY_VEC_ID]
    d = CB.shape[2]
    for r in rows:
        x = all_emb[r.vec_id]
        codes = [getattr(r, f"code_{m}") for m in range(similarity.PQ_M)]
        np_codes = [
            int(((x[m * d : (m + 1) * d] - CB[m]) ** 2).sum(axis=1).argmin())
            for m in range(similarity.PQ_M)
        ]
        assert codes == np_codes, (r.vec_id, codes, np_codes)
        recon = np.concatenate([CB[m, codes[m]] for m in range(similarity.PQ_M)])
        assert abs(r.adc_t / 1e6 - ((qv - recon) ** 2).sum()) < 1e-4


def test_pq_partial_recall_and_determinism(spark):
    brute = set(_topk_ids(QUERIES["q_ann_topk"](spark, SF_DIR)))
    pq1 = _topk_ids(QUERIES["q_ann_pq"](spark, SF_DIR))
    pq2 = _topk_ids(QUERIES["q_ann_pq"](spark, SF_DIR))
    assert pq1 == pq2  # deterministic end to end (training included)
    assert len(pq1) == similarity.TOP_K
    recall = len(brute & set(pq1)) / len(brute)
    assert recall >= 0.3, recall


def test_semdedup_keepers_have_no_close_cellmates(spark):
    """After semdedup, no two KEPT vectors in the same cell are within
    the near-dup threshold (if cos(a,b) >= T with a < b, b must have
    been dropped), and every dropped vector has a smaller-id cell-mate
    at/above the threshold — verified against a numpy recompute."""
    import numpy as np

    from timeseriesdb_spark.operators.similarity import NEARDUP_COS, SEM_BITS
    from timeseriesdb_spark.registry import QUERIES

    out = QUERIES["q_semdedup"](spark, SF_DIR).toPandas()
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    cells = ((X[:, :SEM_BITS] >= 0) * (1 << np.arange(SEM_BITS - 1, -1, -1))).sum(1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = np.round(Xn @ Xn.T, 4)
    keep = dict(zip(out.vec_id, out.keep))
    cell_of = dict(zip(out.vec_id, out.cell))
    assert len(out) == len(ids)
    for i in range(len(ids)):
        assert cell_of[ids[i]] == cells[i]
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cells[i] != cells[j]:
                continue
            if cos[i, j] >= NEARDUP_COS and keep[ids[i]] and ids[i] < ids[j]:
                assert not keep[ids[j]], (ids[i], ids[j], cos[i, j])
    dropped = [v for v, k in keep.items() if not k]
    assert dropped, "fixture should drop at least one vector"
    idx = {v: i for i, v in enumerate(ids)}
    for v in dropped:
        j = idx[v]
        mates = [
            i
            for i in range(len(ids))
            if cells[i] == cells[j] and ids[i] < v and cos[i, j] >= NEARDUP_COS
        ]
        assert mates, f"dropped {v} has no close smaller-id cell-mate"


def test_dtw_band0_equals_l2_knn(spark):
    """Sakoe-Chiba band radius 0 restricts the DTW path to the
    diagonal, so squared DTW == squared L2 — predictions and distances
    must match q_knn_1nn exactly."""
    from timeseriesdb_spark.operators.similarity import dtw_1nn, q_knn_1nn

    l2 = (
        q_knn_1nn(spark, SF_DIR)
        .toPandas()
        .sort_values("test_id")
        .reset_index(drop=True)
    )
    d0 = (
        dtw_1nn(spark, SF_DIR, band=0)
        .toPandas()
        .sort_values("test_id")
        .reset_index(drop=True)
    )
    import numpy as np

    assert len(l2) == len(d0) > 0
    assert (l2["pred_label"] == d0["pred_label"]).all()
    # knn emits round(d²,4) doubles; dtw emits the half-away integer
    # ten-thousandths lattice — reconstruct the integer from the
    # rounded double (exact: the product is within 1e-12 of the int)
    l2_t = np.floor(l2["dist2"].to_numpy() * 10000.0 + 0.5).astype(np.int64)
    assert (l2_t == d0["dtw2_t"].to_numpy()).all()


def test_dtw_banded_never_exceeds_l2(spark):
    """Widening the band can only relax the alignment: banded DTW
    distance ≤ L2 distance per test row (q_dtw_1nn covers the bounded
    md5-window probe subset of q_knn_1nn's test split)."""
    from timeseriesdb_spark.operators.similarity import (
        DTW_PROBE_CAP,
        q_dtw_1nn,
        q_knn_1nn,
    )

    l2 = q_knn_1nn(spark, SF_DIR).toPandas().set_index("test_id")
    dt = q_dtw_1nn(spark, SF_DIR).toPandas().set_index("test_id")
    assert 0 < len(dt) <= DTW_PROBE_CAP
    assert set(dt.index) <= set(l2.index)
    l2m = l2.loc[dt.index]
    assert (
        dt["dtw2_t"].to_numpy() / 10000.0
        <= l2m["dist2"].to_numpy() + 1e-3
    ).all()


def test_ann_recall_shape_and_bounds(spark):
    from timeseriesdb_spark.operators.similarity import (
        RECALL_K,
        RECALL_PROBES,
        q_ann_recall,
    )

    rows = q_ann_recall(spark, SF_DIR).collect()
    assert len(rows) == 3 * RECALL_PROBES
    methods = {r.method for r in rows}
    assert methods == {"lsh", "ivf", "pq"}
    for r in rows:
        assert 0 <= r.n_hits <= RECALL_K
        assert r.recall_micros == (
            (2 * r.n_hits * 1_000_000 + RECALL_K) // (2 * RECALL_K)
        )
    # the probe set is fixed -> the whole result is deterministic
    again = q_ann_recall(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ann_recall_pq_matches_numpy(spark):
    # strongest pin: recompute probe 0's PQ recall entirely in numpy
    # (same codebooks, same integer half-up rank keys, same vec_id
    # tie-breaks) and demand the query's number matches bit-for-bit.
    import numpy as np
    import pandas as pd

    def half_away(x):  # Spark round(double) / DuckDB round: half AWAY
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    from timeseriesdb_spark.operators.similarity import (
        PQ_KS,
        PQ_M,
        RECALL_K,
        _pq_codebooks,
        q_ann_recall,
    )

    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")[
        ["vec_id", "embedding"]
    ].sort_values("vec_id")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    probe_id = int(ids[0])
    qv = X[0]
    mask = ids != probe_id
    Xo, ido = X[mask], ids[mask]
    norms = np.linalg.norm(Xo, axis=1)
    cos_t = half_away(Xo @ qv / (norms * np.linalg.norm(qv)) * 10_000.0)
    order = np.lexsort((ido, -cos_t))
    truth = set(ido[order[:RECALL_K]])

    CB = _pq_codebooks(spark, SF_DIR)
    d = CB.shape[2]
    adc = np.zeros(len(Xo))
    for m in range(PQ_M):
        S = Xo[:, m * d : (m + 1) * d]
        d2 = ((S[:, None, :] - CB[m][None, :, :]) ** 2).sum(axis=2)
        codes = d2.argmin(axis=1)
        lut = ((qv[m * d : (m + 1) * d][None, :] - CB[m]) ** 2).sum(axis=1)
        adc += lut[codes]
    adc_t = half_away(adc * 1_000_000.0)
    order_pq = np.lexsort((ido, adc_t))
    pq_top = set(ido[order_pq[:RECALL_K]])
    expect_hits = len(pq_top & truth)

    rows = q_ann_recall(spark, SF_DIR).collect()
    got = next(
        r for r in rows if r.method == "pq" and r.probe_id == probe_id
    )
    assert got.n_hits == expect_hits


def test_semantic_decon_matches_numpy_and_is_total(spark):
    """q_semantic_decon == brute numpy over the capped eval window for
    a candidate sample (max cos_t, smallest-id argmax tie-break,
    threshold decision), one row per non-eval vector, eval rows
    excluded. The eval window mirror re-derives the md5-ordered
    SEMDECON_EVAL_CAP selection in pure Python."""
    import hashlib

    import numpy as np

    from timeseriesdb_spark.tables import load_table

    rows = QUERIES["q_semantic_decon"](spark, SF_DIR).collect()
    emb = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    holdout = [v for v in emb if v % similarity.SEMDECON_MOD == 0]
    ev = sorted(
        sorted(
            holdout,
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )[: similarity.SEMDECON_EVAL_CAP]
    )
    assert 0 < len(ev) <= similarity.SEMDECON_EVAL_CAP
    cands = [v for v in emb if v not in set(ev)]
    assert {r.vec_id for r in rows} == set(cands)

    emat = np.stack([emb[e] for e in ev])
    enorm = np.sqrt((emat * emat).sum(axis=1))
    by_id = {r.vec_id: r for r in rows}
    for vid in sorted(cands)[:50]:
        x = emb[vid]
        cos = (emat @ x) / (enorm * np.sqrt(x @ x))
        v = cos * 10_000.0
        cos_t = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        best = int(cos_t.max())
        r = by_id[vid]
        assert r.cos_t == best
        assert r.best_eval_id == ev[int((cos_t == best).argmax())]
        assert r.flagged == (1 if best >= similarity.SEMDECON_COS_T else 0)
    # the check genuinely fires on this corpus
    assert any(r.flagged == 1 for r in rows)
    assert any(r.flagged == 0 for r in rows)


def test_semdecon_eval_window_is_capped(spark, monkeypatch):
    """The eval registry driver pull is bounded by SEMDECON_EVAL_CAP
    at ANY corpus size: shrinking the cap shrinks the selection, and
    the selection is the md5-ordered prefix of the holdout."""
    from timeseriesdb_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    monkeypatch.setattr(similarity, "SEMDECON_EVAL_CAP", 7)
    got = [r.vec_id for r in similarity.semdecon_eval_set(emb).collect()]
    assert len(got) == 7

    import hashlib

    holdout = [
        r.vec_id
        for r in emb.where(
            F.col("vec_id") % similarity.SEMDECON_MOD == 0
        ).collect()
    ]
    want = sorted(
        holdout, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:7]
    assert sorted(got) == sorted(want)


def test_semdecon_empty_eval_raises(spark):
    """An empty eval frame fails loudly (ValueError), not with an
    opaque np.stack error deep in the kernel."""
    import pytest as _pytest

    from timeseriesdb_spark.tables import load_table

    emb = similarity._with_norm(load_table(spark, SF_DIR, "embeddings"))
    empty = emb.where(F.lit(False))
    with _pytest.raises(ValueError, match="empty eval set"):
        similarity._eval_matrix(empty)


def test_mmr_rank1_is_top_quantized_dot(spark):
    """MMR's first pick must equal q_ann_quantized's top-1 (rank 1 is
    pure relevance), and scores are non-increasing from rank 2 on
    (the marginal-penalty max can only grow as the selected set
    grows)."""
    from timeseriesdb_spark.operators.similarity import (
        q_ann_quantized,
        q_mmr_diversify,
    )

    mmr = (
        q_mmr_diversify(spark, SF_DIR)
        .orderBy("rank")
        .toPandas()
        .reset_index(drop=True)
    )
    top1 = q_ann_quantized(spark, SF_DIR).limit(1).collect()[0]
    assert mmr["vec_id"].iloc[0] == top1["vec_id"]
    assert mmr["rel"].iloc[0] == top1["qdot"]
    assert mmr["mmr_score"].iloc[0] == 7 * top1["qdot"]
    tail = mmr["mmr_score"].iloc[1:]
    assert (tail.values[:-1] >= tail.values[1:]).all()
    assert mmr["vec_id"].is_unique


def test_mmr_skips_near_duplicate_of_rank1(spark, tmp_path):
    """The reason MMR exists: with two near-identical highly-relevant
    vectors, plain top-k returns both back-to-back; MMR must demote
    the clone below a less-relevant-but-diverse vector."""
    import pandas as pd

    from timeseriesdb_spark.operators.similarity import q_mmr_diversify

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),       # the query vector
        (1, [0.9, 0.43, 0.0, 0.0], 0),      # rank-1 by relevance
        (2, [0.88, 0.45, 0.0, 0.0], 0),     # near-clone of 1
        (3, [0.86, 0.0, -0.4, 0.0], 1),     # diverse, slightly less rel
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    d = str(tmp_path / "emb")
    spark.createDataFrame(pdf).write.parquet(f"{d}/embeddings.parquet")
    out = q_mmr_diversify(spark, d).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 3, 2]
    # plain relevance order would have been [1, 2, 3]
    assert out[0]["rel"] > out[2]["rel"] > out[1]["rel"]


def test_dedup_graph_stats_matches_python_recount(spark):
    """Recompute nodes/edges/wedges/triangles from the raw pair frame
    with Python sets — the SQL wedge join must agree exactly."""
    from itertools import combinations

    from timeseriesdb_spark.operators.dedup import (
        CC_MIN_EST,
        q_dedup_graph_stats,
        q_minhash_lsh_pairs,
    )

    got = q_dedup_graph_stats(spark, SF_DIR).collect()[0]
    pairs = (
        q_minhash_lsh_pairs(spark, SF_DIR)
        .where(F.col("est_jaccard") >= CC_MIN_EST)
        .collect()
    )
    edges = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in pairs
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tris = sum(
        1
        for a in adj
        for b, c in combinations(sorted(n for n in adj[a] if n > a), 2)
        if c in adj[b]
    )
    assert got["n_nodes"] == len(adj)
    assert got["n_edges"] == len(edges)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tris
    expect_cc = 0 if wedges == 0 else 3 * tris * 10**6 // wedges
    assert got["global_cc_ppm"] == expect_cc


def test_knn_over_cap_degrades_to_md5_window_sample(spark, monkeypatch):
    """r12: past KNN_TRAIN_CAP the 1-NN kernels must ANSWER on a
    deterministic md5-window train subsample, not raise (VERDICT r11
    #3). Force the cap below the sf train split (400 rows at sf0.001),
    then replay the sample selection AND the GEMM scoring in pure
    Python/numpy — identical float ops, so every prediction and
    rounded distance must match exactly."""
    import hashlib

    import numpy as np
    import pandas as pd

    from timeseriesdb_spark.operators.similarity import TEST_MOD, dtw_1nn
    from timeseriesdb_spark.tables import load_table

    cap = 50
    monkeypatch.setattr(similarity, "KNN_TRAIN_CAP", cap)

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", "embedding")
        .toPandas()
    )
    tr = emb[emb.vec_id % TEST_MOD != 0]
    assert len(tr) > cap  # the fixture genuinely exceeds the cap

    out = similarity.q_knn_1nn(spark, SF_DIR).toPandas().set_index("test_id")

    # replay: md5-window pick of the train sample, then the same GEMM
    picked = sorted(
        tr.vec_id.to_numpy(),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )[:cap]
    ts = tr.set_index("vec_id").loc[sorted(picked)]
    Tm = np.stack(ts["embedding"].to_numpy()).astype(np.float64)
    tn2 = (Tm * Tm).sum(axis=1)
    te = emb[emb.vec_id % TEST_MOD == 0]
    A = np.stack(te["embedding"].to_numpy()).astype(np.float64)
    a2 = (A * A).sum(axis=1)
    d2 = np.round(np.maximum(a2[:, None] + tn2[None, :] - 2.0 * (A @ Tm.T), 0.0), 4)
    best = d2.argmin(axis=1)
    exp = pd.DataFrame(
        {
            "test_id": te.vec_id.to_numpy(dtype=np.int64),
            "pred_label": ts["label"].to_numpy(dtype=np.int64)[best],
            "dist2": d2[np.arange(len(best)), best],
        }
    ).set_index("test_id")
    assert len(out) == len(exp)
    got = out.loc[exp.index]
    assert (got["pred_label"].to_numpy() == exp["pred_label"].to_numpy()).all()
    assert np.array_equal(got["dist2"].to_numpy(), exp["dist2"].to_numpy())

    # the DTW kernel rides the same bounded pull: must answer too
    dt = dtw_1nn(spark, SF_DIR, band=0, probe_cap=5).toPandas()
    assert len(dt) == 5

    # the DECLARED oracle replays the same md5-window cap (r12 review
    # fix): run it with the cap patched to this test's value and
    # hash-compare against the capped Spark output — the contract
    # must hold PAST the cap, not only under it
    import re

    import duckdb

    from timeseriesdb_spark.operators.similarity import ORACLES

    # the oracle string was built at import time with the real cap —
    # patch its (single) train LIMIT down to this test's cap
    sql = re.sub(r"LIMIT \d+", f"LIMIT {cap}", ORACLES["q_knn_1nn"])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF_DIR}/embeddings.parquet'"
    )
    odf = con.execute(sql).fetch_df().set_index("test_id").sort_index()
    gdf = out.sort_index()
    assert (gdf["pred_label"].to_numpy() == odf["pred_label"].to_numpy()).all()
    assert np.array_equal(gdf["dist2"].to_numpy(), odf["dist2"].to_numpy())

    # same contract for the banded-DTW oracle: its train CTE carries
    # the identical cap — patch ONLY the train LIMIT (the probe-window
    # LIMIT stays) and hash-compare the registered q_dtw_1nn
    from timeseriesdb_spark.operators.similarity import q_dtw_1nn

    dsql = ORACLES["q_dtw_1nn"].replace("LIMIT 200000", f"LIMIT {cap}")
    assert dsql != ORACLES["q_dtw_1nn"]  # the train LIMIT was found
    dgot = (
        q_dtw_1nn(spark, SF_DIR).toPandas().set_index("test_id").sort_index()
    )
    dexp = con.execute(dsql).fetch_df().set_index("test_id").sort_index()
    assert len(dgot) == len(dexp)
    assert (dgot["pred_label"].to_numpy() == dexp["pred_label"].to_numpy()).all()
    assert (dgot["dtw2_t"].to_numpy() == dexp["dtw2_t"].to_numpy()).all()


def test_dedup_graph_stats_empty_graph_is_zero_not_null(spark, tmp_path):
    """r12 (ADVICE r11): on a corpus with NO near-dup pairs the wedge
    sum aggregates over zero rows — without the coalesce it is NULL
    and leaks past the n_wedges = 0 guard. Documented semantics:
    coefficient = 0, never NULL."""
    import pandas as pd

    from timeseriesdb_spark.operators.dedup import q_dedup_graph_stats

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "source": ["s"] * 3,
            "lang": ["en"] * 3,
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "one two three four five six seven eight nine",
                "red orange yellow green blue indigo violet umber",
            ],
            "quality": [0.5] * 3,
            "props": ["{}"] * 3,
        }
    )
    d = str(tmp_path / "empty_graph")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    row = q_dedup_graph_stats(spark, d).collect()[0]
    assert row["n_edges"] == 0
    assert row["n_wedges"] == 0 and row["n_wedges"] is not None
    assert row["global_cc_ppm"] == 0


def test_sem_bits_adaptive():
    """r14: the semantic-cell width grows with the corpus so the
    within-cell pair work stays O(n·SEM_CELL_TARGET) — the sf1 curve
    measured the fixed 4-bit fence at a 110x slope on 10x data. The
    driver (sf0.01) and bench (sf0.1) scales keep the historical 4
    bits, so hashes and baselines are unchanged."""
    from timeseriesdb_spark.operators.similarity import (
        SEM_BITS,
        _sem_bits,
    )

    assert _sem_bits(200) == SEM_BITS
    assert _sem_bits(2_000) == SEM_BITS
    assert _sem_bits(20_000) == 8
    assert _sem_bits(10**9) == 16  # hard cap
