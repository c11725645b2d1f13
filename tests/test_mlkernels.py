"""Numerical-property tests for the kernel operators (the reference's
loose-oracle strategy, segment.rs:882-906: assert bounded error /
invariants rather than SQL equality).
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR
from timeseriesdb_spark.operators import mlkernels
from timeseriesdb_spark.registry import QUERIES


def test_ncc_qmax_self_is_grid_max():
    # self-correlation == 1 exactly on the integer lattice: cc.max()
    # is Σy², so the coefficient is sy/(√sy·√sy) and q == GRAIL_Q
    x = np.floor(np.sin(np.linspace(0, 20, 500)) * 1000).astype(np.int64)
    y = len(x) * x - x.sum()
    assert mlkernels._ncc_qmax(y, y) == mlkernels.GRAIL_Q


def test_ncc_qmax_detects_shift_and_zero_guard():
    rng = np.random.default_rng(0)
    x = rng.integers(-1000, 1000, size=400)
    q = mlkernels._ncc_qmax(x, np.roll(x, 7))
    assert q > 0.9 * mlkernels.GRAIL_Q
    assert mlkernels._ncc_qmax(np.zeros(5, np.int64), x[:5]) == 0


def test_grail_kernel_table_split_covers_grid():
    # e1[q // 64 + 64] * e2[q % 64] must be finite and positive over
    # the whole admissible grid, equal exp(0)=1 at q=0, and increase
    # with q (the SINK kernel is monotone in the correlation)
    proj, e1, e2 = mlkernels._grail_params(
        [np.arange(9, dtype=np.int64) - 4, np.arange(9, dtype=np.int64) ** 2]
    )
    assert proj.shape[1] == min(2, mlkernels.EMBED_DIM)
    ks = [
        float(e1[q // 64 + 64]) * float(e2[q % 64])
        for q in range(-mlkernels.GRAIL_Q, mlkernels.GRAIL_Q + 1)
    ]
    assert ks[mlkernels.GRAIL_Q] == 1.0
    assert all(a < b for a, b in zip(ks, ks[1:]))


def test_lcce_dictionary_members_self_correlate(spark):
    df = QUERIES["q_lcce"](spark, SF_DIR)
    rows = df.filter(
        (df.user_id < mlkernels.DICT_K) & (df.user_id == df.dict_id)
    ).collect()
    assert len(rows) == mlkernels.DICT_K
    for r in rows:
        # a dictionary member matched against itself: nccc == 1, lag 0
        assert abs(r.nccc - 1.0) < 1e-6, r
        assert r.best_lag == 0, r


def test_grail_embedding_shape_and_determinism(spark):
    df = QUERIES["q_grail_embed"](spark, SF_DIR)
    pdf = df.toPandas()
    n_signals = pdf["user_id"].nunique()
    assert len(pdf) == n_signals * mlkernels.EMBED_DIM
    assert pdf["coeff"].notna().all()
    # deterministic across runs
    pdf2 = QUERIES["q_grail_embed"](spark, SF_DIR).toPandas()
    a = pdf.sort_values(["user_id", "dim"]).reset_index(drop=True)
    b = pdf2.sort_values(["user_id", "dim"]).reset_index(drop=True)
    assert np.allclose(a["coeff"], b["coeff"])


def test_double_literal_exponent_form_survives_folding():
    """Regression for the r11 1-ulp drift: bare decimal literals parse
    as DECIMAL and DECIMAL-domain constant folding of a literal
    product is NOT the IEEE double product — %.17e exponent form
    parses directly as DOUBLE and must replay products bit-exactly.
    Uses the exact pair that drifted in q_grail_embed's kernel table
    plus a sweep of awkward 17-digit mantissas."""
    import duckdb

    from timeseriesdb_spark.operators.similarity import _dk

    con = duckdb.connect()
    pairs = [
        (1.4330626211475785, 1.0225155652384655),  # the r11 drift pair
        (0.1 + 0.2, 1.0 / 3.0),
        (np.exp(1.0), np.pi),
        (np.nextafter(1.0, 2.0), np.nextafter(0.5, 1.0)),
    ]
    for a, b in pairs:
        lit_a, lit_b = _dk(a), _dk(b)
        assert "e" in lit_a.lower()  # exponent form, parses as DOUBLE
        typ, va, vb, prod = con.execute(
            f"SELECT typeof({lit_a}), {lit_a}, {lit_b}, {lit_a} * {lit_b}"
        ).fetchone()
        assert typ == "DOUBLE"
        assert va == a and vb == b          # exact literal round-trip
        assert prod == float(a) * float(b)  # folding stays IEEE
    con.close()
