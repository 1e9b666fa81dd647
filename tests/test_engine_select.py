"""'auto' engine selection: dense -> gram -> tiled -> sparse by HBM budget.

The selector (models/pca.py::make_engine_operator) only engages on a real
TPU backend, so these tests drive its *inputs* — the fits()/payload
planners — with mocked budgets, plus the selector's cache semantics.
"""

import numpy as np
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.linalg import (
    DensifiedOperator,
    GramPCAEngine,
    TiledSparseOperator,
)
from single_algebra_tpu.models.pca import make_engine_operator


def _m(n=3000, p=400, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=density, format="csr", dtype=np.float64,
        random_state=rng,
        data_rvs=lambda s: (rng.poisson(1.0, s) + 1).astype(np.float64),
    ).astype(np.float32)
    return SparseMatrix.from_scipy(X)


def test_fits_ladder_is_monotone_in_budget():
    m = _m()
    dense_b = 2 * m.shape[0] * m.shape[1]  # bf16 hi, exact counts
    assert DensifiedOperator.fits(m.shape, budget_bytes=dense_b)
    assert not DensifiedOperator.fits(m.shape, budget_bytes=dense_b - 1)

    gram_b = GramPCAEngine.payload_bytes(m)
    assert GramPCAEngine.fits(m, budget_bytes=gram_b)
    assert not GramPCAEngine.fits(m, budget_bytes=gram_b // 4)

    tiled_b = TiledSparseOperator.payload_bytes(m)
    # the two-level (overflow) tiled payload is never larger than the
    # overflow-free gram payload for the same matrix
    assert tiled_b <= gram_b
    assert TiledSparseOperator.fits(m, budget_bytes=tiled_b)
    assert not TiledSparseOperator.fits(m, budget_bytes=tiled_b - 1)


def test_gram_adaptive_col_tile_prefers_smallest_fitting():
    m = _m()
    ct_small, b_small = GramPCAEngine.choose_col_tile(m, budget_bytes=1 << 40)
    assert ct_small == GramPCAEngine.COL_TILES[0]
    # squeeze the budget below each tile's payload: the chooser must pick a
    # layout no more expensive than that candidate
    for ct in GramPCAEngine.COL_TILES:
        _, b, _, _ = GramPCAEngine._bucket_plan(m, ct)
        chosen_ct, chosen_b = GramPCAEngine.choose_col_tile(
            m, budget_bytes=b
        )
        assert chosen_b <= b


def test_gram_rejects_very_wide_matrices():
    # width guard: p > 40960 refuses regardless of budget
    wide = _m(n=50, p=500)
    wide.shape = (50, 500)
    assert GramPCAEngine.fits(wide, budget_bytes=1 << 50)
    wide.shape = (50, 50000)
    assert not GramPCAEngine.fits(wide, budget_bytes=1 << 50)


def test_auto_resolves_gram_class_to_gram(monkeypatch):
    """'auto' on a gram-class matrix (dense doesn't fit, Gram does)
    resolves to the exact Gram engine on EVERY fit, including the first.

    A round-4 first-fit promotion (run the first randomized fit on the
    tiled sketch engine) was measured at 400k x 30k and removed: EV rel
    err 1.2e-3 vs the Gram's 2.1e-6 at identical solver parameters, a
    ~500 s tiled-fit-graph compile, and a transient tiled+Gram HBM
    coexistence OOM (see make_engine_operator docs)."""

    import jax

    import single_algebra_tpu.models.pca as pca_mod

    m = _m(n=500, p=200)
    m._operator_cache = {}
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        pca_mod.DensifiedOperator, "fits",
        classmethod(lambda cls, *a, **k: False),
    )
    monkeypatch.setattr(
        pca_mod.GramPCAEngine, "fits", classmethod(lambda cls, *a, **k: True)
    )
    monkeypatch.setattr(
        pca_mod.GramPCAEngine, "from_matrix",
        classmethod(lambda cls, mm: "GRAM"),
    )
    assert make_engine_operator(m, "auto") == "GRAM"
    assert m._operator_cache["auto"] == "GRAM"
    assert "tiled" not in m._operator_cache


def test_operator_cache_shared_between_auto_and_named():
    m = _m(n=500, p=200)
    m._operator_cache = {}
    op1 = make_engine_operator(m, "sparse")
    op2 = make_engine_operator(m, "sparse")
    assert op1 is op2
    # off-TPU, auto resolves to sparse and must share the cache entry
    op3 = make_engine_operator(m, "auto")
    assert op3 is op1
