"""score_genes / cell-cycle scoring vs independent numpy reference."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.scoring import score_genes, score_genes_cell_cycle


def _mat(n=150, p=200, seed=0):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=0.3, format="csr", dtype=np.float32,
        random_state=rng, data_rvs=rng.random,
    )
    return X


def _ref_score(Xd, sig, ctrl_size, n_bins, seed):
    """Independent numpy implementation of the same sampling scheme."""

    n, p = Xd.shape
    gene_means = Xd.mean(0)
    order = np.argsort(gene_means, kind="stable")
    ranks = np.empty(p, np.int64)
    ranks[order] = np.arange(p)
    bins = (ranks * n_bins) // p
    rng = np.random.default_rng(seed)
    ctrl = []
    for b in np.unique(bins[sig]):
        pool = np.where(bins == b)[0]
        pool = pool[~np.isin(pool, sig)]
        if len(pool):
            ctrl.append(rng.choice(pool, size=min(ctrl_size, len(pool)),
                                   replace=False))
    ctrl_idx = np.unique(np.concatenate(ctrl))
    return Xd[:, sig].mean(1) - Xd[:, ctrl_idx].mean(1)


def test_score_matches_reference_sampling():
    X = _mat()
    Xd = X.toarray().astype(np.float64)
    m = SparseMatrix.from_scipy(X)
    sig = np.array([3, 17, 42, 99, 150])
    got = score_genes(m, sig, ctrl_size=20, n_bins=10, seed=7)
    ref = _ref_score(Xd, sig, 20, 10, 7)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_score_by_name_and_validation():
    X = _mat(seed=1)
    m = SparseMatrix.from_scipy(X)
    vn = np.array([f"g{j}" for j in range(X.shape[1])])
    by_name = score_genes(m, ["g3", "g17", "g42"], var_names=vn, seed=0)
    by_idx = score_genes(m, [3, 17, 42], seed=0)
    np.testing.assert_allclose(by_name, by_idx)
    with pytest.raises(ValueError, match="not in var_names"):
        score_genes(m, ["nope"], var_names=vn)
    with pytest.raises(ValueError, match="var_names is None"):
        score_genes(m, ["g3"])
    with pytest.raises(ValueError, match="empty"):
        score_genes(m, [])
    with pytest.raises(ValueError, match="indices must be"):
        score_genes(m, [10_000])


def test_planted_signature_separates_cells():
    rng = np.random.default_rng(2)
    X = _mat(seed=2).toarray()
    hot = np.zeros(150, bool)
    hot[:40] = True
    sig = np.arange(10)
    X[np.ix_(hot, sig)] += 1.5  # signature active in the first 40 cells
    m = SparseMatrix.from_scipy(sp.csr_matrix(X.astype(np.float32)))
    s = score_genes(m, sig, ctrl_size=30, seed=0)
    assert s[hot].min() > s[~hot].max()


def test_cell_cycle_phases():
    # wide gene pool so expression bins hold many non-signature genes
    X = _mat(seed=3, p=1000).toarray()
    s_set, g2m_set = np.arange(8), np.arange(8, 16)
    s_cells = np.zeros(150, bool); s_cells[:30] = True
    g2m_cells = np.zeros(150, bool); g2m_cells[30:60] = True
    X[np.ix_(s_cells, s_set)] += 2.0
    X[np.ix_(g2m_cells, g2m_set)] += 2.0
    m = SparseMatrix.from_scipy(sp.csr_matrix(X.astype(np.float32)))
    s, g2m, phase = score_genes_cell_cycle(
        m, s_set, g2m_set, ctrl_size=30, n_bins=10, seed=0
    )
    assert (phase[:30] == "S").all()
    assert (phase[30:60] == "G2M").all()
    # non-cycling cells score near zero on BOTH signatures (their exact
    # phase call on pure noise is arbitrary — scanpy behaves the same)
    assert abs(s[60:].mean()) < 0.1 and abs(g2m[60:].mean()) < 0.1
    assert s[:30].min() > s[60:].max() + 0.5  # planted >> noise
    assert g2m[30:60].min() > g2m[60:].max() + 0.5
    assert s.shape == (150,) and g2m.shape == (150,)


def test_deterministic_per_seed():
    # ctrl_size well below the bin pool so the seed actually selects
    X = _mat(seed=4, p=600)
    m = SparseMatrix.from_scipy(X)
    a = score_genes(m, [1, 2, 3], ctrl_size=5, n_bins=5, seed=5)
    b = score_genes(m, [1, 2, 3], ctrl_size=5, n_bins=5, seed=5)
    c = score_genes(m, [1, 2, 3], ctrl_size=5, n_bins=5, seed=6)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
