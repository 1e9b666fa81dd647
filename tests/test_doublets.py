"""Scrublet doublet detection on planted doublets."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.doublets import scrublet, _auto_threshold


def _counts_with_doublets(n_per=250, p=400, n_doub=50, seed=0):
    """Two distinct cell types + planted cross-type doublets."""

    rng = np.random.default_rng(seed)
    prog = rng.gamma(2.0, 1.0, (2, p)) * (rng.random((2, p)) < 0.35)
    a = rng.poisson(prog[0] * 1.2, (n_per, p))
    b = rng.poisson(prog[1] * 1.2, (n_per, p))
    # true doublets: sum of one cell from each type
    d = (
        rng.poisson(prog[0] * 1.2, (n_doub, p))
        + rng.poisson(prog[1] * 1.2, (n_doub, p))
    )
    X = sp.csr_matrix(np.concatenate([a, b, d]).astype(np.float32))
    is_doub = np.zeros(X.shape[0], bool)
    is_doub[2 * n_per:] = True
    return X, is_doub


def test_scrublet_separates_planted_doublets():
    X, is_doub = _counts_with_doublets()
    m = SparseMatrix.from_scipy(X)
    res = scrublet(m, n_top_genes=300, n_comps=15, seed=0)
    s = res.doublet_scores
    # AUROC of score vs planted truth
    order = np.argsort(s)
    ranks = np.empty_like(order, float)
    ranks[order] = np.arange(len(s))
    n1, n0 = is_doub.sum(), (~is_doub).sum()
    auroc = (ranks[is_doub].sum() - n1 * (n1 - 1) / 2) / (n1 * n0)
    assert auroc > 0.9, auroc
    # simulated doublets score high on average
    assert res.sim_scores.mean() > s[~is_doub].mean()
    assert res.embedding.shape[0] == X.shape[0]


def test_scrublet_threshold_and_prediction():
    X, is_doub = _counts_with_doublets(seed=1)
    m = SparseMatrix.from_scipy(X)
    res = scrublet(m, n_top_genes=300, n_comps=15, seed=0)
    # the auto threshold lands inside the simulated-score distribution
    assert res.sim_scores.min() < res.threshold < res.sim_scores.max()
    # score separation at a fixed 5%-FPR operating point (threshold
    # heuristics vary; the scores themselves must separate)
    s = res.doublet_scores
    op = np.quantile(s[~is_doub], 0.95)
    recall = (s[is_doub] > op).mean()
    assert recall > 0.5, recall
    # manual threshold overrides and is honored
    res2 = scrublet(
        m, n_top_genes=300, n_comps=15, threshold=float(op), seed=0
    )
    assert res2.threshold == pytest.approx(float(op))
    assert res2.predicted[is_doub].mean() > 0.5


def test_scrublet_deterministic_and_validation():
    X, _ = _counts_with_doublets(n_per=60, p=150, n_doub=10, seed=2)
    m = SparseMatrix.from_scipy(X)
    r1 = scrublet(m, n_top_genes=100, n_comps=10, seed=3)
    r2 = scrublet(m, n_top_genes=100, n_comps=10, seed=3)
    np.testing.assert_allclose(r1.doublet_scores, r2.doublet_scores)
    with pytest.raises(ValueError, match="at least 10"):
        scrublet(SparseMatrix.from_scipy(sp.csr_matrix(np.ones((4, 5), np.float32))))
    with pytest.raises(ValueError, match="expected_doublet_rate"):
        scrublet(m, expected_doublet_rate=2.0)


def test_auto_threshold_bimodal():
    rng = np.random.default_rng(4)
    s = np.concatenate([
        rng.normal(0.1, 0.02, 300), rng.normal(0.8, 0.05, 150)
    ])
    t = _auto_threshold(np.clip(s, 0, 1))
    assert 0.2 < t < 0.7
    assert _auto_threshold(np.full(10, 0.3)) == pytest.approx(0.3)
