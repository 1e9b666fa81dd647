"""ComBat batch correction vs an independent dense-path reference."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.preprocess import combat


def _batched_data(n=240, p=80, B=3, shift=1.5, scale_fx=2.0, seed=0):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=0.35, format="csr", dtype=np.float32,
        random_state=rng, data_rvs=rng.random,
    ).toarray()
    codes = rng.integers(0, B, n)
    # batch 1 shifted, batch 2 scaled on half the genes
    X[codes == 1, : p // 2] += shift
    X[codes == 2, p // 2:] *= scale_fx
    labels = np.array(["b0", "b1", "b2"])[codes]
    return X.astype(np.float32), labels, codes


def _ref_combat(Xd, codes, eb=True, max_iter=100, tol=1e-4):
    """Dense-path reference: same model, computed from the data directly
    (the library derives everything from sparse grouped moments)."""

    Xd = Xd.astype(np.float64)
    n, p = Xd.shape
    B = codes.max() + 1
    sizes = np.bincount(codes, minlength=B).astype(np.float64)
    mu = np.stack([Xd[codes == b].mean(0) for b in range(B)], 1)  # [p,B]
    alpha = mu @ (sizes / n)
    var = (
        sum(((Xd[codes == b] - mu[:, b]) ** 2).sum(0) for b in range(B)) / n
    )
    sigma = np.sqrt(np.maximum(var, 1e-12))
    Z = (Xd - alpha) / sigma
    out = np.empty_like(Xd)
    for b in range(B):
        Zb = Z[codes == b]
        nb = sizes[b]
        g_hat = Zb.mean(0)
        d_hat = np.maximum(Zb.var(0, ddof=1), 1e-12)
        if eb:
            g_bar, t2 = g_hat.mean(), g_hat.var()
            m, s2 = d_hat.mean(), max(d_hat.var(), 1e-12)
            a_pr = (2 * s2 + m * m) / s2
            b_pr = (m * s2 + m ** 3) / s2
            g_star, d_star = g_hat.copy(), d_hat.copy()
            for _ in range(max_iter):
                g_new = (nb * t2 * g_hat + d_star * g_bar) / (
                    nb * t2 + d_star
                )
                sum2 = ((Zb - g_new) ** 2).sum(0)
                d_new = (b_pr + 0.5 * sum2) / (nb / 2.0 + a_pr - 1.0)
                change = max(
                    np.abs(g_new - g_star).max()
                    / max(np.abs(g_star).max(), 1e-12),
                    np.abs(d_new - d_star).max() / d_star.max(),
                )
                g_star, d_star = g_new, d_new
                if change < tol:
                    break
            d_star = np.maximum(d_star, 1e-12)
        else:
            g_star, d_star = g_hat, d_hat
        out[codes == b] = (Zb - g_star) / np.sqrt(d_star) * sigma + alpha
    return out


@pytest.mark.parametrize("eb", [True, False])
def test_combat_matches_dense_reference(eb):
    X, labels, codes = _batched_data()
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    got = np.asarray(combat(m, labels, eb=eb))
    ref = _ref_combat(X, codes, eb=eb)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_combat_removes_planted_batch_effect():
    X, labels, codes = _batched_data(shift=2.5, scale_fx=3.0)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    out = np.asarray(combat(m, labels))
    # before: batch means differ hugely on the shifted genes
    before = np.ptp(
        [X[codes == b, : 40].mean() for b in range(3)]
    )
    after = np.ptp(
        [out[codes == b, : 40].mean() for b in range(3)]
    )
    assert before > 0.5
    assert after < 0.05 * before


def test_combat_no_eb_exactly_aligns_moments():
    X, labels, codes = _batched_data(seed=1)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    out = np.asarray(combat(m, labels, eb=False)).astype(np.float64)
    # moment matching without shrinkage: every batch's per-gene mean is
    # the grand mean and per-gene std (ddof=1) the pooled sigma
    grand = None
    for b in range(3):
        mb = out[codes == b].mean(0)
        if grand is None:
            grand = mb
        np.testing.assert_allclose(mb, grand, atol=5e-3)
    s0 = out[codes == 0].std(0, ddof=1)
    s1 = out[codes == 1].std(0, ddof=1)
    np.testing.assert_allclose(s0, s1, rtol=5e-3)


def test_combat_dense_input_matches_sparse():
    X, labels, _ = _batched_data(seed=2)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    a = np.asarray(combat(m, labels))
    b = np.asarray(combat(X, labels))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_combat_validation():
    X, labels, _ = _batched_data(seed=3)
    with pytest.raises(ValueError, match="batch vector length"):
        combat(X, labels[:-1])
    lone = labels.copy()
    lone[0] = "solo"
    lone[1:][lone[1:] == "solo"] = "b0"
    with pytest.raises(ValueError, match="singletons"):
        combat(X, lone)
    # single batch: identity
    same = np.asarray(combat(X, ["one"] * X.shape[0]))
    np.testing.assert_allclose(same, X, atol=1e-6)


def test_combat_improves_batch_mixing_downstream():
    """After correction, batch no longer dominates the top PC."""

    X, labels, codes = _batched_data(shift=3.0, seed=4)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    out = np.asarray(combat(m, labels)).astype(np.float64)

    def top_pc_batch_separation(D):
        Dc = D - D.mean(0)
        _, _, vt = np.linalg.svd(Dc, full_matrices=False)
        pc1 = Dc @ vt[0]
        mus = [pc1[codes == b].mean() for b in range(3)]
        return np.ptp(mus) / (pc1.std() + 1e-12)

    assert top_pc_batch_separation(out) < 0.3 * top_pc_batch_separation(X)
