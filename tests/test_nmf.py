"""NMF (models.nmf): planted-program recovery, sklearn agreement,
monotone loss, transform consistency, validation."""

import numpy as np
import pytest

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.models import NMF


def _planted(n=300, p=120, k=4, seed=0, noise=0.01):
    rng = np.random.default_rng(seed)
    W = rng.gamma(1.0, 1.0, (n, k)) * (rng.random((n, k)) < 0.5)
    H = rng.gamma(1.0, 1.0, (k, p)) * (rng.random((k, p)) < 0.3)
    X = W @ H + noise * rng.random((n, p))
    X[X < 0.05] = 0.0  # sparsify
    return X, W, H


def test_nmf_recovers_planted_error():
    X, W_true, H_true = _planted()
    m = SparseMatrix.from_dense(X)
    model = NMF(4, max_iter=400, tol=1e-9)
    W = model.fit_transform(m)
    assert W.shape == (300, 4)
    assert model.components_.shape == (4, 120)
    assert (W >= 0).all() and (model.components_ >= 0).all()
    rel = model.reconstruction_err_ / np.linalg.norm(X)
    assert rel < 0.08  # near the planted noise floor


def test_nmf_loss_vs_sklearn():
    from sklearn.decomposition import NMF as SKNMF

    X, _, _ = _planted(seed=1)
    m = SparseMatrix.from_dense(X)
    ours = NMF(4, max_iter=300, tol=1e-8, init="nndsvda").fit(m)
    ref = SKNMF(4, solver="mu", init="nndsvda", max_iter=300, tol=1e-8,
                random_state=0).fit(X)
    ref_err = ref.reconstruction_err_
    assert ours.reconstruction_err_ <= ref_err * 1.02


def test_nmf_reconstruction_err_is_true_frobenius():
    X, _, _ = _planted(n=120, p=60, seed=2)
    m = SparseMatrix.from_dense(X)
    model = NMF(3, max_iter=150, tol=0.0)
    W = model.fit_transform(m)
    direct = np.linalg.norm(X - W @ model.components_)
    np.testing.assert_allclose(model.reconstruction_err_, direct,
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("init", ["nndsvd", "nndsvda", "random"])
def test_nmf_inits_converge(init):
    X, _, _ = _planted(n=150, p=80, k=3, seed=3)
    m = SparseMatrix.from_dense(X)
    model = NMF(3, init=init, max_iter=250, tol=1e-7)
    W = model.fit_transform(m)
    assert np.isfinite(W).all()
    rel = model.reconstruction_err_ / np.linalg.norm(X)
    assert rel < 0.2
    assert model.n_iter_ >= 2


def test_nmf_transform_matches_fit_usages():
    X, _, _ = _planted(n=200, p=90, k=3, seed=4)
    m = SparseMatrix.from_dense(X)
    model = NMF(3, max_iter=400, tol=1e-10)
    W_fit = model.fit_transform(m)
    W_new = model.transform(m)
    # reprojection under fixed H reaches a comparable reconstruction
    err_fit = np.linalg.norm(X - W_fit @ model.components_)
    err_new = np.linalg.norm(X - W_new @ model.components_)
    assert err_new <= err_fit * 1.05


def test_nmf_validation():
    X, _, _ = _planted(n=40, p=20, k=2, seed=5)
    m = SparseMatrix.from_dense(X)
    with pytest.raises(ValueError, match="n_components"):
        NMF(0)
    with pytest.raises(ValueError, match="init"):
        NMF(2, init="bogus")
    with pytest.raises(ValueError, match="non-negative"):
        NMF(2).fit(SparseMatrix.from_dense(X - 0.5))
    with pytest.raises(TypeError):
        NMF(2).fit_transform(X)
    with pytest.raises(ValueError, match="not fitted"):
        NMF(2).transform(m)
    fitted = NMF(2, max_iter=20).fit(m)
    with pytest.raises(ValueError, match="columns"):
        fitted.transform(SparseMatrix.from_dense(X[:, :10]))


def test_nmf_mesh_matches_single_device():
    from single_algebra_tpu.parallel import make_mesh

    X, _, _ = _planted(n=160, p=70, k=3, seed=6)
    m = SparseMatrix.from_dense(X.astype(np.float32))
    local = NMF(3, max_iter=80, tol=1e-9)
    W_local = local.fit_transform(m)

    for nd in (1, 8):
        mesh = make_mesh(nd)
        sharded = NMF(3, max_iter=80, tol=1e-9, mesh=mesh)
        W_mesh = sharded.fit_transform(m)
        # same math, different reduction order (f32 drift compounds over
        # the MU iterations): compare the identifiable quantities
        np.testing.assert_allclose(
            sharded.reconstruction_err_, local.reconstruction_err_,
            rtol=1e-2,
        )
        R_local = W_local @ local.components_
        R_mesh = W_mesh @ sharded.components_
        rel = np.linalg.norm(R_mesh - R_local) / np.linalg.norm(R_local)
        assert rel < 0.02
