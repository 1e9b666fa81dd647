"""Block Golub-Kahan-Lanczos vs dense SVD / scalar Lanczos."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.linalg import (
    CenteredOperator,
    SparseOperator,
    block_lanczos_svd,
    lanczos_svd,
)


def _op(n=400, p=160, density=0.1, seed=0):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=density, format="csr", dtype=np.float64,
        random_state=rng, data_rvs=rng.standard_normal,
    ).astype(np.float32)
    m = SparseMatrix.from_scipy(X)
    return SparseOperator.from_matrix(m), X


@pytest.mark.parametrize("b", [4, 8])
def test_block_lanczos_matches_dense_svd(b):
    op, X = _op()
    k = 6
    res = block_lanczos_svd(op, k, block_size=b, steps=24, seed=1)
    s_ref = np.linalg.svd(X.toarray().astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(res.s, np.float64), s_ref[:k], rtol=2e-5
    )
    # residuals: ||A v - s u|| small
    A = X.toarray()
    for i in range(k):
        r = A @ np.asarray(res.vt)[i] - np.asarray(res.s)[i] * np.asarray(
            res.u
        )[:, i]
        assert np.linalg.norm(r) < 1e-2 * np.asarray(res.s)[0]


def test_block_lanczos_adaptive_converges():
    op, X = _op(seed=3)
    k = 5
    res = block_lanczos_svd(op, k, block_size=8, tol=1e-6, seed=2)
    s_ref = np.linalg.svd(X.toarray().astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(res.s, np.float64), s_ref[:k], rtol=5e-5
    )


def test_block_matches_scalar_lanczos():
    op, X = _op(n=300, p=100, seed=5)
    k = 4
    rb = block_lanczos_svd(op, k, block_size=4, steps=20, seed=1)
    rs = lanczos_svd(op, k, steps=80, seed=1)
    np.testing.assert_allclose(
        np.asarray(rb.s), np.asarray(rs.s), rtol=1e-4
    )
    # subspace agreement (up to sign)
    np.testing.assert_allclose(
        np.abs(np.asarray(rb.vt)), np.abs(np.asarray(rs.vt)), atol=2e-3
    )


def test_block_lanczos_centered_operator():
    op, X = _op(n=250, p=90, seed=7)
    mu = np.asarray(X.mean(axis=0)).ravel().astype(np.float32)
    cop = CenteredOperator(op, jnp.asarray(mu))
    k = 3
    res = block_lanczos_svd(cop, k, block_size=4, steps=20, seed=0)
    Dc = X.toarray().astype(np.float64) - mu.astype(np.float64)
    s_ref = np.linalg.svd(Dc, compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(res.s, np.float64), s_ref[:k], rtol=5e-5
    )


def test_pca_builder_block_lanczos():
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import SVDMethod

    _, X = _op(n=300, p=100, seed=11)
    pb = (
        SparsePCABuilder()
        .n_components(4)
        .svd_method(SVDMethod.lanczos())
        .lanczos_block(4)
        .engine("sparse")
        .build()
    )
    ps = (
        SparsePCABuilder()
        .n_components(4)
        .svd_method(SVDMethod.lanczos())
        .engine("sparse")
        .build()
    )
    Tb = np.asarray(pb.fit_transform(X))
    Ts = np.asarray(ps.fit_transform(X))
    np.testing.assert_allclose(
        np.asarray(pb.explained_variance_),
        np.asarray(ps.explained_variance_),
        rtol=1e-4,
    )
    np.testing.assert_allclose(np.abs(Tb), np.abs(Ts), atol=2e-3)


def test_block_wider_than_operator_is_clamped():
    op, X = _op(n=40, p=5, density=0.5, seed=13)
    res = block_lanczos_svd(op, 2, block_size=8, steps=4, seed=0)
    s_ref = np.linalg.svd(X.toarray().astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(res.s, np.float64), s_ref[:2], rtol=1e-4)


def test_pca_block_steps_are_krylov_dimension(monkeypatch):
    """SparsePCABuilder.lanczos_steps documents the KRYLOV DIMENSION; in
    block mode the engine must receive ceil(steps/b) BLOCK steps (advisor
    r2: a tuned depth silently did b-fold more work)."""

    import scipy.sparse as sp

    import single_algebra_tpu.models.pca as pcamod
    from single_algebra_tpu.models import SparsePCABuilder

    seen = {}
    real = pcamod.block_lanczos_svd

    def spy(op, k, *, block_size, steps, seed, tol=None):
        seen["steps"] = steps
        seen["block"] = block_size
        return real(op, k, block_size=block_size, steps=steps, seed=seed,
                    tol=tol)

    monkeypatch.setattr(pcamod, "block_lanczos_svd", spy)
    X = sp.random(
        300, 90, 0.1, format="csr", dtype=np.float32, random_state=7
    )
    # unique (steps, block) pair so the jitted fit graph retraces and the
    # trace goes through the spy
    pca = (
        SparsePCABuilder().n_components(3).lanczos_steps(37)
        .lanczos_block(5).engine("sparse").build()
    )
    pca.fit(X)
    assert seen["block"] == 5
    assert seen["steps"] == -(-37 // 5)  # ceil(krylov_dim / b) = 8
