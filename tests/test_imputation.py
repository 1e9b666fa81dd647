"""MAGIC diffusion imputation: denoising recovers planted rates."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.imputation import magic


def _trajectory_counts(n=400, p=60, seed=0):
    """Rates vary smoothly along a 1-d trajectory; counts are Poisson."""

    rng = np.random.default_rng(seed)
    tt = np.sort(rng.random(n))
    freqs = rng.integers(1, 4, p)
    phases = rng.random(p) * 2 * np.pi
    rates = 2.0 + 1.8 * np.sin(
        2 * np.pi * freqs[None, :] * tt[:, None] + phases[None, :]
    )
    X = rng.poisson(rates).astype(np.float32)
    emb = np.stack([tt * 20, np.zeros(n)], 1).astype(np.float32)
    return X, rates, emb


def test_magic_denoises_towards_true_rates():
    X, rates, emb = _trajectory_counts()
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    imp = magic(m, embedding=emb, n_neighbors=12, t=3, block=16)
    raw_err = np.abs(X - rates).mean()
    imp_err = np.abs(imp - rates).mean()
    assert imp_err < 0.5 * raw_err, (raw_err, imp_err)
    # global mean roughly preserved (diffusion is an averaging operator)
    assert abs(imp.mean() - X.mean()) < 0.1 * X.mean()


def test_magic_dense_input_matches_sparse():
    X, _, emb = _trajectory_counts(seed=1)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    a = magic(m, embedding=emb, t=2, block=32)
    b = magic(X, embedding=emb, t=2, block=32)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_magic_matches_explicit_markov_power():
    """Block/SpMM result == dense (M^t X) computed by hand."""

    X, _, emb = _trajectory_counts(n=120, p=10, seed=2)
    got = magic(X, embedding=emb, n_neighbors=8, t=3, block=4)
    from single_algebra_tpu.neighbors import connectivities

    W = connectivities(emb, 8).toarray()
    np.fill_diagonal(W, 1.0)
    M = W / W.sum(1, keepdims=True)
    ref = np.linalg.matrix_power(M, 3) @ X
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_magic_validation():
    X, _, emb = _trajectory_counts(n=50, p=8, seed=3)
    with pytest.raises(ValueError, match="t="):
        magic(X, embedding=emb, t=0)
    with pytest.raises(ValueError, match="embedding rows"):
        magic(X, embedding=emb[:-1])
