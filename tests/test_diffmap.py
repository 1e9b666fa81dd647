"""diffmap / dpt vs dense eigendecomposition + trajectory ordering."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu.models.diffmap import (
    DiffMapResult,
    diffmap,
    diffusion_pseudotime,
)


def _dense_transition(W):
    """Reference: dense symmetric transition operator (alpha=1)."""

    W = W.toarray().astype(np.float64)
    q = np.maximum(W.sum(1), 1e-30)
    K = W / np.outer(q, q)
    z = np.maximum(K.sum(1), 1e-30)
    return K / np.sqrt(np.outer(z, z))


def _graph(n=120, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, 6)).astype(np.float32)
    from single_algebra_tpu import neighbors

    return neighbors.connectivities(X, n_neighbors=10), X


def test_diffmap_matches_dense_eigh():
    W, _ = _graph()
    res = diffmap(W, n_comps=6, seed=0)
    T = _dense_transition(W)
    evals, evecs = np.linalg.eigh(T)
    evals, evecs = evals[::-1], evecs[:, ::-1]
    np.testing.assert_allclose(res.eigenvalues, evals[:6], atol=2e-4)
    assert abs(res.eigenvalues[0] - 1.0) < 1e-4  # steady state
    for j in range(6):
        dot = abs(float(res.embedding[:, j] @ evecs[:, j]))
        assert dot > 0.999, (j, dot)


def test_diffmap_from_dense_embedding():
    _, X = _graph(seed=1)
    res = diffmap(X, n_comps=4, n_neighbors=10, seed=0)
    assert isinstance(res, DiffMapResult)
    assert res.embedding.shape == (120, 4)
    assert (np.diff(res.eigenvalues) <= 1e-9).all()  # descending


def test_dc1_orders_a_trajectory():
    """On a 1-D chain of points, the first non-trivial component is
    monotone along the chain (the diffusion-pseudotime use case)."""

    rng = np.random.default_rng(2)
    t = np.sort(rng.random(200))
    X = np.stack([10 * t, np.zeros(200)], 1) + rng.normal(0, 0.05, (200, 2))
    res = diffmap(X.astype(np.float32), n_comps=4, n_neighbors=10, seed=0)
    dc1 = res.embedding[:, 1]
    corr = abs(np.corrcoef(dc1, t)[0, 1])
    assert corr > 0.95, corr

    dpt = diffusion_pseudotime(res, root=0)
    assert dpt.shape == (200,) and dpt.max() == pytest.approx(1.0)
    assert abs(np.corrcoef(dpt, t)[0, 1]) > 0.9


def test_dpt_validation_and_determinism():
    W, _ = _graph(seed=3)
    r1 = diffmap(W, n_comps=5, seed=4)
    r2 = diffmap(W, n_comps=5, seed=4)
    np.testing.assert_array_equal(r1.embedding, r2.embedding)
    with pytest.raises(ValueError, match="root"):
        diffusion_pseudotime(r1, root=10_000)
    with pytest.raises(ValueError, match="n_comps"):
        diffmap(W, n_comps=1)
    with pytest.raises(ValueError, match="square"):
        diffmap(sp.random(5, 7, density=0.5))
