"""Public kNN API: exactness vs brute force."""

import numpy as np
import pytest

from single_algebra_tpu.neighbors import knn


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((500, 16)).astype(np.float32)
    d, idx = knn(X, 8, block=256)
    d, idx = np.asarray(d), np.asarray(idx)
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    ref_d = np.sort(D, axis=1)[:, :8]
    np.testing.assert_allclose(d, ref_d, atol=1e-2)
    # ascending order
    assert (np.diff(d, axis=1) >= -1e-4).all()
    for i in range(500):
        assert set(idx[i]) == set(np.argsort(D[i])[:8])


def test_knn_validation():
    X = np.zeros((5, 3), np.float32)
    with pytest.raises(ValueError):
        knn(X, 5)
    idx = knn(X, 2, return_distances=False)
    assert np.asarray(idx).shape == (5, 2)
