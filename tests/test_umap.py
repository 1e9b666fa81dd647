"""UMAP: kNN graph exactness, sigma calibration, cluster preservation."""

import numpy as np
import pytest

from single_algebra_tpu.models.umap import (
    UMAP,
    UMAPConfig,
    _knn_graph,
    _smooth_knn,
)


def _blobs(n_per=60, d=20, n_clusters=3, sep=8.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * sep
    X = np.concatenate(
        [c + rng.standard_normal((n_per, d)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(n_clusters), n_per)
    return X, labels


def test_knn_graph_exact():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((300, 12)).astype(np.float32)
    k = 10
    d, idx = _knn_graph(X, k=k, block=128)
    d, idx = np.asarray(d), np.asarray(idx)
    # brute-force reference
    D = np.sqrt(
        np.maximum(
            ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1), 0.0
        )
    )
    np.fill_diagonal(D, np.inf)
    ref_idx = np.argsort(D, axis=1)[:, :k]
    ref_d = np.sort(D, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(d, axis=1), ref_d, atol=1e-2)
    # index sets must agree (order may differ on ties)
    for i in range(300):
        assert set(idx[i]) == set(ref_idx[i]), i


def test_smooth_knn_hits_target():
    rng = np.random.default_rng(2)
    d = np.abs(rng.standard_normal((100, 15))).astype(np.float32)
    d.sort(axis=1)
    rho, sigma = _smooth_knn(d)
    rho, sigma = np.asarray(rho), np.asarray(sigma)
    psum = np.exp(
        -np.maximum(d - rho[:, None], 0.0) / sigma[:, None]
    ).sum(axis=1)
    target = np.log2(15)
    assert np.abs(psum - target).max() < 0.05


def test_umap_separates_clusters():
    X, labels = _blobs()
    emb = np.asarray(
        UMAP(
            UMAPConfig(n_neighbors=10, n_epochs=150, random_seed=0)
        ).fit_transform(X)
    )
    assert emb.shape == (len(X), 2)
    assert np.isfinite(emb).all()
    # mean within-cluster distance well below mean across-cluster distance
    within, across = [], []
    for c in range(3):
        pts = emb[labels == c]
        others = emb[labels != c]
        within.append(
            np.linalg.norm(pts - pts.mean(0), axis=1).mean()
        )
        across.append(
            np.linalg.norm(others - pts.mean(0), axis=1).mean()
        )
    assert np.mean(across) > 2.0 * np.mean(within), (within, across)


def test_umap_validation():
    with pytest.raises(ValueError, match="samples"):
        UMAP(UMAPConfig(n_neighbors=5)).fit_transform(
            np.zeros((1, 3), np.float32)
        )


def test_umap_pads_when_input_narrower_than_components():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((60, 1)).astype(np.float32)
    emb = np.asarray(UMAP(UMAPConfig(n_neighbors=5, n_epochs=20)).fit_transform(X))
    assert emb.shape == (60, 2)
    assert np.isfinite(emb).all()


def test_transform_places_new_points_with_their_cluster():
    rng = np.random.default_rng(7)
    mu = rng.normal(0, 10, (3, 6))
    lab = rng.integers(0, 3, 300)
    X = (mu[lab] + rng.normal(0, 0.8, (300, 6))).astype(np.float32)
    um = UMAP(UMAPConfig(n_neighbors=12, n_epochs=150, random_seed=0))
    Y = np.asarray(um.fit_transform(X))

    new_lab = rng.integers(0, 3, 60)
    X_new = (mu[new_lab] + rng.normal(0, 0.8, (60, 6))).astype(np.float32)
    Y_new = np.asarray(um.transform(X_new))
    assert Y_new.shape == (60, 2)
    assert np.isfinite(Y_new).all()
    # each new point lands nearest its own cluster's training centroid
    cents = np.stack([Y[lab == c].mean(0) for c in range(3)])
    d = np.linalg.norm(Y_new[:, None] - cents[None], axis=2)
    acc = (d.argmin(1) == new_lab).mean()
    assert acc > 0.95, acc
    # deterministic
    np.testing.assert_allclose(
        np.asarray(um.transform(X_new)), Y_new, atol=1e-5
    )


def test_transform_validation():
    um = UMAP(UMAPConfig(n_neighbors=5, n_epochs=20))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="fitted"):
        um.transform(np.zeros((3, 4), np.float32))
    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, (50, 4)).astype(np.float32)
    um.fit_transform(X)
    with _pytest.raises(ValueError, match="X_new must be"):
        um.transform(np.zeros((3, 7), np.float32))
