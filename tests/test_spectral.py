"""SpectralClustering: nonconvex recovery (where KMeans fails), blob
recovery, sklearn agreement, validation, builder."""

import numpy as np
import pytest

from single_algebra_tpu.metrics import adjusted_rand_index
from single_algebra_tpu.models import (
    KMeans,
    SpectralClustering,
    SpectralClusteringBuilder,
)


def two_moons(n=400, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    n2 = n // 2
    t = rng.random(n2) * np.pi
    a = np.stack([np.cos(t), np.sin(t)], axis=1)
    b = np.stack([1.0 - np.cos(t), 0.5 - np.sin(t)], axis=1)
    X = np.concatenate([a, b]) + rng.normal(0, noise, (2 * n2, 2))
    y = np.repeat([0, 1], n2)
    return X.astype(np.float32), y


def blobs(n=500, d=8, k=4, spread=0.3, seed=1):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * 4.0
    lab = rng.integers(0, k, n)
    X = centers[lab] + rng.standard_normal((n, d)) * spread
    return X.astype(np.float32), lab


def test_moons_where_kmeans_fails():
    X, y = two_moons()
    sc = SpectralClustering(2, n_neighbors=10, random_seed=0).fit(X)
    ari_spectral = adjusted_rand_index(y, sc.labels_)
    ari_kmeans = adjusted_rand_index(
        y, np.asarray(KMeans(2, n_init=3).fit(X).labels_)
    )
    assert ari_spectral > 0.95  # nonconvex clusters recovered
    assert ari_kmeans < 0.6  # ...which Lloyd cannot do
    assert sc.maps_.shape == (len(X), 2)
    assert sc.affinity_matrix_.shape == (len(X), len(X))


def test_blobs_recovered():
    X, y = blobs()
    labels = SpectralClustering(4, n_neighbors=12, random_seed=1).fit_predict(X)
    assert adjusted_rand_index(y, labels) > 0.95


def test_matches_sklearn_partition():
    from sklearn.cluster import SpectralClustering as SkSpectral

    X, _ = two_moons(n=300, seed=2)
    ours = SpectralClustering(2, n_neighbors=10, random_seed=3).fit_predict(X)
    theirs = SkSpectral(
        2, affinity="nearest_neighbors", n_neighbors=10, random_state=3
    ).fit_predict(X)
    assert adjusted_rand_index(ours, theirs) > 0.95


def test_validation():
    X = np.zeros((10, 3), np.float32)
    with pytest.raises(ValueError, match="n_clusters"):
        SpectralClustering(1)
    with pytest.raises(ValueError, match="n_neighbors"):
        SpectralClustering(2, n_neighbors=0)
    with pytest.raises(ValueError, match="exceeds"):
        SpectralClustering(20).fit(X)
    with pytest.raises(ValueError, match="n_neighbors"):
        SpectralClustering(2, n_neighbors=15).fit(X)
    with pytest.raises(ValueError, match="2-d"):
        SpectralClustering(2).fit(np.zeros(5, np.float32))


def test_builder():
    sc = (
        SpectralClusteringBuilder()
        .n_clusters(3)
        .n_neighbors(7)
        .n_init(2)
        .random_seed(5)
        .build()
    )
    assert (sc.n_clusters, sc.n_neighbors, sc.n_init, sc.random_seed) == (
        3, 7, 2, 5,
    )
