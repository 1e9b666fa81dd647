"""KMeans tests: planted-cluster recovery, sparse==dense, sklearn-quality
inertia, empty-cluster reseeding, predict/transform consistency,
builder/save/load surfaces."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.models import KMeans, KMeansBuilder


def blobs(n=600, d=12, k=5, spread=0.15, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * 4.0
    labels = rng.integers(0, k, n)
    X = centers[labels] + rng.standard_normal((n, d)) * spread
    return X.astype(np.float32), labels, centers


def purity(pred, true):
    """Fraction of points whose predicted cluster's majority true label
    matches their own (1.0 = perfect up to relabeling)."""

    pred = np.asarray(pred)
    hit = 0
    for c in np.unique(pred):
        sel = pred == c
        if sel.any():
            vals, counts = np.unique(true[sel], return_counts=True)
            hit += counts.max()
    return hit / len(true)


def test_recovers_planted_clusters():
    X, true, _ = blobs()
    km = KMeans(5, n_init=3).fit(X)
    assert purity(km.labels_, true) > 0.99
    assert km.cluster_centers_.shape == (5, 12)
    assert km.n_iter_ >= 1
    assert np.isfinite(km.inertia_)


def test_sparse_matches_dense():
    X, _, _ = blobs(n=300, d=10, k=4, seed=3)
    X[np.abs(X) < 0.5] = 0.0  # make it genuinely sparse
    m = SparseMatrix.from_scipy(sp.csr_matrix(X.astype(np.float64)))
    km_d = KMeans(4, random_seed=7).fit(X)
    km_s = KMeans(4, random_seed=7).fit(m)
    # identical seeds -> identical init draws; the trajectories agree to
    # kernel-level float reassociation
    assert np.array_equal(np.asarray(km_d.labels_), np.asarray(km_s.labels_))
    np.testing.assert_allclose(
        np.asarray(km_d.cluster_centers_),
        np.asarray(km_s.cluster_centers_),
        atol=1e-4,
    )


def test_inertia_matches_definition_and_sklearn_quality():
    X, _, _ = blobs(n=400, d=8, k=3, spread=0.8, seed=5)
    km = KMeans(3, n_init=3).fit(X)
    d = np.asarray(km.transform(X))
    np.testing.assert_allclose(
        km.inertia_, (d.min(axis=1) ** 2).sum(), rtol=1e-4
    )
    from sklearn.cluster import KMeans as SkKMeans

    sk = SkKMeans(3, n_init=3, random_state=0).fit(np.asarray(X))
    assert km.inertia_ <= 1.05 * sk.inertia_


def test_predict_consistent_with_fit():
    X, _, _ = blobs(n=200, d=6, k=4, seed=9)
    km = KMeans(4).fit(X)
    assert np.array_equal(np.asarray(km.predict(X)), np.asarray(km.labels_))
    assert np.array_equal(
        np.asarray(km.fit_predict(X)), np.asarray(km.labels_)
    )


def test_empty_cluster_reseeded_duplicates():
    # two distinct coordinate values, k=4: at least two centers collapse,
    # forcing the empty-cluster reseed path to run without NaNs
    X = np.repeat(np.array([[0.0, 0.0], [5.0, 5.0]], np.float32), 20, axis=0)
    km = KMeans(4, max_iter=10).fit(X)
    assert np.all(np.isfinite(np.asarray(km.cluster_centers_)))
    assert km.inertia_ >= 0.0


def test_transform_shape_and_sign():
    X, _, _ = blobs(n=100, d=5, k=3, seed=2)
    km = KMeans(3).fit(X)
    d = np.asarray(km.transform(X))
    assert d.shape == (100, 3)
    assert (d >= 0).all()
    assert km.score(X) == pytest.approx(-(d.min(axis=1) ** 2).sum(), rel=1e-4)


def test_validation_errors():
    X = np.zeros((5, 3), np.float32)
    with pytest.raises(ValueError, match="n_clusters"):
        KMeans(0)
    with pytest.raises(ValueError, match="n_init"):
        KMeans(2, n_init=0)
    with pytest.raises(ValueError, match="exceeds n_samples"):
        KMeans(10).fit(X)
    with pytest.raises(ValueError, match="features"):
        KMeans(2).fit(X).predict(np.zeros((4, 7), np.float32))
    with pytest.raises(ValueError, match="2-d"):
        KMeans(2).fit(np.zeros(5, np.float32))


def test_builder_defaults_and_fluency():
    km = KMeansBuilder().build()
    assert (km.n_clusters, km.max_iter, km.tol, km.n_init, km.random_seed) == (
        8, 300, 1e-4, 1, 42,
    )
    km = (
        KMeansBuilder()
        .n_clusters(3)
        .max_iter(50)
        .tol(1e-3)
        .n_init(2)
        .random_seed(1)
        .verbose(True)
        .build()
    )
    assert (km.n_clusters, km.max_iter, km.n_init) == (3, 50, 2)
    assert km.verbose


def test_save_load_roundtrip(tmp_path):
    X, _, _ = blobs(n=120, d=4, k=3, seed=11)
    km = KMeans(3).fit(X)
    path = str(tmp_path / "km")
    km.save(path)
    km2 = KMeans.load(path)
    assert np.array_equal(np.asarray(km2.predict(X)), np.asarray(km.labels_))
    assert km2.inertia_ == pytest.approx(km.inertia_)


def test_n_init_picks_best():
    X, _, _ = blobs(n=300, d=6, k=6, spread=0.4, seed=13)
    one = KMeans(6, n_init=1, random_seed=3).fit(X)
    many = KMeans(6, n_init=5, random_seed=3).fit(X)
    assert many.inertia_ <= one.inertia_ + 1e-6


# ---------------------------------------------------------------------------
# mesh mode (virtual 8-device CPU mesh)

import jax  # noqa: E402

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


@needs_mesh
def test_mesh_matches_single_device():
    from single_algebra_tpu.parallel import make_mesh

    # n NOT divisible by 8: exercises the zero-weight row padding
    X, true, _ = blobs(n=603, d=12, k=5, seed=17)
    km1 = KMeans(5, random_seed=4).fit(X)
    km8 = KMeans(5, random_seed=4, mesh=make_mesh(8)).fit(X)
    assert km8.labels_.shape == (603,)
    # same seed -> same ++init draws; trajectories agree up to psum
    # reassociation of the centroid update
    assert np.array_equal(np.asarray(km1.labels_), np.asarray(km8.labels_))
    np.testing.assert_allclose(
        np.asarray(km1.cluster_centers_),
        np.asarray(km8.cluster_centers_),
        atol=1e-4,
    )
    assert km8.inertia_ == pytest.approx(km1.inertia_, rel=1e-4)
    assert purity(km8.labels_, true) > 0.99


@needs_mesh
def test_mesh_invariance_1_vs_8():
    from single_algebra_tpu.parallel import make_mesh

    X, _, _ = blobs(n=256, d=8, k=4, seed=19)
    a = KMeans(4, random_seed=2, mesh=make_mesh(1)).fit(X)
    b = KMeans(4, random_seed=2, mesh=make_mesh(8)).fit(X)
    assert np.array_equal(np.asarray(a.labels_), np.asarray(b.labels_))
    np.testing.assert_allclose(
        np.asarray(a.cluster_centers_),
        np.asarray(b.cluster_centers_),
        atol=1e-4,
    )


@needs_mesh
def test_mesh_rejects_sparse():
    from single_algebra_tpu.parallel import make_mesh

    X, _, _ = blobs(n=100, d=6, k=3, seed=21)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X.astype(np.float64)))
    with pytest.raises(ValueError, match="mesh mode supports dense"):
        KMeans(3, mesh=make_mesh(8)).fit(m)


@needs_mesh
def test_mesh_builder():
    from single_algebra_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    km = KMeansBuilder().n_clusters(3).mesh(mesh).build()
    assert km.mesh is mesh


# ---------------------------------------------------------------------------
# minibatch partial_fit (out-of-core)


def test_partial_fit_converges_to_planted_clusters():
    X, true, _ = blobs(n=2400, d=10, k=5, seed=23)
    km = KMeans(5, random_seed=1)
    rng = np.random.default_rng(0)
    for _ in range(3):  # 3 shuffled epochs of 300-row batches
        order = rng.permutation(len(X))
        for b0 in range(0, len(X), 300):
            km.partial_fit(X[order[b0:b0 + 300]])
    pred = np.asarray(km.predict(X))
    assert purity(pred, true) > 0.95
    assert km.n_iter_ == 24  # one per batch


def test_partial_fit_first_batch_is_batch_means():
    X, _, _ = blobs(n=200, d=6, k=4, seed=25)
    km = KMeans(4, random_seed=2).partial_fit(X)
    # after one batch, each nonempty center is exactly its batch mean
    pred = np.asarray(km.labels_)
    C = np.asarray(km.cluster_centers_)
    for c in range(4):
        if (pred == c).any():
            np.testing.assert_allclose(
                C[c], X[pred == c].mean(axis=0), rtol=1e-4, atol=1e-4
            )


def test_partial_fit_sparse_matches_dense():
    X, _, _ = blobs(n=400, d=8, k=3, seed=27)
    X[np.abs(X) < 0.5] = 0.0
    km_d = KMeans(3, random_seed=5)
    km_s = KMeans(3, random_seed=5)
    for b0 in range(0, 400, 100):
        batch = X[b0:b0 + 100]
        km_d.partial_fit(batch)
        km_s.partial_fit(
            SparseMatrix.from_scipy(sp.csr_matrix(batch.astype(np.float64)))
        )
    assert np.array_equal(np.asarray(km_d.labels_), np.asarray(km_s.labels_))
    np.testing.assert_allclose(
        np.asarray(km_d.cluster_centers_),
        np.asarray(km_s.cluster_centers_),
        atol=1e-4,
    )


def test_partial_fit_validation():
    km = KMeans(10)
    with pytest.raises(ValueError, match="first batch"):
        km.partial_fit(np.zeros((5, 3), np.float32))
    km2 = KMeans(2).partial_fit(np.zeros((8, 3), np.float32))
    with pytest.raises(ValueError, match="features"):
        km2.partial_fit(np.zeros((8, 5), np.float32))


def test_partial_fit_resumes_after_save_load(tmp_path):
    X, _, _ = blobs(n=300, d=6, k=3, seed=29)
    km = KMeans(3, random_seed=8)
    km.partial_fit(X[:150])
    path = str(tmp_path / "mb")
    km.save(path)
    km2 = KMeans.load(path)
    km.partial_fit(X[150:])
    km2.partial_fit(X[150:])
    np.testing.assert_allclose(
        np.asarray(km.cluster_centers_),
        np.asarray(km2.cluster_centers_),
        atol=1e-6,
    )
