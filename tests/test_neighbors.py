"""Public kNN API: exactness vs brute force."""

import numpy as np
import pytest

from single_algebra_tpu import neighbors
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


# ----------------------------------------------------------------------
# IVF approximate kNN
# ----------------------------------------------------------------------


def test_ivf_recall_on_clustered_embedding():
    rng = np.random.default_rng(0)
    mu = rng.normal(0, 6, (20, 16))
    X = (mu[rng.integers(0, 20, 4000)]
         + rng.normal(0, 1, (4000, 16))).astype(np.float32)
    d_ex, i_ex = neighbors.knn(X, 10)
    d_iv, i_iv = neighbors.ivf_knn(X, 10, seed=0)
    i_ex, i_iv = np.asarray(i_ex), np.asarray(i_iv)
    recall = np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(i_ex, i_iv)]
    )
    assert recall > 0.98, recall
    # distances ascending, self excluded
    d_iv = np.asarray(d_iv)
    assert (np.diff(d_iv, axis=1) >= -1e-5).all()
    assert not (i_iv == np.arange(4000)[:, None]).any()


def test_ivf_full_probe_is_exact():
    """n_probe == n_lists scans everything -> must equal exact kNN."""

    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (600, 8)).astype(np.float32)
    _, i_ex = neighbors.knn(X, 5)
    _, i_iv = neighbors.ivf_knn(
        X, 5, n_lists=16, n_probe=16, seed=0
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_iv), 1), np.sort(np.asarray(i_ex), 1)
    )


def test_ivf_query_mode():
    rng = np.random.default_rng(2)
    X = rng.normal(0, 1, (1500, 8)).astype(np.float32)
    Q = X[:40] + 1e-4  # near-duplicates: nearest must be the original
    _, idx = neighbors.ivf_knn(
        X, 1, query=Q, n_lists=32, n_probe=32, seed=0
    )
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(40))
    with pytest.raises(ValueError, match="query must be"):
        neighbors.ivf_knn(X, 3, query=np.ones((4, 9)))
    with pytest.raises(ValueError, match="k="):
        neighbors.ivf_knn(X, 0)


def test_ivf_underfilled_lists_fall_back_exactly():
    """Scattered points + imbalanced lists used to return -1 sentinels
    (crashing connectivities); underfilled rows now resolve exactly."""

    rng = np.random.default_rng(3)
    X = np.concatenate([
        rng.normal(0, 30, (63, 8)),  # scattered
        rng.normal(0, 0.5, (1937, 8)),  # one dense blob
    ]).astype(np.float32)
    d, i = neighbors.ivf_knn(X, 20, n_lists=64, n_probe=16, seed=0)
    d, i = np.asarray(d), np.asarray(i)
    assert (i >= 0).all()
    assert np.isfinite(d).all()
    # the graph construction that used to crash
    S = neighbors.connectivities(X, 20, method="ivf")
    assert np.isfinite(S.data).all() and S.shape == (2000, 2000)


def test_bbknn_balances_batches():
    rng = np.random.default_rng(4)
    # batch 1 shifted: plain kNN picks same-batch neighbors only
    types = rng.normal(0, 6, (3, 8))
    off = np.zeros(8); off[0] = 4.0
    Z, b_lab = [], []
    for b in range(2):
        for t in range(3):
            Z.append(types[t] + off * b + rng.normal(0, 0.6, (60, 8)))
            b_lab += [f"b{b}"] * 60
    Z = np.concatenate(Z).astype(np.float32)
    b_lab = np.asarray(b_lab)
    S = neighbors.bbknn(Z, b_lab, neighbors_within_batch=4)
    assert S.shape == (360, 360)
    assert abs(S - S.T).max() < 1e-12
    # every cell connects to BOTH batches
    coo = S.tocoo()
    other = np.zeros(360, bool)
    for i, j in zip(coo.row, coo.col):
        if b_lab[i] != b_lab[j]:
            other[i] = True
    assert other.mean() > 0.95
    # plain connectivities, by contrast, is batch-segregated here
    S0 = neighbors.connectivities(Z, 8)
    coo0 = S0.tocoo()
    cross0 = (b_lab[coo0.row] != b_lab[coo0.col]).mean()
    cross1 = (b_lab[coo.row] != b_lab[coo.col]).mean()
    assert cross1 > 3 * max(cross0, 1e-9)


def test_bbknn_trim_and_validation():
    rng = np.random.default_rng(5)
    Z = rng.normal(0, 1, (120, 6)).astype(np.float32)
    b = rng.choice(["x", "y", "z"], 120)
    S = neighbors.bbknn(Z, b, neighbors_within_batch=3, trim=6)
    deg = np.diff(S.indptr)
    assert deg.max() <= 6 * 3  # trimmed + symmetrized stays bounded
    assert abs(S - S.T).max() < 1e-12
    with pytest.raises(ValueError, match="batch length"):
        neighbors.bbknn(Z, b[:-1])
    with pytest.raises(ValueError, match="neighbors_within_batch"):
        neighbors.bbknn(Z, b, neighbors_within_batch=0)


def test_knn_cosine_matches_sklearn():
    from sklearn.neighbors import NearestNeighbors

    from single_algebra_tpu.neighbors import knn

    rng = np.random.default_rng(21)
    X = rng.normal(size=(150, 12)).astype(np.float32)
    d, idx = knn(X, 7, metric="cosine")
    ref = NearestNeighbors(n_neighbors=8, metric="cosine").fit(X)
    rd, ri = ref.kneighbors(X)
    # drop the self column from sklearn's output
    np.testing.assert_array_equal(np.asarray(idx), ri[:, 1:])
    np.testing.assert_allclose(np.asarray(d), rd[:, 1:], rtol=2e-4,
                               atol=2e-6)


def test_knn_cosine_scale_invariant():
    from single_algebra_tpu.neighbors import knn

    rng = np.random.default_rng(22)
    X = rng.normal(size=(100, 6)).astype(np.float32)
    scales = rng.uniform(0.1, 10.0, size=(100, 1)).astype(np.float32)
    _, i1 = knn(X, 5, metric="cosine")
    _, i2 = knn(X * scales, 5, metric="cosine")
    assert (np.asarray(i1) == np.asarray(i2)).mean() > 0.98


def test_cross_knn_cosine():
    from single_algebra_tpu.neighbors import cross_knn

    rng = np.random.default_rng(23)
    Q = rng.normal(size=(40, 8)).astype(np.float32)
    R = rng.normal(size=(90, 8)).astype(np.float32)
    d, idx = cross_knn(Q, R, 5, metric="cosine")
    qs = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    rs = R / np.linalg.norm(R, axis=1, keepdims=True)
    D = 1.0 - qs @ rs.T
    want = np.argsort(D, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), want)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(D, want, axis=1),
        rtol=2e-4, atol=2e-6,
    )


def test_connectivities_cosine_and_umap_metric():
    from single_algebra_tpu.models import UMAP
    from single_algebra_tpu.neighbors import connectivities

    rng = np.random.default_rng(24)
    # two DIRECTIONS (cosine clusters), magnitudes scrambled
    base = np.stack([np.ones(8), np.r_[np.ones(4), -np.ones(4)]])
    lab = rng.integers(0, 2, 120)
    X = (base[lab] + 0.05 * rng.normal(size=(120, 8))) * rng.uniform(
        0.1, 10.0, size=(120, 1)
    )
    S = connectivities(X.astype(np.float32), 10, metric="cosine")
    from single_algebra_tpu.cluster import leiden

    res = leiden(S, resolution=0.25, seed=0)
    from single_algebra_tpu.metrics import adjusted_rand_index

    assert adjusted_rand_index(lab, res.labels) == 1.0

    emb = UMAP(n_neighbors=10, n_epochs=50, metric="cosine").fit_transform(
        X.astype(np.float32)
    )
    assert np.isfinite(np.asarray(emb)).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="metric"):
        UMAP(metric="manhattan")
    with _pytest.raises(ValueError, match="metric"):
        connectivities(X.astype(np.float32), 5, metric="bogus")


@pytest.mark.parametrize("ndev", [1, 8])
def test_knn_mesh_matches_local(ndev):
    from single_algebra_tpu.neighbors import knn
    from single_algebra_tpu.parallel import make_mesh

    rng = np.random.default_rng(41)
    X = rng.normal(size=(203, 9)).astype(np.float32)  # non-round n
    d1, i1 = knn(X, 7)
    d2, i2 = knn(X, 7, mesh=make_mesh(ndev))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)
    # cosine metric composes with the mesh path
    d3, i3 = knn(X, 7, metric="cosine")
    d4, i4 = knn(X, 7, metric="cosine", mesh=make_mesh(ndev))
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))
    np.testing.assert_allclose(np.asarray(d3), np.asarray(d4),
                               rtol=1e-5, atol=1e-6)


def test_connectivities_mesh_matches_local():
    from single_algebra_tpu.neighbors import connectivities
    from single_algebra_tpu.parallel import make_mesh

    rng = np.random.default_rng(42)
    X = np.concatenate(
        [rng.normal(c * 6, 1.0, size=(60, 5)) for c in range(2)]
    ).astype(np.float32)
    S1 = connectivities(X, 10)
    S2 = connectivities(X, 10, mesh=make_mesh(8))
    assert (S1 != S2).nnz == 0 or abs(S1 - S2).max() < 1e-5
