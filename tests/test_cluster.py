"""Leiden clustering + connectivities graph construction."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import neighbors
from single_algebra_tpu.cluster import leiden, modularity, _leiden_py
from single_algebra_tpu.metrics import adjusted_rand_index
from single_algebra_tpu.native.build import get_leiden_lib


def _ring_of_cliques(n_cliques=8, size=6, seed=0):
    """Cliques joined in a ring by single edges — known ground truth."""

    n = n_cliques * size
    rows, cols = [], []
    for c in range(n_cliques):
        base = c * size
        for i in range(size):
            for j in range(size):
                if i != j:
                    rows.append(base + i)
                    cols.append(base + j)
        nxt = ((c + 1) % n_cliques) * size
        rows += [base, nxt]
        cols += [nxt, base]
    a = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n)
    ).tocsr()
    a.sum_duplicates()
    truth = np.repeat(np.arange(n_cliques), size)
    return a, truth


def _blobs(n_per=60, centers=3, d=5, seed=0):
    rng = np.random.default_rng(seed)
    mu = rng.normal(0, 10, (centers, d))
    X = np.concatenate(
        [rng.normal(mu[c], 1.0, (n_per, d)) for c in range(centers)]
    ).astype(np.float32)
    truth = np.repeat(np.arange(centers), n_per)
    return X, truth


def test_leiden_recovers_ring_of_cliques():
    a, truth = _ring_of_cliques()
    res = leiden(a, seed=1)
    assert res.n_communities == 8
    assert adjusted_rand_index(truth, res.labels) == pytest.approx(1.0)
    assert res.labels.dtype == np.int32
    assert set(res.labels) == set(range(res.n_communities))
    # reported quality matches the independent host computation
    assert res.quality == pytest.approx(
        modularity(a, res.labels), abs=1e-10
    )


def test_leiden_on_connectivities_recovers_blobs():
    X, truth = _blobs()
    S = neighbors.connectivities(X, n_neighbors=10)
    # resolution 1.0 legitimately over-splits 60-node blobs (the
    # resolution limit); 0.5 recovers the planted structure exactly
    res = leiden(S, seed=0, resolution=0.5)
    assert adjusted_rand_index(truth, res.labels) == pytest.approx(1.0)
    assert res.n_communities == 3
    # at any resolution the optimizer must not underperform the planted
    # partition's quality
    r1 = leiden(S, seed=0, resolution=1.0)
    assert r1.quality >= modularity(S, truth, resolution=1.0) - 1e-9


def test_leiden_deterministic_and_seed_sensitive():
    a, _ = _ring_of_cliques(n_cliques=6, size=5, seed=2)
    r1 = leiden(a, seed=7)
    r2 = leiden(a, seed=7)
    np.testing.assert_array_equal(r1.labels, r2.labels)
    assert r1.quality == r2.quality


def test_resolution_controls_granularity():
    a, _ = _ring_of_cliques(n_cliques=12, size=5)
    lo = leiden(a, resolution=0.05, seed=0)
    hi = leiden(a, resolution=2.0, seed=0)
    assert lo.n_communities < hi.n_communities


def test_leiden_beats_random_partition_quality():
    a, _ = _ring_of_cliques()
    res = leiden(a, seed=0)
    rng = np.random.default_rng(0)
    rand_q = modularity(a, rng.integers(0, 8, a.shape[0]))
    assert res.quality > rand_q + 0.2


def test_directed_input_symmetrized_and_validation():
    a, _ = _ring_of_cliques(n_cliques=4, size=4)
    upper = sp.triu(a).tocsr()  # directed half
    res = leiden(upper, seed=0)
    assert res.n_communities == 4
    with pytest.raises(ValueError, match="square"):
        leiden(sp.random(5, 7, density=0.5, format="csr"))
    with pytest.raises(ValueError, match="non-negative"):
        neg = a.copy()
        neg.data[:] = -1.0
        leiden(neg)
    with pytest.raises(TypeError, match="sparse"):
        leiden(np.ones((4, 4)))


def test_sparsematrix_input():
    from single_algebra_tpu import SparseMatrix

    a, truth = _ring_of_cliques(n_cliques=5, size=5)
    m = SparseMatrix.from_scipy(a)
    res = leiden(m, seed=0)
    assert adjusted_rand_index(truth, res.labels) == pytest.approx(1.0)


def test_python_fallback_matches_quality():
    a, truth = _ring_of_cliques()
    res_py_labels = _leiden_py(
        a.indptr.astype(np.int64), a.indices.astype(np.int64),
        a.data.astype(np.float64), a.shape[0], 1.0, 0, 10,
    )
    assert adjusted_rand_index(truth, res_py_labels) == pytest.approx(1.0)
    if get_leiden_lib() is not None:
        res_nat = leiden(a, seed=0)
        q_py = modularity(a, res_py_labels)
        assert abs(res_nat.quality - q_py) < 0.02


def test_fallback_env_gate(monkeypatch):
    import single_algebra_tpu.native.build as build

    monkeypatch.setattr(build, "leiden_native", lambda *a, **k: None)
    a, truth = _ring_of_cliques(n_cliques=4, size=5)
    res = leiden(a, seed=0)
    assert res.backend == "python"
    assert adjusted_rand_index(truth, res.labels) == pytest.approx(1.0)


def test_singleton_and_empty_graphs():
    empty = sp.csr_matrix((0, 0), dtype=np.float32)
    assert leiden(empty).n_communities == 0
    lone = sp.csr_matrix((3, 3), dtype=np.float32)  # no edges
    res = leiden(lone)
    assert res.n_communities == 3  # every isolated node its own community


def test_connectivities_properties():
    X, _ = _blobs(n_per=30, centers=2)
    S = neighbors.connectivities(X, n_neighbors=8)
    n = X.shape[0]
    assert S.shape == (n, n)
    assert abs(S - S.T).max() < 1e-12  # symmetric
    assert S.data.min() > 0 and S.data.max() <= 1.0 + 1e-12
    assert (S.diagonal() == 0).all()
    # every node keeps at least its k directed edges in the union
    deg = np.diff(S.tocsr().indptr)
    assert deg.min() >= 8


def test_connectivities_matches_manual_union():
    X, _ = _blobs(n_per=20, centers=2, seed=3)
    k = 5
    S = neighbors.connectivities(X, n_neighbors=k).toarray()
    # brute-force reference: same formulas in numpy
    from single_algebra_tpu.models.umap import _knn_graph, _smooth_knn

    d, idx = _knn_graph(np.asarray(X), k=k, block=64)
    rho, sigma = _smooth_knn(d)
    W = np.exp(
        -np.maximum(np.asarray(d) - np.asarray(rho)[:, None], 0.0)
        / np.asarray(sigma)[:, None]
    )
    n = X.shape[0]
    A = np.zeros((n, n))
    for i in range(n):
        for jj in range(k):
            A[i, np.asarray(idx)[i, jj]] = W[i, jj]
    ref = A + A.T - A * A.T
    np.testing.assert_allclose(S, ref, rtol=1e-5, atol=1e-7)


# ----------------------------------------------------------------------
# PAGA
# ----------------------------------------------------------------------


def test_paga_chain_topology():
    """Three blobs bridged in a chain: A-B and B-C strongly connected,
    A-C not."""

    rng = np.random.default_rng(0)
    mu = np.array([[0.0, 0], [6.0, 0], [12.0, 0]])
    X = np.concatenate(
        [rng.normal(mu[c], 1.2, (70, 2)) for c in range(3)]
    ).astype(np.float32)
    truth = np.repeat(np.arange(3), 70)
    from single_algebra_tpu.cluster import paga

    S = neighbors.connectivities(X, n_neighbors=10)
    conn = paga(S, truth)
    assert conn.shape == (3, 3)
    np.testing.assert_allclose(conn, conn.T)
    assert (np.diag(conn) == 0).all()
    assert conn[0, 1] > 5 * max(conn[0, 2], 1e-12)
    assert conn[1, 2] > 5 * max(conn[0, 2], 1e-12)
    assert conn.max() <= 1.0


def test_paga_manual_small_graph():
    """Hand-computed null model on a 5-node graph."""

    from single_algebra_tpu.cluster import paga

    # clusters {0,1} and {2,3,4}; undirected edges:
    # 0-1 (inner), 2-3, 3-4 (inner), 1-2 (inter)
    rows = [0, 1, 2, 3, 3, 4, 1, 2]
    cols = [1, 0, 3, 2, 4, 3, 2, 1]
    a = sp.coo_matrix(
        (np.ones(8, np.float32), (rows, cols)), shape=(5, 5)
    ).tocsr()
    labels = np.array([0, 0, 1, 1, 1])
    conn = paga(a, labels)
    # e_01 = 1; es_0 = 1 inner + 1 inter = 2; es_1 = 2 inner + 1 = 3
    # expected = (2*3 + 3*2)/(5-1) = 3 -> conn = 1/3
    assert conn[0, 1] == pytest.approx(1.0 / 3.0)


def test_paga_with_leiden_labels():
    a, truth = _ring_of_cliques(n_cliques=6, size=6)
    res = leiden(a, seed=0)
    from single_algebra_tpu.cluster import paga

    conn = paga(a, res.labels)
    k = res.n_communities
    assert conn.shape == (k, k)
    # the ring topology: every clique touches exactly two neighbors
    assert ((conn > 0).sum(axis=1) == 2).all()


def test_paga_validation():
    from single_algebra_tpu.cluster import paga

    a, _ = _ring_of_cliques(n_cliques=4, size=4)
    with pytest.raises(ValueError, match="labels must have shape"):
        paga(a, np.zeros(3))


def test_dendrogram_groups_nearby_clusters():
    from single_algebra_tpu.cluster import dendrogram

    rng = np.random.default_rng(0)
    # four groups: a/b close together, c/d close together, pairs far apart
    mu = {"a": [0, 0], "b": [1, 0], "c": [20, 0], "d": [21, 0]}
    X, lab = [], []
    for g, m in mu.items():
        X.append(rng.normal(m, 0.2, (40, 2)))
        lab += [g] * 40
    X = np.concatenate(X)
    d = dendrogram(X, lab, metric="euclidean")
    assert set(d["groups"]) == set("abcd")
    order = list(d["order"])
    # a,b adjacent and c,d adjacent in the leaf order
    assert abs(order.index("a") - order.index("b")) == 1
    assert abs(order.index("c") - order.index("d")) == 1
    assert d["linkage"].shape == (3, 4)
    with pytest.raises(ValueError, match="labels length"):
        dendrogram(X, lab[:-1])
    with pytest.raises(ValueError, match="at least 2"):
        dendrogram(X, ["z"] * X.shape[0])


def test_connectivities_ivf_method_agrees_with_exact():
    X, truth = _blobs(n_per=200, centers=3, seed=5)
    S_ex = neighbors.connectivities(X, 10, method="exact")
    S_iv = neighbors.connectivities(X, 10, method="ivf")
    # graphs nearly identical on clustered data -> same leiden result
    r_ex = leiden(S_ex, resolution=0.5, seed=0)
    r_iv = leiden(S_iv, resolution=0.5, seed=0)
    assert adjusted_rand_index(r_ex.labels, r_iv.labels) == pytest.approx(1.0)
    assert adjusted_rand_index(truth, r_iv.labels) == pytest.approx(1.0)
    overlap = (S_ex != 0).multiply(S_iv != 0).nnz / max((S_ex != 0).nnz, 1)
    assert overlap > 0.97, overlap
    with pytest.raises(ValueError, match="Unknown kNN method"):
        neighbors.connectivities(X, 10, method="annoy")
