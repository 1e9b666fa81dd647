"""ForceAtlas2 layout (models.draw_graph): structure recovery, adjacency
handling, determinism, and option plumbing on the CPU mesh."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu.models import draw_graph
from single_algebra_tpu.neighbors import connectivities


def _sbm(sizes, p_in=0.5, p_out=0.01, seed=0):
    """Stochastic block model adjacency (symmetric, unweighted)."""

    rng = np.random.default_rng(seed)
    n = sum(sizes)
    labels = np.repeat(np.arange(len(sizes)), sizes)
    prob = np.where(labels[:, None] == labels[None, :], p_in, p_out)
    upper = np.triu(rng.random((n, n)) < prob, k=1)
    A = (upper | upper.T).astype(np.float32)
    np.fill_diagonal(A, 0.0)
    return sp.csr_matrix(A), labels


def _separation(y, labels):
    """min across-centroid distance / mean within-cluster spread."""

    cents = np.stack([y[labels == c].mean(0) for c in np.unique(labels)])
    within = np.mean(
        [
            np.linalg.norm(y[labels == c] - cents[i], axis=1).mean()
            for i, c in enumerate(np.unique(labels))
        ]
    )
    d = np.linalg.norm(cents[:, None] - cents[None, :], axis=-1)
    across = d[np.triu_indices_from(d, k=1)].min()
    return across / max(within, 1e-9)


def test_layout_separates_blocks():
    A, labels = _sbm([60, 60, 60], seed=1)
    y = draw_graph(A, n_iter=300, seed=3)
    assert y.shape == (180, 2)
    assert np.isfinite(y).all()
    assert _separation(y, labels) > 2.0


def test_chain_graph_unrolls():
    # path graph: embedding distance must grow with graph distance
    n = 40
    rows = np.arange(n - 1)
    A = sp.coo_matrix(
        (np.ones(n - 1, np.float32), (rows, rows + 1)), shape=(n, n)
    ).tocsr()
    y = draw_graph(A, n_iter=400, seed=0)
    d_graph = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    d_emb = np.linalg.norm(y[:, None] - y[None, :], axis=-1)
    iu = np.triu_indices(n, k=1)
    from scipy.stats import spearmanr

    rho = spearmanr(d_graph[iu], d_emb[iu]).statistic
    assert rho > 0.8


def test_deterministic_and_seed_sensitive():
    A, _ = _sbm([40, 40], seed=2)
    y1 = draw_graph(A, n_iter=50, seed=7)
    y2 = draw_graph(A, n_iter=50, seed=7)
    y3 = draw_graph(A, n_iter=50, seed=8)
    np.testing.assert_array_equal(y1, y2)
    assert np.abs(y1 - y3).max() > 1e-3


def test_init_and_options():
    A, labels = _sbm([50, 50], seed=4)
    n = A.shape[0]
    init = np.random.default_rng(0).normal(size=(n, 2)).astype(np.float32)
    y = draw_graph(A, n_iter=250, init=init, strong_gravity=True,
                   dispatch_chunk=37)
    assert np.isfinite(y).all()
    assert _separation(y, labels) > 1.5
    # weak-attraction variants: valid configurations, smoke-checked
    y2 = draw_graph(A, n_iter=60, lin_log=True,
                    outbound_attraction_distribution=True,
                    edge_weight_influence=0.5)
    assert np.isfinite(y2).all()
    with pytest.raises(ValueError, match="init shape"):
        draw_graph(A, init=init[:10])


def test_connectivities_chain_and_3d():
    rng = np.random.default_rng(5)
    X = np.concatenate(
        [rng.normal(c * 8, 1.0, size=(40, 5)) for c in range(3)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), 40)
    S = connectivities(X, n_neighbors=10)
    y = draw_graph(S, n_iter=250, dim=3, seed=1)
    assert y.shape == (120, 3)
    assert _separation(y, labels) > 2.0


def test_validation():
    with pytest.raises(TypeError):
        draw_graph(np.zeros((4, 4)))
    A = sp.eye(5, format="csr")
    with pytest.raises(ValueError, match="n_iter"):
        draw_graph(A, n_iter=0)
    with pytest.raises(ValueError, match="dim"):
        draw_graph(A, dim=0)


def test_lin_log_separates_at_scale():
    # plain linear FA2 converges to a density-uniform spread on sparse
    # kNN-scale graphs; lin_log (Noack) is the cluster-separating mode
    A, labels = _sbm([300, 300, 300], p_in=0.04, p_out=0.0008, seed=9)
    y = draw_graph(A, n_iter=1200, seed=0, lin_log=True)
    assert _separation(y, labels) > 3.0


@pytest.mark.parametrize("ndev", [1, 8])
def test_mesh_layout_matches_single_device(ndev):
    from single_algebra_tpu.parallel import make_mesh

    A, labels = _sbm([50, 50, 50], seed=11)
    y_local = draw_graph(A, n_iter=60, seed=3)
    y_mesh = draw_graph(A, n_iter=60, seed=3, mesh=make_mesh(ndev))
    assert y_mesh.shape == y_local.shape
    # same controller, different tile partitioning/reduction order:
    # f32 drift compounds over iterations, so compare the structure
    assert np.isfinite(y_mesh).all()
    assert _separation(y_mesh, labels) > 2.0
    # and short runs agree tightly before drift accumulates
    y1 = draw_graph(A, n_iter=5, seed=3)
    y2 = draw_graph(A, n_iter=5, seed=3, mesh=make_mesh(ndev))
    np.testing.assert_allclose(y1, y2, rtol=5e-3, atol=1e-2)


def test_mesh_layout_options_smoke():
    from single_algebra_tpu.parallel import make_mesh

    A, _ = _sbm([40, 40], seed=12)
    y = draw_graph(
        A, n_iter=30, seed=1, mesh=make_mesh(8), lin_log=True,
        strong_gravity=True, outbound_attraction_distribution=True,
        dispatch_chunk=13,
    )
    assert y.shape == (80, 2) and np.isfinite(y).all()
