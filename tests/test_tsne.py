"""t-SNE tests: embedding quality on separable clusters + config parity.

The reference has zero t-SNE tests (module is WIP, tsne/mod.rs:1-2); these
verify the exact-mode optimizer actually separates well-separated clusters
and that the config surface matches.
"""

import numpy as np
import pytest

from single_algebra_tpu.models import tsne


def make_clusters(n_per=40, n_clusters=3, d=10, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 12.0
    pts, labels = [], []
    for c in range(n_clusters):
        pts.append(centers[c] + rng.standard_normal((n_per, d)))
        labels += [c] * n_per
    return np.vstack(pts).astype(np.float32), np.array(labels)


def test_tsne_separates_clusters():
    x, labels = make_clusters()
    cfg = tsne.TSNEConfig(output_dim=2, perplexity=15.0, epochs=400)
    y = np.asarray(tsne.run(x, cfg))
    assert y.shape == (x.shape[0], 2)
    assert np.isfinite(y).all()

    # intra-cluster distances must be much smaller than inter-cluster
    intra, inter = [], []
    for i in range(0, len(y), 7):
        for j in range(i + 1, len(y), 11):
            d = np.linalg.norm(y[i] - y[j])
            (intra if labels[i] == labels[j] else inter).append(d)
    assert np.median(intra) < 0.5 * np.median(inter)


def test_tsne_config_defaults():
    cfg = tsne.TSNEConfig()
    assert cfg.output_dim == 2
    assert cfg.perplexity == 30.0
    assert cfg.epochs == 1000
    assert cfg.theta == 0.5


def test_tsne_validation():
    x = np.random.default_rng(0).standard_normal((20, 5)).astype(np.float32)
    with pytest.raises(ValueError, match="perplexity"):
        tsne.run(x, tsne.TSNEConfig(perplexity=30.0))
    with pytest.raises(ValueError, match="expected"):
        tsne.run(x.ravel())


def test_tsne_f32_f64_entry_points():
    x, _ = make_clusters(n_per=20, n_clusters=2)
    cfg = tsne.TSNEConfig(perplexity=8.0, epochs=50)
    y32 = np.asarray(tsne.run_f32(x, cfg))
    assert y32.dtype == np.float32
    y64 = np.asarray(tsne.run_f64(x.astype(np.float64), cfg))
    assert y64.dtype == np.float64


def test_tsne_deterministic():
    x, _ = make_clusters(n_per=15, n_clusters=2)
    cfg = tsne.TSNEConfig(perplexity=6.0, epochs=30)
    y1 = np.asarray(tsne.run(x, cfg))
    y2 = np.asarray(tsne.run(x, cfg))
    np.testing.assert_array_equal(y1, y2)


def test_knn_grad_matches_dense_reference():
    """The blocked sparse-attraction gradient equals a direct dense numpy
    evaluation of the same formula (attraction over stored P entries,
    EXACT repulsion over all pairs) — including at a block size that does
    not divide n."""

    from single_algebra_tpu.models.tsne import _knn_grad, _symmetrize_knn

    rng = np.random.default_rng(0)
    n, k, dim = 57, 9, 2
    # a fake conditional-P and neighbor structure
    idx = np.stack([
        rng.choice(np.delete(np.arange(n), i), size=k, replace=False)
        for i in range(n)
    ]).astype(np.int32)
    p_cond = rng.random((n, k))
    p_cond /= p_cond.sum(1, keepdims=True)
    src, dst, val = _symmetrize_knn(p_cond, idx, n)

    y = rng.standard_normal((n, dim)).astype(np.float64)
    g = np.asarray(_knn_grad(
        np.asarray(y), np.asarray(src), np.asarray(dst), np.asarray(val),
        np.float64(3.0), block=16,
    ))

    # dense reference
    P = np.zeros((n, n))
    for i in range(n):
        P[i, idx[i]] = p_cond[i]
    P = (P + P.T) / (2 * n)
    d2 = ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    num = 1.0 / (1.0 + d2)
    np.fill_diagonal(num, 0.0)
    Z = num.sum()
    ref = np.zeros((n, dim))
    for i in range(n):
        ref[i] = 4 * (
            (3.0 * P[i] * num[i])[:, None] * (y[i] - y)
            - ((num[i] ** 2 / Z)[:, None] * (y[i] - y))
        ).sum(0)
    np.testing.assert_allclose(g, ref, rtol=1e-8, atol=1e-12)


def test_tsne_knn_mode_separates_clusters():
    x, labels = make_clusters(n_per=60, n_clusters=3)
    cfg = tsne.TSNEConfig(
        output_dim=2, perplexity=15.0, epochs=400, mode="knn",
    )
    y = np.asarray(tsne.run(x, cfg))
    assert y.shape == (x.shape[0], 2)
    assert np.isfinite(y).all()
    intra, inter = [], []
    for i in range(0, len(y), 7):
        for j in range(i + 1, len(y), 11):
            d = np.linalg.norm(y[i] - y[j])
            (intra if labels[i] == labels[j] else inter).append(d)
    assert np.median(intra) < 0.5 * np.median(inter)


def test_tsne_mode_auto_and_validation():
    x, _ = make_clusters(n_per=40, n_clusters=2)
    # auto at small n is the exact path: identical output
    y_auto = np.asarray(tsne.run(x, tsne.TSNEConfig(
        perplexity=10.0, epochs=30, mode="auto")))
    y_exact = np.asarray(tsne.run(x, tsne.TSNEConfig(
        perplexity=10.0, epochs=30, mode="exact")))
    np.testing.assert_array_equal(y_auto, y_exact)
    # auto above the threshold routes to knn (tiny threshold to avoid a
    # large-n run in the suite)
    y_knn = np.asarray(tsne.run(x, tsne.TSNEConfig(
        perplexity=10.0, epochs=30, mode="auto", exact_max_n=16)))
    assert y_knn.shape == y_exact.shape and np.isfinite(y_knn).all()
    with pytest.raises(ValueError, match="mode"):
        tsne.run(x, tsne.TSNEConfig(perplexity=10.0, mode="bogus"))
    with pytest.raises(ValueError, match="knn_k"):
        tsne.run(x, tsne.TSNEConfig(
            perplexity=20.0, mode="knn", knn_k=10))


def test_symmetrize_knn_padding_keeps_src_sorted():
    """The attraction segment_sum declares indices_are_sorted=True, so the
    edge-list padding must not break monotonicity (pad src with n-1, not
    0 — a trailing 0 after CSR row order violates the contract and XLA's
    sorted-scatter behavior becomes implementation-defined)."""

    from single_algebra_tpu.models.tsne import _symmetrize_knn

    rng = np.random.default_rng(0)
    n, k = 40, 5
    idx = np.stack([
        rng.choice(np.delete(np.arange(n), i), size=k, replace=False)
        for i in range(n)
    ]).astype(np.int32)
    p = rng.random((n, k)); p /= p.sum(1, keepdims=True)
    src, dst, val = _symmetrize_knn(p, idx, n)
    assert len(src) % 4096 == 0 and len(src) > n * k  # padded
    assert (np.diff(src) >= 0).all(), "src must stay sorted through padding"
    assert val[(src == n - 1) & (dst == 0)].sum() >= 0  # padding inert


def test_tsne_knn_mode_f64():
    """run_f64 + mode='knn' keeps the f64 dtype through the edge-list
    attraction and the blocked repulsion (needs x64 — the conftest mesh
    enables it)."""

    x, _ = make_clusters(n_per=50, n_clusters=2)
    cfg = tsne.TSNEConfig(perplexity=10.0, epochs=40, mode="knn")
    y = np.asarray(tsne.run_f64(x.astype(np.float64), cfg))
    assert y.dtype == np.float64 and np.isfinite(y).all()


@pytest.mark.parametrize("ndev", [1, 8])
def test_knn_mode_mesh_matches_local(ndev):
    from single_algebra_tpu.parallel import make_mesh
    from single_algebra_tpu.models import tsne

    rng = np.random.default_rng(31)
    X = np.concatenate(
        [rng.normal(c * 12, 1.0, size=(70, 6)) for c in range(3)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), 70)
    cfg = tsne.TSNEConfig(
        mode="knn", perplexity=12.0, epochs=300,
        exaggeration_epochs=40, dispatch_chunk=75,
    )
    y_local = np.asarray(tsne.run(X, cfg))
    y_mesh = np.asarray(tsne.run(X, cfg, mesh=make_mesh(ndev)))
    assert y_mesh.shape == y_local.shape
    assert np.isfinite(y_mesh).all()

    def separation(y):
        cents = np.stack([y[labels == c].mean(0) for c in range(3)])
        within = np.mean(
            [np.linalg.norm(y[labels == c] - cents[c], axis=1).mean()
             for c in range(3)]
        )
        d = np.linalg.norm(cents[:, None] - cents[None, :], axis=-1)
        return d[np.triu_indices(3, 1)].min() / max(within, 1e-9)

    assert separation(y_mesh) > 3.0
    # short runs agree before f32 drift compounds
    cfg5 = tsne.TSNEConfig(mode="knn", perplexity=12.0, epochs=5,
                           exaggeration_epochs=40, dispatch_chunk=30)
    np.testing.assert_allclose(
        np.asarray(tsne.run(X, cfg5)),
        np.asarray(tsne.run(X, cfg5, mesh=make_mesh(ndev))),
        rtol=5e-3, atol=1e-5,
    )
