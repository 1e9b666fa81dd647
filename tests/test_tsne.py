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
