"""Integration-quality metrics (metrics.lisi / silhouette_batch / kbet):
behavior at the mixing extremes, numpy cross-checks of the aggregation
algebra, and validation errors."""

import numpy as np
import pytest

from single_algebra_tpu.metrics import kbet, lisi, silhouette_batch


def _two_batches(mixed: bool, n=400, d=8, seed=0):
    """Embedding with two batches either perfectly mixed in one blob or
    placed in two far-apart blobs."""

    rng = np.random.default_rng(seed)
    batch = np.array(["a", "b"])[rng.integers(0, 2, n)]
    X = rng.normal(0, 1.0, size=(n, d)).astype(np.float32)
    if not mixed:
        X[batch == "b"] += 50.0
    return X, batch


def test_ilisi_extremes():
    X, batch = _two_batches(mixed=True)
    well = lisi(X, batch, perplexity=20)
    assert well.shape == (400,)
    assert well.mean() > 1.8  # ~2 when 2 batches mix perfectly

    X2, batch2 = _two_batches(mixed=False, seed=1)
    poor = lisi(X2, batch2, perplexity=20)
    assert poor.mean() < 1.1  # ~1 when neighborhoods are single-batch


def test_clisi_preserved_types():
    rng = np.random.default_rng(2)
    X = np.concatenate(
        [rng.normal(c * 30, 1.0, size=(120, 6)) for c in range(3)]
    ).astype(np.float32)
    types = np.repeat(np.arange(3), 120)
    c = lisi(X, types, perplexity=15)
    assert c.mean() < 1.05  # types stay pure -> cLISI ~ 1 (good)


def test_lisi_uniform_three_labels():
    # three labels assigned at random in one blob -> LISI ~ 3
    rng = np.random.default_rng(3)
    X = rng.normal(size=(600, 5)).astype(np.float32)
    labels = rng.integers(0, 3, 600)
    val = lisi(X, labels, perplexity=30)
    assert 2.6 < val.mean() <= 3.0 + 1e-6


def test_lisi_validation():
    X = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="labels length"):
        lisi(X, np.zeros(10))
    with pytest.raises(ValueError, match="perplexity"):
        lisi(X, np.zeros(50), perplexity=60)


def test_silhouette_batch_extremes():
    X, batch = _two_batches(mixed=True, seed=4)
    group = np.repeat(["t1", "t2"], 200)
    good = silhouette_batch(X, batch, group)
    assert good > 0.85

    X2, batch2 = _two_batches(mixed=False, seed=5)
    bad = silhouette_batch(X2, batch2, group)
    assert bad < good - 0.3


def test_silhouette_batch_skips_single_batch_groups():
    rng = np.random.default_rng(6)
    X = rng.normal(size=(90, 4)).astype(np.float32)
    batch = np.array(["a"] * 30 + ["a", "b"] * 30)
    group = np.array(["only_a"] * 30 + ["mixed"] * 60)
    # 'only_a' contributes nothing; 'mixed' scores fine
    val = silhouette_batch(X, batch, group)
    assert 0.0 <= val <= 1.0
    with pytest.raises(ValueError, match="no group"):
        silhouette_batch(X[:30], batch[:30], group[:30])


def test_kbet_extremes():
    X, batch = _two_batches(mixed=True, seed=7, n=500)
    assert kbet(X, batch, k=30) > 0.85

    X2, batch2 = _two_batches(mixed=False, seed=8, n=500)
    assert kbet(X2, batch2, k=30) < 0.05


def test_kbet_chi2_matches_numpy():
    # cross-check the device one-hot neighborhood counts + chi2 stat
    from scipy.stats import chi2

    from single_algebra_tpu.neighbors import knn

    rng = np.random.default_rng(9)
    X = rng.normal(size=(120, 4)).astype(np.float32)
    batch = rng.integers(0, 3, 120)
    k = 15
    idx = np.asarray(knn(X, k, return_distances=False))
    counts = np.stack(
        [(batch[idx] == b).sum(axis=1) for b in range(3)], axis=1
    ).astype(np.float64)
    expected = np.bincount(batch, minlength=3) / 120 * k
    stat = ((counts - expected) ** 2 / expected).sum(axis=1)
    want = float(np.mean(chi2.sf(stat, df=2) > 0.05))
    got = kbet(X, batch, k=k)
    assert abs(got - want) < 1e-9


def test_kbet_validation():
    X = np.zeros((20, 3), np.float32)
    with pytest.raises(ValueError, match="2 batches"):
        kbet(X, np.zeros(20))
    with pytest.raises(ValueError, match="batch length"):
        kbet(X, np.zeros(5))
