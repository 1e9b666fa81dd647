"""Clustering-metric tests: sklearn golden parity for silhouette / ARI /
NMI, blocked == unblocked, degenerate guards."""

import numpy as np
import pytest

from single_algebra_tpu.metrics import (
    adjusted_rand_index,
    normalized_mutual_info,
    silhouette_samples,
    silhouette_score,
)


def blobs(n=500, d=8, k=4, spread=0.8, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * 3.0
    labels = rng.integers(0, k, n)
    X = centers[labels] + rng.standard_normal((n, d)) * spread
    return X.astype(np.float32), labels


def test_silhouette_matches_sklearn():
    from sklearn.metrics import silhouette_score as sk_score

    X, lab = blobs()
    ours = silhouette_score(X, lab)
    theirs = sk_score(X, lab)
    assert ours == pytest.approx(theirs, abs=2e-4)


def test_silhouette_samples_match_sklearn():
    from sklearn.metrics import silhouette_samples as sk_samples

    X, lab = blobs(n=300, d=5, k=3, seed=2)
    ours = np.asarray(silhouette_samples(X, lab))
    theirs = sk_samples(X, lab)
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_silhouette_blocked_equals_unblocked():
    X, lab = blobs(n=333, seed=3)  # n not divisible by block
    a = np.asarray(silhouette_samples(X, lab, block=64))
    b = np.asarray(silhouette_samples(X, lab, block=512))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_silhouette_noncontiguous_labels():
    # labels {7, 42}: internal reindexing must handle arbitrary values
    X, lab = blobs(n=100, k=2, seed=4)
    relabeled = np.where(lab == 0, 7, 42)
    assert silhouette_score(X, relabeled) == pytest.approx(
        silhouette_score(X, lab), abs=1e-6
    )


def test_silhouette_separation_orders_quality():
    X, lab = blobs(n=200, spread=0.2, seed=5)
    rng = np.random.default_rng(0)
    shuffled = rng.permutation(lab)
    assert silhouette_score(X, lab) > 0.7
    assert silhouette_score(X, lab) > silhouette_score(X, shuffled)


def test_silhouette_guards():
    X, _ = blobs(n=50)
    with pytest.raises(ValueError, match="at least 2"):
        silhouette_score(X, np.zeros(50, np.int32))
    with pytest.raises(ValueError, match="n_samples > n_clusters"):
        silhouette_score(X[:3], np.arange(3))


def test_ari_matches_sklearn():
    from sklearn.metrics import adjusted_rand_score

    rng = np.random.default_rng(6)
    a = rng.integers(0, 5, 400)
    b = np.where(rng.random(400) < 0.8, a, rng.integers(0, 5, 400))
    assert adjusted_rand_index(a, b) == pytest.approx(
        adjusted_rand_score(a, b), abs=1e-12
    )
    assert adjusted_rand_index(a, a) == 1.0


def test_nmi_matches_sklearn():
    from sklearn.metrics import normalized_mutual_info_score

    rng = np.random.default_rng(7)
    a = rng.integers(0, 4, 300)
    b = np.where(rng.random(300) < 0.7, a, rng.integers(0, 4, 300))
    assert normalized_mutual_info(a, b) == pytest.approx(
        normalized_mutual_info_score(a, b), abs=1e-10
    )
    assert normalized_mutual_info(a, a) == pytest.approx(1.0)


def test_label_length_mismatch():
    with pytest.raises(ValueError, match="same length"):
        adjusted_rand_index(np.zeros(5), np.zeros(6))
    with pytest.raises(ValueError, match="same length"):
        normalized_mutual_info(np.zeros(5), np.zeros(6))


# ---------------------------------------------------------------------------
# graph autocorrelation
# ---------------------------------------------------------------------------


def _knn_w(X, k=8):
    from single_algebra_tpu import neighbors

    return neighbors.connectivities(np.asarray(X, np.float32), k)


def test_morans_gearys_match_dense_definition():
    import scipy.sparse as sp
    from single_algebra_tpu.metrics import gearys_c, morans_i

    rng = np.random.default_rng(0)
    n = 150
    X = rng.normal(0, 1, (n, 2)).astype(np.float32)
    W = _knn_w(X)
    vals = rng.normal(0, 1, (n, 5))
    got_i = morans_i(W, vals, block=2)
    got_c = gearys_c(W, vals, block=2)
    Wd = W.toarray()
    w_sum = Wd.sum()
    for j in range(5):
        x = vals[:, j] - vals[:, j].mean()
        I = (n / w_sum) * (x @ Wd @ x) / (x @ x)
        num_c = sum(
            Wd[a, b] * (x[a] - x[b]) ** 2
            for a, b in zip(*np.nonzero(Wd))
        )
        C = ((n - 1) / (2 * w_sum)) * num_c / (x @ x)
        np.testing.assert_allclose(got_i[j], I, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_c[j], C, rtol=1e-4, atol=1e-5)


def test_autocorr_detects_structure():
    from single_algebra_tpu.metrics import gearys_c, morans_i

    rng = np.random.default_rng(1)
    n = 300
    # 1-d gradient embedding: coordinate = strong autocorrelation
    t = np.sort(rng.random(n))
    X = np.stack([t * 10, np.zeros(n)], 1).astype(np.float32)
    W = _knn_w(X)
    smooth = t + rng.normal(0, 0.01, n)
    noise = rng.normal(0, 1, n)
    i_s, i_n = morans_i(W, smooth), morans_i(W, noise)
    c_s, c_n = gearys_c(W, smooth), gearys_c(W, noise)
    assert i_s > 0.9 and abs(i_n) < 0.3
    assert c_s < 0.1 and c_n > 0.7
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="values rows"):
        morans_i(W, np.ones(5))


def test_embedding_density():
    from single_algebra_tpu.metrics import embedding_density

    rng = np.random.default_rng(2)
    # dense core + sparse halo: core cells must score higher
    core = rng.normal(0, 0.3, (150, 2))
    halo = rng.normal(0, 4.0, (50, 2))
    Y = np.concatenate([core, halo]).astype(np.float32)
    d = embedding_density(Y, block=64)
    assert d.shape == (200,)
    assert 0.0 <= d.min() and d.max() <= 1.0
    assert d[:150].mean() > d[150:].mean() + 0.2
    # per-group scaling: each group hits [0, 1]
    groups = np.repeat(["a", "b"], 100)
    dg = embedding_density(Y, groups=groups)
    for g in ("a", "b"):
        sel = dg[groups == g]
        assert sel.min() == 0.0 and sel.max() == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="groups length"):
        embedding_density(Y, groups=np.ones(3))


@pytest.mark.parametrize("ndev", [1, 8])
def test_silhouette_mesh_matches_local(ndev):
    from single_algebra_tpu.metrics import silhouette_samples
    from single_algebra_tpu.parallel import make_mesh

    rng = np.random.default_rng(51)
    X = np.concatenate(
        [rng.normal(c * 4, 1.0, size=(67, 5)) for c in range(3)]
    ).astype(np.float32)  # n=201, non-round
    labels = np.repeat(np.arange(3), 67)
    s_local = np.asarray(silhouette_samples(X, labels))
    s_mesh = np.asarray(
        silhouette_samples(X, labels, mesh=make_mesh(ndev))
    )
    np.testing.assert_allclose(s_mesh, s_local, rtol=1e-4, atol=1e-5)
