"""HVG selection tests: planted-dispersion recovery in both flavors,
batch-aware combination, cutoff-box mode, mask integration with
MaskedSparsePCA, and input validation."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix, highly_variable_genes
from single_algebra_tpu.models import MaskedSparsePCABuilder


def planted_hvg_counts(n=800, p=600, n_hvg=40, seed=0, on_p=0.08):
    """Counts where a known gene subset is overdispersed at MATCHED mean:
    background genes ~ Poisson(lam); HVG genes are bimodal on/off across
    cells with marginal means drawn from the same range as the background
    (so they spread across the mean-bins instead of clustering in one bin
    and z-scoring against each other) but ~1/on_p-fold higher dispersion."""

    rng = np.random.default_rng(seed)
    lam = rng.uniform(0.5, 2.0, size=p)
    X = rng.poisson(lam[None, :], size=(n, p)).astype(np.float64)
    hvg = rng.choice(p, size=n_hvg, replace=False)
    target_mean = rng.uniform(0.5, 2.0, size=n_hvg)
    on = rng.random((n, n_hvg)) < on_p
    X[:, hvg] = np.where(
        on, rng.poisson(target_mean[None, :] / on_p, size=(n, n_hvg)), 0.0
    )
    return X, np.sort(hvg)


def to_sparse_logged(X):
    return SparseMatrix.from_scipy(sp.csr_matrix(np.log1p(X)))


def test_seurat_recovers_planted_hvgs():
    X, hvg = planted_hvg_counts()
    m = to_sparse_logged(X)
    res = highly_variable_genes(m, n_top_genes=40)
    assert res.n_selected == 40
    found = np.flatnonzero(res.mask)
    overlap = len(np.intersect1d(found, hvg)) / len(hvg)
    assert overlap >= 0.85
    assert res.mask.shape == (X.shape[1],)
    assert res.means.shape == (X.shape[1],)
    assert np.isfinite(res.dispersions_norm).all()


def test_cell_ranger_flavor_on_raw_counts():
    X, hvg = planted_hvg_counts(seed=1)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    res = highly_variable_genes(m, n_top_genes=40, flavor="cell_ranger")
    found = np.flatnonzero(res.mask)
    overlap = len(np.intersect1d(found, hvg)) / len(hvg)
    assert overlap >= 0.95


def test_cutoff_box_mode():
    X, hvg = planted_hvg_counts(seed=2)
    m = to_sparse_logged(X)
    res = highly_variable_genes(m, min_disp=1.0)
    found = np.flatnonzero(res.mask)
    # the box should be dominated by planted genes
    assert len(found) > 0
    hits = len(np.intersect1d(found, hvg))
    assert hits / max(len(found), 1) >= 0.8


def test_batch_aware_matches_single_batch_on_homogeneous_data():
    X, hvg = planted_hvg_counts(seed=3)
    m = to_sparse_logged(X)
    single = highly_variable_genes(m, n_top_genes=40)
    batches = np.array(["a", "b"])[np.arange(X.shape[0]) % 2]
    combined = highly_variable_genes(m, n_top_genes=40, batches=batches)
    assert combined.n_selected == 40
    assert combined.n_batches_selected is not None
    assert combined.n_batches_selected.max() <= 2
    # homogeneous batches -> heavy agreement with the single-batch pick
    agree = (single.mask & combined.mask).sum() / 40
    assert agree >= 0.8


def test_mask_feeds_masked_pca():
    X, _ = planted_hvg_counts(n=400, p=150, n_hvg=20, seed=4)  # small/fast
    m = to_sparse_logged(X)
    res = highly_variable_genes(m, n_top_genes=20)
    pca = (
        MaskedSparsePCABuilder()
        .mask(res.mask)
        .n_components(5)
        .build()
    )
    T = np.asarray(pca.fit_transform(m))
    assert T.shape == (400, 5)
    assert np.isfinite(T).all()


def test_validation_errors():
    X, _ = planted_hvg_counts(n=50, p=40, n_hvg=5, seed=5)
    m = to_sparse_logged(X)
    with pytest.raises(ValueError, match="n_top_genes"):
        highly_variable_genes(m, n_top_genes=0)
    with pytest.raises(ValueError, match="n_top_genes"):
        highly_variable_genes(m, n_top_genes=m.ncols + 1)
    with pytest.raises(ValueError, match="flavor"):
        highly_variable_genes(m, flavor="nope")
    with pytest.raises(ValueError, match="n_bins"):
        highly_variable_genes(m, n_bins=0)


def test_constant_matrix_degenerate():
    # all-equal stored values: no gene should dominate, but nothing crashes
    X = np.zeros((30, 20))
    X[:, ::2] = 1.0
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    res = highly_variable_genes(m, n_top_genes=5, assume_logged=False)
    assert res.n_selected == 5
    assert np.isfinite(res.dispersions_norm).all()


def test_hvg_from_moments_matches_direct():
    """Moment-based selection == matrix-based selection (cell_ranger
    flavor: raw moments, no log transform in the moment computation)."""

    from single_algebra_tpu.feature_selection import (
        highly_variable_genes_from_moments,
    )

    X, _planted = planted_hvg_counts(n=800, p=400, seed=3)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    direct = highly_variable_genes(
        m, n_top_genes=50, flavor="cell_ranger", assume_logged=False
    )
    mean = X.mean(axis=0)
    var = X.var(axis=0, ddof=1)
    frommom = highly_variable_genes_from_moments(
        mean, var, n_top_genes=50, flavor="cell_ranger"
    )
    assert np.array_equal(direct.mask, frommom.mask)
    np.testing.assert_allclose(
        direct.dispersions_norm, frommom.dispersions_norm, atol=1e-4
    )


def test_hvg_from_moments_streaming_pipeline():
    """StreamingSparsePCA column moments feed HVG selection directly."""

    from single_algebra_tpu.feature_selection import (
        highly_variable_genes_from_moments,
    )
    from single_algebra_tpu.models import StreamingSparsePCA

    Xd, planted = planted_hvg_counts(n=600, p=300, n_hvg=30, seed=5)
    X = sp.csr_matrix(Xd)
    spca = StreamingSparsePCA(n_components=5, n_features=300, random_seed=0)
    for r0 in range(0, 600, 128):
        spca.partial_fit(X[r0:r0 + 128])
    res = highly_variable_genes_from_moments(
        np.asarray(spca.col_sums()) / 600.0,
        np.asarray(spca.col_var()),
        n_top_genes=40,
        flavor="cell_ranger",
    )
    assert res.n_selected == 40
    # most of the planted high-variance genes are recovered
    assert res.mask[planted].mean() > 0.7


def test_hvg_from_moments_validation():
    from single_algebra_tpu.feature_selection import (
        highly_variable_genes_from_moments,
    )

    with pytest.raises(ValueError, match="same length"):
        highly_variable_genes_from_moments(np.ones(5), np.ones(6))
    with pytest.raises(ValueError, match="out of range"):
        highly_variable_genes_from_moments(
            np.ones(5), np.ones(5), n_top_genes=9
        )
