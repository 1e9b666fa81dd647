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


# ---------------------------------------------------------------------------
# flavor='seurat_v3'
# ---------------------------------------------------------------------------


def test_loess_reproduces_polynomials_exactly():
    """Degree-2 local WLS is exact on any quadratic regardless of the
    weights — a weight-independent correctness check of the solver."""

    from single_algebra_tpu.feature_selection import _loess_fit

    rng = np.random.default_rng(0)
    x = rng.uniform(-3.0, 5.0, 400)
    for coef in [(2.0, 0.0, 0.0), (1.0, -2.0, 0.0), (0.5, 1.5, -0.75)]:
        y = coef[0] + coef[1] * x + coef[2] * x * x
        fit = _loess_fit(x, y, frac=0.3, degree=2)
        np.testing.assert_allclose(fit, y, rtol=0, atol=1e-8)


def test_loess_smooths_noise_toward_trend():
    from single_algebra_tpu.feature_selection import _loess_fit

    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0.0, 10.0, 600))
    trend = np.sin(x / 2.0)
    y = trend + rng.normal(0, 0.3, x.size)
    fit = _loess_fit(x, y, frac=0.3, degree=2)
    # the fit tracks the trend far better than the raw noise does
    interior = (x > 1.0) & (x < 9.0)
    err_fit = np.abs(fit - trend)[interior].mean()
    err_raw = np.abs(y - trend)[interior].mean()
    assert err_fit < 0.4 * err_raw


def test_loess_handles_ties_and_tiny_inputs():
    from single_algebra_tpu.feature_selection import _loess_fit

    # all-identical x: uniform weights, fit = mean-ish (no NaNs)
    fit = _loess_fit(np.zeros(10), np.arange(10.0))
    assert np.isfinite(fit).all()
    assert _loess_fit(np.empty(0), np.empty(0)).size == 0
    f1 = _loess_fit(np.array([1.0]), np.array([7.0]))
    np.testing.assert_allclose(f1, [7.0], atol=1e-9)


def _seurat_v3_dense_reference(X, loess_fit):
    """scanpy _highly_variable_genes_seurat_v3 formula on dense numpy,
    sharing only the loess fit (tested independently above)."""

    n = X.shape[0]
    mean = X.mean(axis=0)
    var = X.var(axis=0, ddof=1)
    not_const = (var > 0) & (mean > 0)
    est = np.zeros(X.shape[1])
    est[not_const] = loess_fit(
        np.log10(mean[not_const]), np.log10(var[not_const])
    )
    reg_std = np.sqrt(10.0 ** est)
    clip_val = mean + reg_std * np.sqrt(n)
    Xc = np.minimum(X, clip_val[None, :])
    s1 = Xc.sum(axis=0)
    s2 = (Xc * Xc).sum(axis=0)
    norm_var = np.where(
        not_const,
        (n * mean ** 2 + s2 - 2.0 * s1 * mean)
        / ((n - 1) * reg_std ** 2),
        0.0,
    )
    return norm_var


def test_seurat_v3_matches_dense_reference():
    from single_algebra_tpu.feature_selection import (
        _loess_fit,
        _seurat_v3_norm_var,
    )

    X, _ = planted_hvg_counts(n=500, p=300, seed=3)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    _, _, norm_var = _seurat_v3_norm_var(m)
    ref = _seurat_v3_dense_reference(X, _loess_fit)
    np.testing.assert_allclose(norm_var, ref, rtol=1e-4, atol=1e-6)


def test_seurat_v3_recovers_planted_hvgs():
    X, hvg = planted_hvg_counts(seed=5)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    res = highly_variable_genes(m, n_top_genes=40, flavor="seurat_v3")
    assert res.n_selected == 40
    found = np.flatnonzero(res.mask)
    overlap = len(np.intersect1d(found, hvg)) / len(hvg)
    assert overlap >= 0.85
    # raw variance reported in dispersions, normalized score in _norm
    assert (res.dispersions >= 0).all()
    assert np.isfinite(res.dispersions_norm).all()


def test_seurat_v3_batch_rule_votes_and_ordering():
    """scanpy's rank-median combination: genes ranked by every batch come
    before any single-batch gene, and a one-batch artifact records
    exactly one vote. (A strong artifact CAN still make the cut — it
    occupies a top slot in its own batch, capping the double-voted count
    below n_top_genes; scanpy behaves identically — so the test asserts
    the rule's invariants, not artifact exclusion.)"""

    X, hvg = planted_hvg_counts(n=600, p=400, n_hvg=20, seed=7)
    batches = np.arange(600) % 2
    artifact = [g for g in range(400) if g not in set(hvg)][0]
    Xa = X.copy()
    rows = np.where(batches == 1)[0]
    on = np.random.default_rng(8).random(rows.size) < 0.05
    Xa[rows, artifact] = np.where(on, 40.0, 0.0)
    m = SparseMatrix.from_scipy(sp.csr_matrix(Xa))
    res_batch = highly_variable_genes(
        m, n_top_genes=15, flavor="seurat_v3", batches=batches
    )
    votes = res_batch.n_batches_selected
    assert votes is not None
    assert votes[artifact] == 1  # variable in its own batch only
    # every double-voted gene outranks every single-voted one: with
    # (votes==2).sum() < n_top, ALL of them are selected, and all
    # double-voted genes are planted HVGs (the artifact never double-votes)
    sel = np.flatnonzero(res_batch.mask)
    both = np.flatnonzero(votes == 2)
    assert 0 < both.size <= 15
    assert np.isin(both, sel).all()
    assert np.isin(both, hvg).all()
    # selection is dominated by the planted genes
    assert len(np.intersect1d(sel, hvg)) >= 12


def test_seurat_v3_validation():
    X, _ = planted_hvg_counts(n=100, p=50, n_hvg=5, seed=9)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    with pytest.raises(ValueError, match="requires n_top_genes"):
        highly_variable_genes(m, flavor="seurat_v3")
    with pytest.raises(ValueError, match="out of range"):
        highly_variable_genes(m, n_top_genes=99, flavor="seurat_v3")
    with pytest.raises(ValueError, match="RAW counts"):
        highly_variable_genes(
            m, n_top_genes=10, flavor="seurat_v3", assume_logged=True
        )
    with pytest.raises(ValueError, match="Unknown flavor"):
        highly_variable_genes(m, n_top_genes=10, flavor="seurat_v2")
