"""scale / regress_out vs numpy ground truth."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.preprocess import scale, regress_out


def _mat(n=200, p=60, seed=0, zero_var_col=True):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=0.3, format="csr", dtype=np.float32,
        random_state=rng, data_rvs=rng.random,
    ).toarray()
    if zero_var_col:
        X[:, 7] = 0.0  # zero-variance column
        X[:, 11] = 3.0  # constant nonzero column (zero variance too)
    return X


def _ref_scale(X, zero_center=True, max_value=None):
    mean = X.mean(0)
    std = X.std(0, ddof=1)
    std = np.where(std > 0, std, 1.0)
    out = (X - mean) / std if zero_center else X / std
    if max_value is not None:
        out = np.minimum(out, max_value)
    return out


@pytest.mark.parametrize("fmt", ["csr", "csc"])
def test_scale_sparse_zero_centered(fmt):
    X = _mat()
    m = SparseMatrix.from_scipy(sp.csr_matrix(X).asformat(fmt))
    out = np.asarray(scale(m))
    np.testing.assert_allclose(out, _ref_scale(X), rtol=1e-4, atol=1e-5)
    # unit variance where defined, zero-var columns untouched-but-centered
    np.testing.assert_allclose(out.std(0, ddof=1)[np.arange(60) != 7][
        np.arange(59) != 10], 1.0, rtol=1e-4)


def test_scale_dense_input_and_clip():
    X = _mat(seed=1)
    out = np.asarray(scale(X, max_value=1.5))
    ref = _ref_scale(X, max_value=1.5)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    assert out.max() <= 1.5 + 1e-6


@pytest.mark.parametrize("fmt", ["csr", "csc"])
def test_scale_no_center_preserves_sparsity(fmt):
    X = _mat(seed=2)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X).asformat(fmt))
    out = scale(m, zero_center=False, max_value=4.0)
    assert isinstance(out, SparseMatrix)
    assert out.nnz == m.nnz
    np.testing.assert_allclose(
        out.to_dense(), np.minimum(_ref_scale(X, zero_center=False), 4.0),
        rtol=1e-4, atol=1e-6,
    )


def test_scale_dense_no_center():
    X = _mat(seed=3)
    out = np.asarray(scale(X, zero_center=False))
    np.testing.assert_allclose(
        out, _ref_scale(X, zero_center=False), rtol=1e-4, atol=1e-6
    )


def test_regress_out_matches_lstsq():
    rng = np.random.default_rng(4)
    X = _mat(seed=4, zero_var_col=False)
    n = X.shape[0]
    cov = np.stack([X.sum(1), rng.normal(0, 1, n)], axis=1).astype(np.float32)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    out = np.asarray(regress_out(m, cov))
    C = np.concatenate([np.ones((n, 1)), cov], axis=1)
    beta, *_ = np.linalg.lstsq(C, X, rcond=None)
    ref = X - C @ beta
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)
    # residuals orthogonal to covariates, zero mean
    assert np.abs(C.T @ out).max() < 2e-2
    assert np.abs(out.mean(0)).max() < 1e-4


def test_regress_out_1d_covariate_and_dense_input():
    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, (100, 20)).astype(np.float32)
    cov = rng.normal(0, 1, 100).astype(np.float32)
    out = np.asarray(regress_out(X, cov))
    C = np.stack([np.ones(100), cov], axis=1)
    beta, *_ = np.linalg.lstsq(C, X, rcond=None)
    np.testing.assert_allclose(out, X - C @ beta, rtol=1e-3, atol=2e-4)


def test_regress_out_validation():
    X = _mat(seed=6)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    with pytest.raises(ValueError, match="covariates rows"):
        regress_out(m, np.ones(X.shape[0] - 1))


def test_scale_then_pca_pipeline():
    """scale output feeds PCA directly (the scanpy HVG->scale->pca chain)."""

    from single_algebra_tpu.models import SparsePCABuilder

    X = _mat(seed=7, zero_var_col=False)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    Z = np.asarray(scale(m, max_value=10.0))
    # dense PCA on the scaled matrix vs sklearn on the same input
    from sklearn.decomposition import PCA

    ref = PCA(n_components=5, svd_solver="full").fit(Z)
    pca = (
        SparsePCABuilder()
        .n_components(5)
        .center(True)
        .verbose(False)
        .build()
    )
    pca.fit(SparseMatrix.from_scipy(sp.csr_matrix(Z)))
    np.testing.assert_allclose(
        np.asarray(pca.explained_variance_),
        ref.explained_variance_,
        rtol=1e-3,
    )


def test_subsample():
    from single_algebra_tpu.preprocess import subsample

    X = _mat(seed=8, zero_var_col=False)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    sub, idx = subsample(m, n_obs=50, seed=0)
    assert sub.shape == (50, X.shape[1])
    np.testing.assert_array_equal(sub.to_dense(), X[idx])
    sub2, idx2 = subsample(m, fraction=0.25, seed=1)
    assert sub2.shape[0] == 50
    with pytest.raises(ValueError, match="exactly one"):
        subsample(m)
    with pytest.raises(ValueError, match="exactly one"):
        subsample(m, fraction=0.5, n_obs=10)
    with pytest.raises(ValueError, match="fraction"):
        subsample(m, fraction=1.5)


def test_downsample_counts():
    from single_algebra_tpu.preprocess import downsample_counts

    rng = np.random.default_rng(9)
    X = sp.random(
        100, 40, density=0.3, format="csr", dtype=np.float32,
        random_state=rng,
        data_rvs=lambda s: rng.integers(1, 20, s).astype(np.float32),
    )
    m = SparseMatrix.from_scipy(X)
    target = 30
    out = downsample_counts(m, target, seed=0)
    sums = np.asarray(out.sum_row())
    before = np.asarray(X.sum(axis=1)).ravel()
    # every cell capped at the target, exactly
    np.testing.assert_array_equal(
        sums, np.minimum(before, target)
    )
    # downsampled entries never exceed the originals
    assert (out.to_dense() <= X.toarray() + 1e-6).all()
    # non-integer data rejected
    bad = X.copy(); bad.data[0] = 1.5
    with pytest.raises(ValueError, match="integer count"):
        downsample_counts(SparseMatrix.from_scipy(bad), 10)


def test_recipe_zheng17():
    from single_algebra_tpu.recipes import recipe_zheng17

    rng = np.random.default_rng(10)
    n, p = 300, 500
    counts = sp.random(
        n, p, density=0.2, format="csr", dtype=np.float32,
        random_state=rng,
        data_rvs=lambda s: rng.integers(1, 30, s).astype(np.float32),
    ).toarray()
    counts[:, 13] = 0.0  # dead gene: must be dropped in step 1
    m = SparseMatrix.from_scipy(sp.csr_matrix(counts))
    Z, info = recipe_zheng17(m, n_top_genes=100)
    Z = np.asarray(Z)
    assert Z.shape == (n, 100)
    assert info["gene_mask"].sum() == 100
    assert not info["gene_mask"][13]
    # scaled: unit variance, clipped
    sd = Z.std(0, ddof=1)
    np.testing.assert_allclose(sd[sd > 0], 1.0, rtol=1e-3)
    assert Z.max() <= 10.0 + 1e-5
    # reproduce by hand from the returned masks
    kept = counts[:, info["counts_mask"]]
    sums = kept.sum(1)
    t1 = np.median(sums[sums > 0])
    norm = kept * (t1 / np.where(sums > 0, sums, 1))[:, None]
    hvg_cols = info["hvg"].mask
    sub = norm[:, hvg_cols]
    s2 = sub.sum(1)
    t2 = np.median(s2[s2 > 0])
    sub = sub * (t2 / np.where(s2 > 0, s2, 1))[:, None]
    sub = np.log1p(sub)
    mean, std = sub.mean(0), sub.std(0, ddof=1)
    ref = np.minimum((sub - mean) / np.where(std > 0, std, 1), 10.0)
    np.testing.assert_allclose(Z, ref, rtol=2e-3, atol=2e-3)


def test_normalize_total_median_default():
    from single_algebra_tpu.preprocess import normalize_total

    X = _mat(seed=11, zero_var_col=False)
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    out, sf = normalize_total(m)
    sums = X.sum(1)
    target = np.median(sums[sums > 0])
    ref = X * (target / np.where(sums > 0, sums, 1))[:, None]
    np.testing.assert_allclose(out.to_dense(), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sf, sums / target, rtol=1e-6)


def test_normalize_total_exclude_highly_expressed():
    from single_algebra_tpu.preprocess import normalize_total

    rng = np.random.default_rng(12)
    X = _mat(seed=12, zero_var_col=False)
    X[:, 0] = X.sum(1)  # gene 0 dominates every cell
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    out, sf = normalize_total(
        m, target_sum=100.0, exclude_highly_expressed=True,
        max_fraction=0.2,
    )
    # size factors computed without the dominant gene
    shares = X / X.sum(1, keepdims=True)
    excluded = shares.max(0) > 0.2
    assert excluded[0]
    sums_ex = X[:, ~excluded].sum(1)
    np.testing.assert_allclose(sf, sums_ex / 100.0, rtol=1e-4)
    # the gene itself is still present in the output
    assert np.asarray(out.to_dense())[:, 0].max() > 0


def test_aggregate_matches_numpy_groupby():
    from single_algebra_tpu.preprocess import aggregate

    X = _mat(seed=13, zero_var_col=False)
    rng = np.random.default_rng(13)
    labels = rng.choice(["u", "v", "w"], X.shape[0])
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    agg = aggregate(
        m, labels.tolist(),
        funcs=("mean", "sum", "var", "frac_nonzero", "count_nonzero"),
    )
    for gi, g in enumerate(agg["groups"]):
        sel = X[labels == g]
        np.testing.assert_allclose(agg["sum"][gi], sel.sum(0), rtol=1e-4)
        np.testing.assert_allclose(agg["mean"][gi], sel.mean(0), rtol=1e-4)
        np.testing.assert_allclose(
            agg["var"][gi], sel.var(0, ddof=1), rtol=1e-3, atol=1e-6
        )
        np.testing.assert_allclose(
            agg["frac_nonzero"][gi], (sel > 0).mean(0), rtol=1e-6
        )
        np.testing.assert_allclose(
            agg["count_nonzero"][gi], (sel > 0).sum(0), rtol=1e-6
        )
    with pytest.raises(ValueError, match="Unknown aggregate"):
        aggregate(m, labels.tolist(), funcs=("median",))


def test_recipe_seurat():
    from single_algebra_tpu.recipes import recipe_seurat

    rng = np.random.default_rng(14)
    # realistic shape: the Seurat cutoff box expects per-gene de-logged
    # means around 1e4/p, i.e. inside [0.0125, 3] only when p is large
    n, p = 400, 5000
    counts = sp.random(
        n, p, density=0.04, format="csr", dtype=np.float32,
        random_state=rng,
        data_rvs=lambda s: (rng.pareto(2.0, s) * 2 + 1).astype(np.float32).round(),
    ).toarray()
    counts[:5] = 0.0  # empty cells: dropped by min_genes
    counts[:, 13] = 0.0  # dead gene: dropped by min_cells
    m = SparseMatrix.from_scipy(sp.csr_matrix(counts))
    Z, info = recipe_seurat(m, min_genes=10, min_cells=3)
    Z = np.asarray(Z)
    assert not info["cell_mask"][:5].any()
    assert not info["gene_mask"][13]
    n_kept = info["cell_mask"].sum()
    assert Z.shape == (n_kept, info["gene_mask"].sum())
    assert info["hvg"].n_selected == Z.shape[1] > 0
    # scaled: unit variance (clipped columns legitimately fall below 1),
    # upper clip respected
    sd = Z.std(0, ddof=1)
    assert (sd <= 1.0 + 1e-3).all()
    assert np.median(sd[sd > 0]) == pytest.approx(1.0, rel=1e-3)
    assert Z.max() <= 10.0 + 1e-5
    # reproduce by hand
    kept = counts[info["cell_mask"]][:, info["counts_mask"]]
    sums = kept.sum(1)
    normed = np.log1p(kept * (1e4 / np.where(sums > 0, sums, 1))[:, None])
    sub = normed[:, info["hvg"].mask]
    mean, std = sub.mean(0), sub.std(0, ddof=1)
    ref = np.minimum((sub - mean) / np.where(std > 0, std, 1), 10.0)
    np.testing.assert_allclose(Z, ref, rtol=2e-3, atol=2e-3)
