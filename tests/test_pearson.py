"""Analytic Pearson residuals (Lause et al. 2021): the dense transform
(``preprocess.normalize_pearson_residuals``) and the tiled HVG flavor
(``highly_variable_genes(flavor='pearson_residuals')``), validated against
a straightforward numpy implementation of the published formula (scanpy
``experimental.pp`` semantics; scanpy itself is not in this image)."""

import numpy as np
import pytest

from single_algebra_tpu import SparseMatrix, highly_variable_genes
from single_algebra_tpu.feature_selection import _pearson_residual_variance
from single_algebra_tpu.preprocess import normalize_pearson_residuals

from conftest import cluster_counts, make_random_csr


def _np_residuals(X: np.ndarray, theta: float, clip=None) -> np.ndarray:
    """Reference implementation straight off the paper/scanpy formula."""

    X = np.asarray(X, np.float64)
    n = X.shape[0]
    if clip is None:
        clip = np.sqrt(n)
    t = X.sum(axis=1)
    g = X.sum(axis=0)
    total = X.sum()
    mu = np.outer(t, g) / (total if total > 0 else 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = np.sqrt(mu + mu * mu / theta)
        r = np.where(denom > 0, (X - mu) / np.where(denom > 0, denom, 1.0), 0.0)
    return np.clip(r, -clip, clip)


def _counts(n=300, p=120, seed=0, density=0.2):
    rng = np.random.default_rng(seed)
    X = rng.poisson(
        rng.gamma(0.6, 2.0, size=(n, p)) * (rng.random((n, p)) < density)
    ).astype(np.float64)
    return X


def test_normalize_pearson_residuals_matches_numpy():
    X = _counts()
    m = SparseMatrix.from_dense(X)
    got = np.asarray(normalize_pearson_residuals(m))
    want = _np_residuals(X, theta=100.0)
    assert got.shape == X.shape
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("theta", [10.0, 100.0, np.inf])
def test_residual_transform_theta(theta):
    X = _counts(n=150, p=60, seed=1)
    m = SparseMatrix.from_dense(X)
    got = np.asarray(normalize_pearson_residuals(m, theta=theta))
    np.testing.assert_allclose(
        got, _np_residuals(X, theta=theta), rtol=1e-10, atol=1e-10
    )


def test_residual_transform_explicit_clip():
    X = _counts(n=150, p=60, seed=2)
    m = SparseMatrix.from_dense(X)
    got = np.asarray(normalize_pearson_residuals(m, clip=1.5))
    want = _np_residuals(X, theta=100.0, clip=1.5)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    assert np.abs(got).max() <= 1.5 + 1e-12


def test_residuals_no_nan_on_empty_rows_and_cols():
    X = _counts(n=80, p=40, seed=3)
    X[7, :] = 0.0  # empty cell
    X[:, 11] = 0.0  # silent gene
    m = SparseMatrix.from_dense(X)
    got = np.asarray(normalize_pearson_residuals(m))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[7, :], 0.0)
    np.testing.assert_allclose(got[:, 11], 0.0)


@pytest.mark.parametrize("fmt", ["csr", "csc"])
@pytest.mark.parametrize("clip", [None, 2.0])
def test_tiled_residual_variance_matches_dense(fmt, clip):
    X = _counts(n=257, p=133, seed=4)  # deliberately non-round shapes
    m = SparseMatrix.from_dense(X, fmt=fmt)
    got = _pearson_residual_variance(
        m, 100.0, clip, gene_block=32, row_block=64
    )
    want = np.var(_np_residuals(X, 100.0, clip), axis=0)  # ddof=0 (scanpy)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_tiled_variance_handles_empty_rows():
    X = _counts(n=90, p=50, seed=5)
    X[3, :] = 0.0
    X[:, 9] = 0.0
    m = SparseMatrix.from_dense(X)
    got = _pearson_residual_variance(m, 100.0, None)
    want = np.var(_np_residuals(X, 100.0), axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    assert got[9] == 0.0


def test_hvg_pearson_flavor_selects_markers():
    # planted cluster structure: marker genes must out-rank flat noise
    X = np.asarray(
        cluster_counts(600, 200, n_clusters=4, seed=7, density=0.15).todense()
    )
    m = SparseMatrix.from_dense(X)
    res = highly_variable_genes(
        m, flavor="pearson_residuals", n_top_genes=40
    )
    assert res.n_selected == 40
    var = _pearson_residual_variance(m, 100.0, None)
    want = np.argsort(-var, kind="stable")[:40]
    assert set(np.where(res.mask)[0]) == set(want)
    # reported scores are the residual variances
    np.testing.assert_allclose(res.dispersions_norm, var, rtol=1e-12)


def test_hvg_pearson_requires_n_top_genes_and_raw_counts():
    m = SparseMatrix.from_dense(_counts(n=60, p=30))
    with pytest.raises(ValueError, match="requires n_top_genes"):
        highly_variable_genes(m, flavor="pearson_residuals")
    with pytest.raises(ValueError, match="RAW counts"):
        highly_variable_genes(
            m, flavor="pearson_residuals", n_top_genes=5, assume_logged=True
        )
    with pytest.raises(ValueError, match="theta"):
        highly_variable_genes(
            m, flavor="pearson_residuals", n_top_genes=5, theta=0.0
        )
    with pytest.raises(ValueError, match="theta"):
        normalize_pearson_residuals(m, theta=-1.0)


def test_hvg_pearson_batch_votes():
    rng = np.random.default_rng(11)
    n, p = 240, 80
    X = rng.poisson(1.0, size=(n, p)).astype(np.float64)
    batch = np.array(["a"] * (n // 2) + ["b"] * (n // 2))
    # genes 0-4: variable in BOTH batches; gene 5: artifact only in batch a
    labels = rng.integers(0, 3, n)
    for gidx in range(5):
        X[:, gidx] += 20.0 * (labels == gidx % 3)
    X[batch == "a", 5] += 40.0 * (labels[batch == "a"] == 0)
    m = SparseMatrix.from_dense(X)
    res = highly_variable_genes(
        m, flavor="pearson_residuals", n_top_genes=5, batches=batch
    )
    sel = set(np.where(res.mask)[0])
    assert set(range(5)) == sel  # both-batch genes beat the artifact
    assert res.n_batches_selected is not None
    assert res.n_batches_selected[:5].min() >= 1
    # the single-batch artifact cannot out-vote the both-batch markers
    assert res.n_batches_selected[5] <= res.n_batches_selected[:5].max()
    # per-batch variances computed on the batch SUBSET (batch-local totals):
    # the artifact is loud inside batch a, invisible inside batch b
    var_a = _pearson_residual_variance(
        m.select_rows(np.where(batch == "a")[0]), 100.0, None
    )
    var_b = _pearson_residual_variance(
        m.select_rows(np.where(batch == "b")[0]), 100.0, None
    )
    assert 5 in np.argsort(-var_a)[:5]
    assert 5 not in np.argsort(-var_b)[:20]


def test_sparse_random_matrix_roundtrip_parity():
    sp = make_random_csr(123, 77, density=0.12, seed=9)
    X = np.asarray(sp.todense())
    X = np.rint(X * 7)
    sp = sp.copy()
    m = SparseMatrix.from_dense(X)
    got = _pearson_residual_variance(m, 50.0, None, gene_block=16, row_block=32)
    want = np.var(_np_residuals(X, 50.0), axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_recipe_pearson_residuals():
    from single_algebra_tpu.recipes import recipe_pearson_residuals

    X = np.asarray(
        cluster_counts(400, 300, n_clusters=4, seed=13, density=0.2).todense()
    )
    m = SparseMatrix.from_dense(X)
    Z, info = recipe_pearson_residuals(
        m, n_top_genes=80, min_genes=1, min_cells=2
    )
    n_kept = int(info["cell_mask"].sum())
    assert Z.shape == (n_kept, 80)
    assert np.isfinite(np.asarray(Z)).all()
    assert info["gene_mask"].sum() == 80
    assert info["hvg"].n_selected == 80
    # step 4 recomputes residuals on the SUBSET counts — check against
    # the numpy formula applied to the kept submatrix
    sub = X[np.asarray(info["cell_mask"])][:, np.asarray(info["gene_mask"])]
    want = _np_residuals(sub, theta=100.0)
    np.testing.assert_allclose(np.asarray(Z), want, rtol=1e-8, atol=1e-9)


def test_recipe_pearson_residuals_with_batches_and_filtering():
    # cells below min_genes get dropped; the batches vector must follow
    rng = np.random.default_rng(17)
    X = np.asarray(
        cluster_counts(200, 120, n_clusters=3, seed=19, density=0.25).todense()
    )
    X[:15] = 0.0  # cells that filter_cells will drop
    X[15, :] = 0.0
    X[15, 0] = 3.0  # one detected gene — below min_genes=5
    batches = np.array(["a", "b"])[rng.integers(0, 2, 200)]
    from single_algebra_tpu.recipes import recipe_pearson_residuals

    Z, info = recipe_pearson_residuals(
        m=SparseMatrix.from_dense(X), n_top_genes=30, min_genes=5,
        min_cells=2, batches=batches,
    )
    assert int(info["cell_mask"].sum()) == 200 - 16
    assert Z.shape == (184, 30)
    assert info["hvg"].n_batches_selected is not None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="batches length"):
        recipe_pearson_residuals(
            m=SparseMatrix.from_dense(X), n_top_genes=10,
            batches=batches[:50],
        )
