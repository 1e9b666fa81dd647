"""Property-style sweep: every statistic vs scipy across random
shape/density/format/dtype combinations (seeded)."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix


CASES = [
    # (n, p, density, fmt, dtype, seed)
    (1, 1, 1.0, "csr", np.float64, 0),
    (7, 130, 0.02, "csc", np.float32, 1),
    (64, 64, 0.5, "csr", np.float64, 2),
    (129, 3, 0.3, "csc", np.float64, 3),
    (200, 1000, 0.001, "csr", np.float32, 4),  # many empty rows/cols
    (33, 47, 0.15, "csc", np.float64, 5),
]


@pytest.mark.parametrize("n,p,density,fmt,dtype,seed", CASES)
def test_stats_sweep(n, p, density, fmt, dtype, seed):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=density, format="csr", dtype=np.float64,
        random_state=rng, data_rvs=lambda s: rng.standard_normal(s),
    ).astype(dtype)
    m = SparseMatrix.from_scipy(X, fmt=fmt, dtype=dtype)
    dense = X.toarray()
    tol = dict(rtol=2e-4, atol=1e-4) if dtype == np.float32 else dict(
        rtol=1e-9, atol=1e-12
    )

    np.testing.assert_allclose(np.asarray(m.sum_row()), dense.sum(1), **tol)
    np.testing.assert_allclose(np.asarray(m.sum_col()), dense.sum(0), **tol)
    np.testing.assert_allclose(
        np.asarray(m.sum_row_squared()), (dense**2).sum(1), **tol
    )
    np.testing.assert_array_equal(
        np.asarray(m.nonzero_row()), (dense != 0).sum(1)
    )
    np.testing.assert_array_equal(
        np.asarray(m.nonzero_col()), (dense != 0).sum(0)
    )
    if n > 1:
        np.testing.assert_allclose(
            np.asarray(m.var_col()), dense.var(0, ddof=1), **tol
        )
    mins, maxs = m.min_max_row()
    for i in range(n):
        nz = dense[i][dense[i] != 0]
        if nz.size:
            assert np.isclose(mins[i], nz.min(), rtol=1e-5)
            assert np.isclose(maxs[i], nz.max(), rtol=1e-5)

    mask = rng.random(n) < 0.5
    np.testing.assert_allclose(
        np.asarray(m.sum_col_masked(mask)), dense[mask].sum(0), **tol
    )
    np.testing.assert_allclose(
        np.asarray(m.sum_row_n_top(3)),
        [np.sort(dense[i][dense[i] != 0])[::-1][:3].sum() for i in range(n)],
        **tol,
    )

    # matmul parity
    B = rng.standard_normal((p, 4)).astype(dtype)
    np.testing.assert_allclose(
        np.asarray(m.matmul_dense(B)), dense @ B,
        rtol=1e-3 if dtype == np.float32 else 1e-9,
        atol=1e-3 if dtype == np.float32 else 1e-9,
    )
