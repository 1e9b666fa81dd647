"""Shape/density/format fuzz sweep over the pipeline layer.

Mirrors test_fuzz_stats.py's strategy for the newer modules: every
(shape, density, format) cell must match an independent numpy/scipy
computation — catching padding, transpose-cache, and empty-line bugs
that single-shape goldens miss.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix, calculate_qc_metrics
from single_algebra_tpu.de import rank_genes_groups
from single_algebra_tpu.preprocess import aggregate, normalize_total, scale

CASES = [
    # (n, p, density, fmt)
    (3, 5, 0.5, "csr"),
    (17, 33, 0.08, "csc"),
    (64, 8, 0.3, "csr"),
    (129, 257, 0.02, "csc"),
    (40, 40, 0.9, "csr"),
    (250, 31, 0.15, "csc"),
]


def _mk(n, p, density, fmt, seed):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=density, format=fmt, dtype=np.float32,
        random_state=rng,
        data_rvs=lambda s: rng.integers(1, 9, s).astype(np.float32),
    )
    # ensure at least one empty row and column when shape allows
    X = X.tolil()
    X[0, :] = 0
    X[:, 0] = 0
    return X.asformat(fmt), rng


@pytest.mark.parametrize("n,p,density,fmt", CASES)
def test_fuzz_qc_and_normalize(n, p, density, fmt):
    X, rng = _mk(n, p, density, fmt, seed=n * 31 + p)
    m = SparseMatrix.from_scipy(X)
    Xd = X.toarray().astype(np.float64)

    obs, var = calculate_qc_metrics(m, log1p=False)
    np.testing.assert_array_equal(obs["n_genes_by_counts"], (Xd > 0).sum(1))
    np.testing.assert_allclose(obs["total_counts"], Xd.sum(1), rtol=1e-6)
    np.testing.assert_array_equal(var["n_cells_by_counts"], (Xd > 0).sum(0))

    out, sf = normalize_total(m, target_sum=100.0)
    sums = Xd.sum(1)
    ref = Xd * np.where(sums > 0, 100.0 / np.where(sums > 0, sums, 1), 1.0)[
        :, None
    ]
    np.testing.assert_allclose(out.to_dense(), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,p,density,fmt", CASES)
def test_fuzz_scale_and_aggregate(n, p, density, fmt):
    X, rng = _mk(n, p, density, fmt, seed=n * 7 + p)
    m = SparseMatrix.from_scipy(X)
    Xd = X.toarray().astype(np.float64)

    Z = np.asarray(scale(m))
    mean = Xd.mean(0)
    std = Xd.std(0, ddof=1) if n > 1 else np.ones(p)
    std = np.where(std > 0, std, 1.0)
    np.testing.assert_allclose(Z, (Xd - mean) / std, rtol=2e-4, atol=2e-4)

    labels = rng.choice(["u", "v"], n).tolist()
    labels[0] = "u"  # both groups present for n >= 2
    if n > 1:
        labels[1] = "v"
    agg = aggregate(m, labels, funcs=("mean", "count_nonzero"))
    lab = np.asarray(labels)
    for gi, g in enumerate(agg["groups"]):
        sel = Xd[lab == g]
        np.testing.assert_allclose(
            agg["mean"][gi], sel.mean(0), rtol=1e-5, atol=1e-8
        )
        np.testing.assert_array_equal(
            agg["count_nonzero"][gi], (sel > 0).sum(0)
        )


@pytest.mark.parametrize("n,p,density,fmt", [c for c in CASES if c[0] >= 17])
def test_fuzz_de_ttest(n, p, density, fmt):
    from scipy import stats

    X, rng = _mk(n, p, density, fmt, seed=n * 13 + p)
    m = SparseMatrix.from_scipy(X)
    Xd = X.toarray().astype(np.float64)
    lab = rng.choice(["a", "b"], n)
    lab[: n // 2] = "a"
    lab[n // 2:] = "b"
    res = rank_genes_groups(m, lab.tolist(), method="t-test",
                            log1p_input=False)
    order = np.argsort(res.names["a"])
    got_t = res.scores["a"][order]
    with np.errstate(divide="ignore", invalid="ignore"):
        ref_t, _ = stats.ttest_ind(
            Xd[lab == "a"], Xd[lab == "b"], equal_var=False
        )
    ok = np.isfinite(ref_t)
    np.testing.assert_allclose(got_t[ok], ref_t[ok], rtol=5e-3, atol=1e-4)
    # all-zero genes: finite scores, no NaN leakage
    assert np.isfinite(got_t).all()
