"""Compositional fuzz of the device-resident value paths.

Random chains of value maps (normalize / log1p / generic map_stored),
structural selections, and transposes — the operations that keep values
device-side and move them only by gather — are mirrored against scipy
dense arithmetic at every step. This hammers the flat-slot index math of
``_transpose_structural`` / ``_select_major_structural`` and the
transpose-twin propagation of ``map_stored`` under arbitrary
composition (each output feeds the next op).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.types import Direction


def _mirror_assert(m, D, rtol=2e-5):
    assert m.shape == D.shape
    np.testing.assert_allclose(
        np.asarray(m.sum_row()), D.sum(axis=1), rtol=rtol, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(m.sum_col()), D.sum(axis=0), rtol=rtol, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(m.to_dense()), D, rtol=rtol, atol=1e-5
    )


def _apply_random_op(rng, m, D):
    """One random op applied to both representations; returns (m', D')."""

    op = rng.choice(
        ["log1p", "normalize_row", "normalize_col", "map_rc",
         "select_rows", "select_cols", "transpose_roundtrip"]
    )
    if op == "log1p":
        return m.log1p_normalize(), np.log1p(D)
    if op == "normalize_row":
        sums = np.asarray(m.sum_row())
        mm = m.normalize(sums.astype(np.float32), 50.0, Direction.ROW)
        scale = np.where(sums > 0, 50.0 / np.where(sums > 0, sums, 1), 1.0)
        return mm, D * scale[:, None]
    if op == "normalize_col":
        sums = np.asarray(m.sum_col())
        mm = m.normalize(sums.astype(np.float32), 25.0, Direction.COLUMN)
        scale = np.where(sums > 0, 25.0 / np.where(sums > 0, sums, 1), 1.0)
        return mm, D * scale[None, :]
    if op == "map_rc":
        import jax.numpy as jnp

        rf = rng.uniform(0.5, 1.5, m.shape[0]).astype(np.float32)
        cf = rng.uniform(0.5, 1.5, m.shape[1]).astype(np.float32)
        rfd, cfd = jnp.asarray(rf), jnp.asarray(cf)
        mm = m.map_stored(
            lambda v, r, c: v
            * jnp.take(rfd, r, mode="clip")
            * jnp.take(cfd, c, mode="clip")
        )
        # implicit zeros stay zero in the sparse map
        return mm, D * rf[:, None] * cf[None, :] * (D != 0)
    if op == "select_rows":
        k = rng.integers(1, m.shape[0] + 1)
        rows = rng.choice(m.shape[0], size=k, replace=False)
        return m.select_rows(rows), D[rows]
    if op == "select_cols":
        mask = rng.random(m.shape[1]) < 0.6
        if not mask.any():
            mask[rng.integers(0, m.shape[1])] = True
        return m.select_cols(mask), D[:, mask]
    # transpose twice: exercises the structural path and twin caching
    mt = m.transpose().transpose()
    return mt, D


@pytest.mark.parametrize("seed", range(8))
def test_random_chains_match_dense_mirror(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 80))
    p = int(rng.integers(8, 80))
    density = float(rng.uniform(0.05, 0.5))
    fmt = "csr" if rng.random() < 0.5 else "csc"
    A = sp.random(n, p, density=density, random_state=int(seed) + 100,
                  format="csr")
    A.data = rng.uniform(0.25, 3.0, A.nnz).astype(np.float64)
    m = SparseMatrix.from_scipy(A.asformat(fmt))
    D = A.toarray()
    if rng.random() < 0.5:
        m.sum_col()  # pre-build the twin on some chains

    for _ in range(int(rng.integers(3, 7))):
        m, D = _apply_random_op(rng, m, D)
        _mirror_assert(m, D)


def test_chain_ends_with_engine_fit():
    """A mapped+selected matrix must still feed the engine seam
    (device densify) and produce the same PCA as a host rebuild."""

    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import SVDMethod

    rng = np.random.default_rng(42)
    lam = rng.gamma(0.5, 2.0, (6, 120)).astype(np.float32)
    lab = rng.integers(0, 6, 900)
    X = sp.csr_matrix(rng.poisson(lam[lab]).astype(np.float32))
    m = SparseMatrix.from_scipy(X)
    sums = np.asarray(m.sum_row())
    mn = m.normalize(sums.astype(np.float32), 100.0, Direction.ROW)
    mn = mn.log1p_normalize()
    cols = np.arange(120) % 3 != 0
    ms = mn.select_cols(cols)
    assert ms._h_data is None

    D = np.asarray(X.todense())
    scale = np.where(sums > 0, 100.0 / np.where(sums > 0, sums, 1), 1.0)
    Dn = np.log1p(D * scale[:, None])[:, cols]
    ref = SparseMatrix.from_scipy(sp.csr_matrix(Dn))

    def fit(mat):
        return (
            SparsePCABuilder()
            .n_components(5)
            .svd_method(SVDMethod.random(10, 7))
            .build()
            .fit(mat)
        )

    f1, f2 = fit(ms), fit(ref)
    np.testing.assert_allclose(
        f1.explained_variance_, f2.explained_variance_, rtol=1e-4
    )
