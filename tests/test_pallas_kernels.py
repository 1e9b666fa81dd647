"""Pallas kernel equivalence tests (interpret mode on CPU).

SURVEY.md §4's prescription: every Pallas kernel is validated against the
plain-jnp reference implementation via ``interpret=True`` so the suite runs
without TPU hardware.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu.ops.pallas.spmm_kernel import tiled_ell_spmm_t
from single_algebra_tpu.sparse.convert import csr_to_tiled_ell_numpy


@pytest.mark.parametrize(
    "n,p,k,density,ct",
    [
        (512, 300, 16, 0.1, 128),
        (1024, 700, 60, 0.05, 256),
        (512, 90, 5, 0.3, 128),  # single tile, p < ct
    ],
)
def test_tiled_spmm_matches_scipy(n, p, k, density, ct):
    rng = np.random.default_rng(0)
    X = sp.random(
        n, p, density=density, format="csr", dtype=np.float64,
        random_state=rng, data_rvs=rng.random,
    ).astype(np.float32)
    td, tl, wt, nt = csr_to_tiled_ell_numpy(
        X.indptr, X.indices, X.data, n, p, col_tile=ct, rows_padded_to=512
    )
    B = rng.standard_normal((p, k)).astype(np.float32)
    kp = max(-(-k // 128) * 128, 128)
    Btp = np.zeros((kp, nt * ct), np.float32)
    Btp[:k, :p] = B.T

    import jax.numpy as jnp

    out = tiled_ell_spmm_t(
        jnp.asarray(np.ascontiguousarray(td.T)),
        jnp.asarray(np.ascontiguousarray(tl.T)),
        jnp.asarray(Btp),
        wt=wt,
        ntiles=nt,
        col_tile=ct,
        block_rows=512,
        interpret=True,
    )
    ref = X @ B
    np.testing.assert_allclose(
        np.asarray(out)[:k, :n].T, ref, rtol=1e-5,
        atol=1e-5 * max(1.0, np.abs(ref).max()),
    )


def test_tiled_converter_roundtrip():
    rng = np.random.default_rng(1)
    X = sp.random(100, 500, density=0.08, format="csr", random_state=rng)
    td, tl, wt, nt = csr_to_tiled_ell_numpy(
        X.indptr, X.indices, X.data, 100, 500, col_tile=128
    )
    dense = np.zeros((td.shape[0], nt * 128))
    for t in range(nt):
        bd = td[:, t * wt : (t + 1) * wt]
        bl = tl[:, t * wt : (t + 1) * wt]
        for w in range(wt):
            np.add.at(dense, (np.arange(td.shape[0]), t * 128 + bl[:, w]), bd[:, w])
    np.testing.assert_allclose(dense[:100, :500], X.toarray(), rtol=1e-12)


def test_empty_matrix_tiled():
    td, tl, wt, nt = csr_to_tiled_ell_numpy(
        np.zeros(11, np.int64), np.zeros(0, np.int32), np.zeros(0, np.float32),
        10, 20, col_tile=128,
    )
    assert td.shape[0] >= 10 and not td.any()
