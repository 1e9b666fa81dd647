"""Normalize / Log1P preprocessing tests.

Ports the reference's exact-value cases: sparse normalize at 1e-10
(csr.rs:1516-1550, csc.rs:1257-1301), zero-sum lines untouched
(csr.rs:1021-1030), log1p on stored values incl. explicit zeros
(csc.rs:1304-1314), and the dense normalize goldens
(src/dense/mod.rs:56-103).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import Direction, SparseMatrix
from single_algebra_tpu import dense as sad


@pytest.mark.parametrize("fmt", ["csr", "csc"])
@pytest.mark.parametrize("direction", [Direction.ROW, Direction.COLUMN])
def test_sparse_normalize(small_csr, fmt, direction):
    m = SparseMatrix.from_scipy(small_csr, fmt=fmt)
    axis = 1 if direction == Direction.ROW else 0
    sums = np.asarray(m.sum_row() if direction == Direction.ROW else m.sum_col())
    target = 10.0
    out = m.normalize(sums, target, direction)
    dense = out.to_dense()
    line_sums = dense.sum(axis=axis)
    present = sums > 0
    np.testing.assert_allclose(line_sums[present], target, atol=1e-10)
    # original is unchanged (functional semantics)
    np.testing.assert_allclose(m.to_dense(), small_csr.toarray())


def test_normalize_zero_sum_rows_untouched():
    # row 1 sums to zero but has stored values; reference skips it
    # (scale > 0 guard at csr.rs:1041)
    dense = np.array([[1.0, 3.0], [2.0, -2.0], [0.0, 0.0]])
    m = SparseMatrix.from_dense(dense)
    out = m.normalize(np.array([4.0, 0.0, 0.0]), 1.0, Direction.ROW)
    expect = np.array([[0.25, 0.75], [2.0, -2.0], [0.0, 0.0]])
    np.testing.assert_allclose(out.to_dense(), expect, atol=1e-12)


def test_normalize_length_validation(small_csr):
    m = SparseMatrix.from_scipy(small_csr)
    with pytest.raises(ValueError, match="Length of sums"):
        m.normalize(np.ones(3), 1.0, Direction.ROW)


def test_log1p_sparse():
    mat = sp.csr_matrix(
        (np.array([1.0, 0.0, np.e - 1.0]), np.array([0, 1, 2]),
         np.array([0, 2, 3])),
        shape=(2, 3),
    )
    m = SparseMatrix.from_scipy(mat)
    out = m.log1p_normalize()
    dense = out.to_dense()
    # stored explicit zero -> ln(1) = 0 (csc.rs:1304-1314)
    np.testing.assert_allclose(
        dense, [[np.log(2.0), 0.0, 0.0], [0.0, 0.0, 1.0]], atol=1e-12
    )
    # implicit zeros stay zero
    assert dense[0, 2] == 0.0


def test_pipeline_normalize_log1p(small_csr):
    """The scRNA workflow: sum_row -> normalize(target) -> log1p
    (reference crate docs src/lib.rs:28-33; BASELINE config #2)."""

    m = SparseMatrix.from_scipy(small_csr)
    sums = m.sum_row()
    out = m.normalize(sums, 1e4, Direction.ROW).log1p_normalize()
    expected = small_csr.toarray()
    rs = expected.sum(1, keepdims=True)
    scale = np.where(rs > 0, 1e4 / np.where(rs == 0, 1, rs), 1.0)
    expected = np.log1p(expected * scale)
    np.testing.assert_allclose(out.to_dense(), expected, rtol=1e-8)


def test_dense_normalize_goldens():
    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    out = sad.normalize(arr, [3.0, 7.0], 1.0, Direction.ROW)
    np.testing.assert_allclose(
        np.asarray(out), [[1 / 3, 2 / 3], [3 / 7, 4 / 7]], atol=1e-12
    )
    out = sad.normalize(arr, [4.0, 6.0], 1.0, Direction.COLUMN)
    np.testing.assert_allclose(
        np.asarray(out), [[1 / 4, 2 / 6], [3 / 4, 4 / 6]], atol=1e-12
    )


def test_dense_normalize_errors():
    arr = np.zeros((2, 2))
    with pytest.raises(ValueError):
        sad.normalize(arr, [1.0], 1.0, Direction.ROW)
    with pytest.raises(ValueError):
        sad.normalize(arr, [1.0], 1.0, Direction.COLUMN)
