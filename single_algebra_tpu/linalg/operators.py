"""Linear-operator seam between sparse storage and the SVD engines.

The reference's SVD crate is generic over "anything with matvec + dims":
``svd_las2``/``randomized_svd`` accept both ``CsrMatrix`` and the zero-copy
column-masked ``MaskedCSRMatrix`` view (reference
``src/dimred/pca/sparse/mod.rs:137`` vs ``sparse_masked/mod.rs:322-329``;
``lanczos::masked::MaskedCSRMatrix`` at ``sparse_masked/mod.rs:15,313``).
We preserve that seam as a tiny pytree-operator hierarchy:

* :class:`SparseOperator`  — products via the padded-ELL SpMM kernels.
* :class:`MaskedOperator`  — column-masked view: an int32 gather/scatter map
  replaces the reference's mask HashMap (``sparse_masked/mod.rs:462-466``).
* :class:`CenteredOperator`— implicit mean-centering as a rank-1 correction,
  the TPU equivalent of single-svdlib's ``center_flag`` in randomized_svd
  (``sparse/mod.rs:176``): ``A_c @ B = A @ B - 1 (mu^T B)`` — the matrix is
  never densified.

All operators are pytrees, so jitted SVD loops close over them transparently.
Shapes are logical (masked operators report the masked width).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.spmm import ell_spmm
from ..types import MATMUL_PRECISION


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseOperator:
    """Products with a SparseMatrix via both ELL orientations.

    Built eagerly from a :class:`SparseMatrix` (forcing the transpose cache)
    so the jitted SVD loops receive plain arrays.
    """

    row_data: jnp.ndarray  # row-major ELL  [R, Wr]
    row_ids: jnp.ndarray
    col_data: jnp.ndarray  # col-major ELL  [C, Wc]
    col_ids: jnp.ndarray
    shape: Tuple[int, int]

    @classmethod
    def from_matrix(cls, m) -> "SparseOperator":
        row = m._layout_for("row")
        col = m._layout_for("col")
        return cls(
            row.ell_data, row.ell_ids, col.ell_data, col.ell_ids, m.shape
        )

    def mv(self, B: jnp.ndarray) -> jnp.ndarray:
        """A @ B, B: [ncols, k] -> [nrows, k]."""

        return ell_spmm(self.row_data, self.row_ids, B)[: self.shape[0]]

    def rmv(self, C: jnp.ndarray) -> jnp.ndarray:
        """A.T @ C, C: [nrows, k] -> [ncols, k]."""

        return ell_spmm(self.col_data, self.col_ids, C)[: self.shape[1]]

    def tree_flatten(self):
        return (
            (self.row_data, self.row_ids, self.col_data, self.col_ids),
            (self.shape,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseOperator:
    """Dense fallback operator (tests, small problems)."""

    a: jnp.ndarray

    @property
    def shape(self):
        return self.a.shape

    def mv(self, B):
        return jnp.dot(self.a, B, precision=MATMUL_PRECISION)

    def rmv(self, C):
        return jnp.dot(self.a.T, C, precision=MATMUL_PRECISION)

    def tree_flatten(self):
        return (self.a,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MaskedOperator:
    """Column-masked view: logical shape (n, p_masked).

    ``mask_idx[i]`` = full-width column of masked column i. ``mv`` scatters
    the narrow operand into full width (columns outside the mask multiply
    zeros); ``rmv`` gathers the masked rows of the full-width product.
    """

    base: SparseOperator
    mask_idx: jnp.ndarray  # [p_masked] int32

    @property
    def shape(self):
        return (self.base.shape[0], self.mask_idx.shape[0])

    def mv(self, B):
        full = jnp.zeros(
            (self.base.shape[1], B.shape[1]), dtype=B.dtype
        ).at[self.mask_idx].set(B)
        return self.base.mv(full)

    def rmv(self, C):
        return jnp.take(self.base.rmv(C), self.mask_idx, axis=0)

    def tree_flatten(self):
        return (self.base, self.mask_idx), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CenteredOperator:
    """Implicitly column-centered view of any operator.

    ``mu`` has the operator's logical width. Rank-1 corrections keep the
    matrix sparse, matching single-svdlib's implicit centering.
    """

    base: object
    mu: jnp.ndarray  # [p]

    @property
    def shape(self):
        return self.base.shape

    def mv(self, B):
        corr = jnp.dot(self.mu, B, precision=MATMUL_PRECISION)  # [k]
        return self.base.mv(B) - corr[None, :]

    def rmv(self, C):
        col_tot = jnp.sum(C, axis=0)  # [k]
        return self.base.rmv(C) - self.mu[:, None] * col_tot[None, :]

    def tree_flatten(self):
        return (self.base, self.mu), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
