"""Post-normalization preprocessing: ``scale`` and ``regress_out``.

scanpy's ``pp.scale`` / ``pp.regress_out`` surface over this library's
device kernels. Both are one-jitted-graph operations: column moments
ride the fused ELL reductions, densification is a single device
scatter, and ``regress_out``'s projector is two MXU matmuls plus a
q x q solve (q = covariate count, tiny). The reference ships the
normalize/log1p half of preprocessing (``src/utils/mod.rs:6-39``);
these are the steps its downstream pipelines run next.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["scale", "regress_out"]


@partial(jax.jit, static_argnames=("n",))
def _ell_densify(ell_data, ell_ids, row_nnz, n: int):
    """Row-major ELL -> dense [rows_padded, n] by one device scatter."""

    R, W = ell_data.shape
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    valid = w_iota < row_nnz[:, None]
    vals = jnp.where(valid, ell_data, 0.0)
    ids = jnp.where(valid, ell_ids, 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    return jnp.zeros((R, n), ell_data.dtype).at[r, ids].add(vals)


def _col_mean_std(X):
    """(mean, std, inv_std) per column, zeros included, Bessel; zero-var
    columns get std=1 (scanpy: left unscaled)."""

    from .sparse.matrix import SparseMatrix

    if isinstance(X, SparseMatrix):
        n = X.nrows
        mean = X.sum_col() / n
        var = X.var_col()
    else:
        X = jnp.asarray(X)
        n = X.shape[0]
        mean = jnp.mean(X, axis=0)
        var = jnp.var(X, axis=0) * (n / max(n - 1, 1))
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    safe = jnp.where(std > 0, std, 1.0)
    return mean, safe, 1.0 / safe


def scale(
    X,
    *,
    zero_center: bool = True,
    max_value: Optional[float] = None,
):
    """Standardize genes (columns) to unit variance (scanpy ``pp.scale``).

    ``zero_center=True`` subtracts the column mean and returns a DENSE
    device array [n, p] (centering destroys sparsity — run after HVG
    subsetting, the scanpy workflow). ``zero_center=False`` multiplies
    by 1/std only and PRESERVES sparsity: a SparseMatrix in stays a
    SparseMatrix. ``max_value`` clips values ABOVE it after scaling
    (scanpy semantics: upper clip only); zero-variance columns are left
    unscaled.
    """

    from .sparse.matrix import SparseMatrix

    mean, _, inv_std = _col_mean_std(X)

    if isinstance(X, SparseMatrix):
        if not zero_center:
            if X.format == "csr":  # ids are column indices: gather
                factor = jnp.take(inv_std, X.ell_ids, axis=0, mode="clip")
                new = X.ell_data * factor
            else:  # col-major: ELL rows ARE columns: broadcast
                padded = jnp.pad(
                    inv_std, (0, X.ell_data.shape[0] - X.ncols)
                )
                new = X.ell_data * padded[:, None]
            if max_value is not None:
                new = jnp.minimum(new, jnp.asarray(max_value, new.dtype))
            return X._with_data(new)
        mr = X._layout_for("row")
        dense = _ell_densify(mr.ell_data, mr.ell_ids, mr.row_nnz, X.ncols)
        dense = dense[: X.nrows]
    else:
        dense = jnp.asarray(X)
        if not zero_center:
            out = dense * inv_std[None, :]
            if max_value is not None:
                out = jnp.minimum(out, jnp.asarray(max_value, out.dtype))
            return out

    out = (dense - mean[None, :]) * inv_std[None, :]
    if max_value is not None:
        out = jnp.minimum(out, jnp.asarray(max_value, out.dtype))
    return out


@jax.jit
def _residual_graph(dense, C):
    """dense [n, p] minus its projection onto span(C) ([n, q], q tiny)."""

    G = C.T @ C  # [q, q]
    CtX = C.T @ dense  # [q, p] MXU
    B = jnp.linalg.solve(G, CtX)
    return dense - C @ B  # [n, p] MXU


def regress_out(X, covariates, *, add_intercept: bool = True):
    """Per-gene OLS residuals against cell covariates (scanpy
    ``pp.regress_out``: remove e.g. total_counts / pct_counts_mito
    effects before scaling).

    ``covariates`` is [n] or [n, q] (host or device). All genes share
    one projector: B = (C^T C)^{-1} C^T X via two MXU products and a
    q x q solve. Returns a dense device array [n, p].
    """

    from .sparse.matrix import SparseMatrix

    cov = jnp.asarray(covariates, jnp.float32)
    if cov.ndim == 1:
        cov = cov[:, None]
    if isinstance(X, SparseMatrix):
        n = X.nrows
        mr = X._layout_for("row")
        dense = _ell_densify(mr.ell_data, mr.ell_ids, mr.row_nnz, X.ncols)
        dense = dense[:n]
    else:
        dense = jnp.asarray(X)
        n = dense.shape[0]
    if cov.shape[0] != n:
        raise ValueError(
            f"covariates rows ({cov.shape[0]}) != matrix rows ({n})"
        )
    if add_intercept:
        cov = jnp.concatenate([jnp.ones((n, 1), cov.dtype), cov], axis=1)
    return _residual_graph(dense, cov)
