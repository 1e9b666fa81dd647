"""Multi-device PCA: the north-star workload sharded over a mesh.

Composes the row-sharded operator with the jitted randomized-SVD engine.
The partitioning follows the scaling-book recipe for this problem class:
rows (cells) sharded over the mesh axis, all l-width sketch matrices and
p-width statistics replicated, collectives limited to one ``psum`` per
``A^T @ ...`` product and per column-stat pass — all riding ICI.

Single-device meshes degenerate to the plain path, so this is also the
entry point the driver's ``dryrun_multichip`` exercises.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..linalg import CenteredOperator, randomized_svd, svd_flip
from ..sparse.matrix import SparseMatrix
from ..types import PowerIterationNormalizer, SVDMethod
from .sharded import Mesh, ShardedDensified, ShardedSpMM, make_mesh

__all__ = ["ShardedPCAResult", "sharded_pca_fit_transform"]


class ShardedPCAResult(NamedTuple):
    transformed: jnp.ndarray  # [n, k] row-sharded
    components: jnp.ndarray  # [k, p] replicated
    explained_variance: jnp.ndarray  # [k]
    mean: jnp.ndarray  # [p]
    total_variance: jnp.ndarray  # []


def sharded_pca_fit_transform(
    x,
    n_components: int = 50,
    mesh: Mesh | None = None,
    svd_method: SVDMethod | None = None,
    center: bool = True,
    seed: int = 42,
    engine: str = "sparse",
) -> ShardedPCAResult:
    """Centered randomized PCA of a row-sharded sparse matrix.

    ``x`` may be a SparseMatrix (sharded here) or a prebuilt
    :class:`ShardedSpMM`.
    """

    if svd_method is None:
        svd_method = SVDMethod.random(10, 7, PowerIterationNormalizer.QR)
    if not svd_method.is_random:
        raise NotImplementedError(
            "sharded PCA currently supports the randomized SVD path"
        )
    if isinstance(x, (ShardedSpMM, ShardedDensified)):
        op = x
    else:
        if not isinstance(x, SparseMatrix):
            x = SparseMatrix.from_scipy(x)
        cls = ShardedDensified if engine == "dense" else ShardedSpMM
        op = cls.from_matrix(x, mesh or make_mesh())

    n, p = op.shape
    stats = op.col_stats()
    # scalar bookkeeping in numpy (eager device ops cost remote compiles)
    s_np = np.asarray(stats[0], dtype=np.float64)
    sq_np = np.asarray(stats[1], dtype=np.float64)
    dt = np.asarray(stats[0]).dtype
    mean_np = s_np / n
    if center:
        total_var = float(
            np.sum((sq_np - mean_np * s_np) / max(n - 1, 1))
        )
        mean = jnp.asarray(mean_np.astype(dt))
        svd_op = CenteredOperator(op, mean)
    else:
        mean = jnp.zeros((p,), dt)
        svd_op = op

    res = randomized_svd(
        svd_op,
        n_components,
        svd_method.n_oversamples,
        svd_method.n_power_iterations,
        svd_method.normalizer,
        seed=seed,
    )
    u, vt = svd_flip(res.u, res.vt, u_based_decision=False)
    ev_np = np.asarray(res.s, np.float64) ** 2 / max(n - 1, 1)
    if not center:
        total_var = float(ev_np.sum())

    mv = getattr(svd_op, "mv_precise", svd_op.mv)
    T = mv(vt.T)
    return ShardedPCAResult(
        T, vt, jnp.asarray(ev_np.astype(dt)), mean, total_var
    )
