"""Localize the randomized engines' EV floor (r3: 9e-4 -> planted-fix
1.4e-5 -> operand-split-fix ...).

On the same 100k x 2000 32-cluster matrix as `sharded_on_tpu.py`:
per-rank EV error for (a) the sharded dense engine, (b) the single-device
dense engine, (c) single-device gram, (d) a dense-f32 HIGHEST-precision
operator (solver floor: no bf16 anywhere in the products), and (e) a
host-f64 Rayleigh quotient over (b)'s returned subspace (subspace error
enters EVs only at second order, so this splits "subspace is off" from
"sigma evaluation is off").
"""

import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _datagen import cluster_counts  # noqa: E402
from sharded_on_tpu import N, P, K, SEED, host_truth  # noqa: E402


def per_rank(ev, ev_ref):
    ev = np.asarray(ev, np.float64)[: len(ev_ref)]
    return np.abs(ev - ev_ref) / ev_ref[0]


def show(tag, e):
    print(f"{tag}: max {e.max():.2e}  head {e[:4]}  tail {e[-3:]}",
          flush=True)


def main():
    assert jax.default_backend() == "tpu"
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod
    from single_algebra_tpu.parallel import make_mesh, sharded_pca_fit_transform

    X = cluster_counts(N, P, n_clusters=32, seed=SEED).astype(np.float32)
    ev_ref = host_truth(X, K)
    m = SparseMatrix.from_scipy(X)
    mesh = make_mesh(1)
    method = SVDMethod.random(10, 7, PowerIterationNormalizer.QR)

    r = sharded_pca_fit_transform(m, K, mesh=mesh, engine="dense", seed=SEED)
    show("sharded dense ", per_rank(r.explained_variance, ev_ref))

    def one_dev(engine):
        p = (
            SparsePCABuilder().n_components(K).svd_method(method)
            .engine(engine).random_seed(SEED).build()
        )
        p.fit(m)
        return p

    pd = one_dev("dense")
    show("1-dev dense   ", per_rank(pd.explained_variance_, ev_ref))
    pg = one_dev("gram")
    show("1-dev gram    ", per_rank(pg.explained_variance_, ev_ref))

    # (d) solver floor: dense f32 operator, HIGHEST precision products
    from single_algebra_tpu.linalg.operators import CenteredOperator
    from single_algebra_tpu.linalg.svd import randomized_svd

    @jax.tree_util.register_pytree_node_class
    @dataclasses.dataclass
    class DenseF32Op:
        A: jnp.ndarray
        shape: tuple

        def mv(self, B):
            return jax.lax.dot_general(
                self.A, B, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )

        def rmv(self, C):
            return jax.lax.dot_general(
                self.A, C, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )

        def tree_flatten(self):
            return (self.A,), (self.shape,)

        @classmethod
        def tree_unflatten(cls, aux, children):
            return cls(children[0], aux[0])

    Ad = jnp.asarray(X.toarray())
    mu = jnp.asarray(np.asarray(X.mean(axis=0), np.float32).ravel())
    op = CenteredOperator(DenseF32Op(Ad, X.shape), mu)
    res = randomized_svd(op, K, 10, 7, PowerIterationNormalizer.QR, seed=SEED)
    ev_hp = np.asarray(res.s, np.float64) ** 2 / (N - 1)
    show("f32-HIGHEST op", per_rank(ev_hp, ev_ref))

    # (e) f64 Rayleigh quotient over the 1-dev dense subspace
    import scipy.linalg as sl

    V = np.asarray(pd.components_, np.float64).T  # [p, k]
    Xd = X.astype(np.float64)
    mu64 = np.asarray(Xd.mean(axis=0)).ravel()
    G = (Xd.T @ Xd).toarray()
    C = (G - N * np.outer(mu64, mu64)) / (N - 1)
    A = V.T @ C @ V
    B = V.T @ V
    ev_ray = np.sort(sl.eigh(A, B, eigvals_only=True))[::-1][:K]
    show("f64 Rayleigh  ", per_rank(ev_ray, ev_ref))


if __name__ == "__main__":
    main()
