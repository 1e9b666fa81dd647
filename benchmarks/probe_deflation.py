"""Measure the EV accuracy of the operand-deflation fix (round 5).

Round-4/5 diagnosis (probe_sharded_acc.py, probe_ev_rescore.py): the
~1.4e-5 explained-variance error of every A-space randomized engine
lives in the sigma evaluation — ``B = Q^T A_c`` stores the f32
intermediate ``A^T Q`` at the UNCENTERED column scale before the rank-1
correction cancels it down, flooring relative accuracy at
~``eps32 * mu/sigma`` (4.8e-6 even at HIGHEST matmul precision). The
fix: CenteredOperator.rmv* deflates the operand's column means first
(an algebraic no-op for the centered operator, see operators.py), and
_CenteredGram.mv deflates against mu with a once-per-solve ``Gc @ mu``.

This probe measures, against f64 planted-spectrum truth:
  1. single-device dense/sparse/tiled randomized EV error (was 1.47e-5)
  2. the >4096-wide Gram randomized solve (the north-star solve path;
     exact-G sweeps plateaued at 6e-7..1.1e-6 before)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import jax
import jax.numpy as jnp

from _datagen import cluster_counts
from sharded_on_tpu import K, N, P, SEED, host_truth


def per_rank(ev, ev_ref):
    ev = np.asarray(ev, np.float64)[: len(ev_ref)]
    return np.abs(ev - ev_ref) / ev_ref[0]


def show(tag, e):
    print(f"{tag}: max {e.max():.2e}  head {e[:4]}", flush=True)


def main():
    assert jax.default_backend() == "tpu"
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    X = cluster_counts(N, P, n_clusters=32, seed=SEED).astype(np.float32)
    ev_ref = host_truth(X, K)
    m = SparseMatrix.from_scipy(X)
    method = SVDMethod.random(10, 7, PowerIterationNormalizer.QR)

    for engine in ("dense", "sparse", "tiled"):
        p = (
            SparsePCABuilder()
            .n_components(K)
            .svd_method(method)
            .engine(engine)
            .random_seed(SEED)
            .build()
        )
        p.fit(m)
        show(f"1dev {engine:7s}", per_rank(p.explained_variance_, ev_ref))

    # sharded engines (same solve over the mesh operators)
    from single_algebra_tpu.parallel import sharded_pca_fit_transform
    from single_algebra_tpu.parallel.sharded import make_mesh

    mesh = make_mesh()
    for engine in ("dense", "sparse", "tiled"):
        r = sharded_pca_fit_transform(
            m, n_components=K, mesh=mesh, svd_method=method, seed=SEED,
            engine=engine,
        )
        show(f"mesh {engine:7s}", per_rank(r.explained_variance, ev_ref))

    # ---- wide Gram: the randomized _CenteredGram solve (pp > 4096) ----
    N2, P2 = 60_000, 6_000
    X2 = cluster_counts(N2, P2, n_clusters=64, seed=SEED).astype(np.float32)
    ev_ref2 = host_truth(X2, K)
    m2 = SparseMatrix.from_scipy(X2)
    pg = (
        SparsePCABuilder()
        .n_components(K)
        .svd_method(method)
        .engine("gram")
        .random_seed(SEED)
        .build()
    )
    pg.fit(m2)
    show("gram rand 6k    ", per_rank(pg.explained_variance_, ev_ref2))


if __name__ == "__main__":
    main()
