"""Why is the tiled randomized fit 103 s at 400k x 30k (d=0.01)?

The first-fit promotion was justified with 'tiled ~1.2 s vs Gram full
pass ~3.0 s' but the measured accuracy_at_scale first-fit row says
103 s and EV rel err 1.2e-3. This script times the pieces: payload
geometry (wt, overflow width), one mv, one rmv, one power-iteration
round trip, and a full fit with _fit_timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import scipy.sparse as sp

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def log(m):
    print(f"[prof] {m}", file=sys.stderr, flush=True)


def timed(fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.linalg.operators import TiledSparseOperator
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "_truth_cache",
        "wide_400000x30000_s7_c64.npz",
    )
    t0 = time.time()
    X = sp.load_npz(path)
    log(f"matrix loaded {time.time() - t0:.0f}s; nnz={X.nnz}")
    m = SparseMatrix.from_scipy(X, device=False)

    t0 = time.time()
    op = TiledSparseOperator.from_matrix(m)
    log(f"tiled payload built+shipped {time.time() - t0:.0f}s")
    for name in ("wt", "ntiles", "ct", "ov_w", "meta"):
        if hasattr(op, name):
            log(f"op.{name} = {getattr(op, name)}")

    n, p = m.shape
    k, os_, q = 50, 10, 7
    B = jnp.asarray(
        np.random.default_rng(0).standard_normal((p, k + os_)), jnp.float32
    )
    C = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, k + os_)), jnp.float32
    )

    t_mv = timed(lambda: op.mv(B))
    log(f"mv  (A @ [p,{k+os_}]):   {t_mv:.3f}s")
    t_rmv = timed(lambda: op.rmv(C))
    log(f"rmv (A^T @ [n,{k+os_}]): {t_rmv:.3f}s")
    if hasattr(op, "mv_precise"):
        t_mvp = timed(lambda: op.mv_precise(B))
        log(f"mv_precise:           {t_mvp:.3f}s")

    est = t_mv * (q + 1) + t_rmv * (q + 1)
    log(f"naive pass estimate for q={q}: {est:.2f}s")

    pca = (
        SparsePCABuilder()
        .n_components(k)
        .svd_method(SVDMethod.random(os_, q, PowerIterationNormalizer.QR))
        .engine("tiled")
        .build()
    )
    t0 = time.perf_counter()
    pca.fit(m)
    np.asarray(pca.explained_variance_)
    cold = time.perf_counter() - t0
    log(f"tiled fit cold: {cold:.1f}s; timings={pca._fit_timings}")
    t0 = time.perf_counter()
    pca.fit(m)
    np.asarray(pca.explained_variance_)
    warm = time.perf_counter() - t0
    log(f"tiled fit warm: {warm:.1f}s; timings={pca._fit_timings}")
    print(json.dumps({"mv": t_mv, "rmv": t_rmv, "warm_fit": warm}))


if __name__ == "__main__":
    main()
