"""Per-pass device timing: mv vs rmv on the densified engine, Gram rebuild.

Since block_until_ready is unreliable through the tunnel, every timed graph
ends in a tiny host pull (sum -> scalar) to force real synchronization.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from bench import FULL, make_matrix  # noqa: E402


def t(label, fn, n=5):
    fn()  # warm
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    print(
        f"{label:44s} min={min(runs)*1e3:8.1f} ms  "
        f"runs={[round(r * 1e3, 1) for r in runs]}"
    )
    return min(runs)


def main():
    import jax
    import jax.numpy as jnp

    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.linalg import gram_matrix
    from single_algebra_tpu.models.pca import make_engine_operator

    cfg = FULL
    X = make_matrix(cfg["n"], cfg["p"], cfg["density"])
    m = SparseMatrix.from_scipy(X, device=False)
    n, p = X.shape
    l = 60

    op = make_engine_operator(m, "dense")
    B = jnp.asarray(np.random.default_rng(0).standard_normal((p, l)), jnp.float32)
    C = jnp.asarray(np.random.default_rng(1).standard_normal((n, l)), jnp.float32)

    mv1 = jax.jit(lambda o, b: op.mv(b).sum())
    rmv1 = jax.jit(lambda o, c: op.rmv(c).sum())

    t("dense mv x1 (A@B, 2GB read)", lambda: float(mv1(op, B)))
    t("dense rmv x1 (A^T@C)", lambda: float(rmv1(op, C)))

    opg = make_engine_operator(m, "gram")
    gsum = jax.jit(lambda e: gram_matrix(e).sum())
    t("gram rebuild (1 data pass + G flops)", lambda: float(gsum(opg)), n=3)

    gmv = jax.jit(lambda e, b: e.mv(b).sum())
    grmv = jax.jit(lambda e, c: e.rmv(c).sum())
    t("gram-engine mv x1 (slab densify+dot)", lambda: float(gmv(opg, B)))
    t("gram-engine rmv x1", lambda: float(grmv(opg, C)))


if __name__ == "__main__":
    main()
