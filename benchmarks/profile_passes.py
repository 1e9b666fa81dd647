"""Per-pass device timing on the densified engine.

block_until_ready is unreliable through the tunnel, so every timed graph
ends in a scalar reduction pulled to the host (forces real completion of
the single fused executable).
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
        f"{label:46s} min={min(runs)*1e3:8.1f} ms  "
        f"runs={[round(r * 1e3, 1) for r in runs]}"
    )
    return min(runs)


def main():
    import jax
    import jax.numpy as jnp

    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models.pca import make_engine_operator

    cfg = FULL
    X = make_matrix(cfg["n"], cfg["p"], cfg["density"])
    m = SparseMatrix.from_scipy(X, device=False)
    n, p = X.shape
    l = 60

    op = make_engine_operator(m, "dense")
    B = jnp.asarray(
        np.random.default_rng(0).standard_normal((p, l)), jnp.float32
    )
    C = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, l)), jnp.float32
    )

    mv1 = jax.jit(lambda o, b: o.mv(b).sum())
    rmv1 = jax.jit(lambda o, c: o.rmv(c).sum())
    pw1 = jax.jit(
        lambda o, b: o.mv(o.rmv(o.mv(b))).sum()
    )

    t("dense mv x1  (A@B, 2GB bf16 read)", lambda: float(mv1(op, B)))
    t("dense rmv x1 (A^T@C)", lambda: float(rmv1(op, C)))
    t("mv-rmv-mv chain (3 passes fused)", lambda: float(pw1(op, B)))


if __name__ == "__main__":
    main()
