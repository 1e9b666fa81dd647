"""Warm-path profiling: where does the per-fit wall time go?

Times, separately: the fused fit dispatch (device-side, block_until_ready),
the scalar/s pull, the T pull through the tunnel, and the host-side fit()
wrapper overhead. Run on the real chip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from bench import FULL, make_matrix  # noqa: E402


def t(label, fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    print(f"{label:40s} min={min(runs)*1e3:8.1f} ms  runs={[round(r*1e3,1) for r in runs]}")
    return min(runs)


def main():
    import jax
    import jax.numpy as jnp

    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models.pca import (
        SparsePCA,
        _fit_graph,
        _host_col_stats,
        make_engine_operator,
    )
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    cfg = FULL
    X = make_matrix(cfg["n"], cfg["p"], cfg["density"])
    m = SparseMatrix.from_scipy(X, device=False)
    k = cfg["k"]
    method = SVDMethod.random(10, 7, PowerIterationNormalizer.QR)

    t0 = time.perf_counter()
    op = make_engine_operator(m, "auto")
    print(f"operator build: {time.perf_counter()-t0:.1f}s type={type(op).__name__}")

    col_sums, _ = _host_col_stats(m)
    mean = jnp.asarray((col_sums / cfg["n"]).astype(np.float32))

    def fit_dev():
        s, vt, T = _fit_graph(
            op, mean, 42, k=k, method=method, center=True,
            steps=None, want_transform=True, tol=1e-6,
        )
        jax.block_until_ready((s, vt, T))
        return s, vt, T

    # warm the cache
    s, vt, T = fit_dev()
    t("fit graph (device, no pull)", fit_dev)
    t("pull s (k floats)", lambda: np.asarray(s))
    t("pull vt (k x p)", lambda: np.asarray(vt))
    t("pull T (n x k, 20MB)", lambda: np.asarray(T))
    t("mean transfer host->dev", lambda: jax.block_until_ready(
        jnp.asarray((col_sums / cfg["n"]).astype(np.float32))))

    # full fit() wrapper for comparison
    pca = SparsePCA(n_components=k, svd_method=method, random_seed=42)

    def full_fit():
        T = pca.fit_transform(m)
        np.asarray(T)

    full_fit()
    t("full fit_transform + pull", full_fit)

    def full_fit_nopull():
        T = pca.fit_transform(m)
        jax.block_until_ready(T)

    t("full fit_transform (no pull)", full_fit_nopull)

    # gram engine comparison
    op_g = make_engine_operator(m, "gram")
    from single_algebra_tpu.linalg import gram_pca_graph

    t0 = time.perf_counter()
    G = op_g.gram_cached()
    jax.block_until_ready(G)
    print(f"gram build: {time.perf_counter()-t0:.1f}s")

    def fit_gram():
        s, vt, T = gram_pca_graph(
            op_g, G, mean, 42, k=k,
            center_svd=True, center_T=True, want_transform=True,
        )
        jax.block_until_ready((s, vt, T))

    fit_gram()
    t("gram fit graph (device, no pull)", fit_gram)


if __name__ == "__main__":
    main()
