"""Benchmark the 'tiled' engine band on-chip (VERDICT r2 next-round #8).

``make_engine_operator``'s auto ladder selects the Pallas tiled engine when
the dense bf16 form exceeds HBM AND p > 40,960 rules out the Gram engine
(whose p x p matrix would crowd out HBM) AND the ~2-3x-nnz single-
orientation payload still fits — e.g. ultra-wide sparse panels. This
script drives one PCA fit at such a shape, verifies 'auto' actually picks
'tiled', and records warm/cold plus an EV sanity figure vs the measured
1-core CPU Halko reference on the same matrix.

Writes benchmarks/results_tiled_tpu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

N, P, DENSITY, K, SEED = 150_000, 49_152, 0.004, 50, 11


def main():
    import jax

    import bench
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.models.pca import make_engine_operator
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    X = bench.make_matrix(N, P, DENSITY, seed=SEED)
    print(f"[tiled] {X.shape} nnz={X.nnz}", file=sys.stderr, flush=True)
    m = SparseMatrix.from_scipy(X, device=False)
    m.transpose()

    op = make_engine_operator(m, "auto")
    engine = type(op).__name__
    print(f"[tiled] auto engine = {engine}", file=sys.stderr, flush=True)

    def one_fit():
        pca = (
            SparsePCABuilder()
            .n_components(K)
            .svd_method(SVDMethod.random(10, 7, PowerIterationNormalizer.QR))
            .random_seed(SEED)
            .build()
        )
        t0 = time.perf_counter()
        pca.fit(m)
        jax.device_get(pca.components_[:1])
        return time.perf_counter() - t0, pca

    cold, pca = one_fit()
    print(f"[tiled] cold {cold:.1f}s", file=sys.stderr, flush=True)
    warms = [one_fit()[0] for _ in range(3)]
    warm = min(warms)

    key = f"{N}x{P}x{DENSITY}x{K}"
    cache = {}
    if os.path.exists(bench.BASELINE_CACHE):
        cache = json.load(open(bench.BASELINE_CACHE))
    cpu = cache.get(key)
    if not isinstance(cpu, dict):
        total, spmm, dense, _ = bench.run_cpu_reference(X, K)
        cpu = {"total_1core_s": total, "spmm_s": spmm, "dense_s": dense}
        cache[key] = cpu
        json.dump(cache, open(bench.BASELINE_CACHE, "w"))
    p64 = bench.project_64core(cpu["spmm_s"], cpu["dense_s"])

    ev = np.asarray(pca.explained_variance_, np.float64)
    out = dict(
        shape=[N, P], density=DENSITY, nnz=int(X.nnz), k=K,
        backend=str(jax.devices()[0].device_kind),
        auto_engine=engine,
        cold_s=round(cold, 1), warm_s=round(warm, 4),
        ev_head=[round(float(v), 5) for v in ev[:5]],
        ev_monotone=bool(np.all(np.diff(ev) <= 1e-6)),
        cpu_1core_s=round(cpu["total_1core_s"], 1),
        cpu_64core_projected_s=round(p64, 2),
        vs_64core_projected=round(p64 / warm, 2),
    )
    path = os.path.join(os.path.dirname(__file__), "results_tiled_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
