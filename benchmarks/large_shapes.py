"""Large-shape PCA benchmarks (VERDICT #3).

Two shapes beyond the dense-bf16 engine's reach, run on the real chip:

* ``--stress``: the reference's de-facto integration test — 10,000,000 x
  2,500 CSR at density 0.01 (~250M nnz), k=50, randomized (10, 7, QR)
  (/root/reference/src/dimred/pca/sparse/mod.rs:540-562; the reference
  asserts only fit().is_ok() on 64 Rayon threads).
* ``--wide``: 400,000 x 30,000 at density 0.01 (~120M nnz) — a shape where
  ``DensifiedOperator.fits()`` is False, exercising the gram/tiled engines.

Appends results to benchmarks/results_large_tpu.json.

Usage: python benchmarks/large_shapes.py --stress|--wide [--engine auto]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

SHAPES = {
    "stress": dict(n=10_000_000, p=2_500, density=0.01, k=50),
    "wide": dict(n=400_000, p=30_000, density=0.01, k=50),
}

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_large_tpu.json")


def _log(msg):
    print(f"[large] {msg}", file=sys.stderr, flush=True)


def make_matrix(n, p, density, seed=42):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    mat = sp.random(
        n, p, density=density, format="csr", dtype=np.float32,
        random_state=rng,
        data_rvs=lambda size: (rng.poisson(1.5, size) + 1).astype(np.float32),
    )
    _log(f"generated {mat.shape} nnz={mat.nnz} in {time.perf_counter()-t0:.0f}s")
    return mat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stress", action="store_true")
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--engine", default="auto")
    args = ap.parse_args()
    name = "stress" if args.stress else "wide"
    cfg = SHAPES[name]

    import jax

    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.models.pca import make_engine_operator
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    X = make_matrix(cfg["n"], cfg["p"], cfg["density"])
    m = SparseMatrix.from_scipy(X, device=False)

    t0 = time.perf_counter()
    op = make_engine_operator(m, args.engine)
    t_build = time.perf_counter() - t0
    _log(f"engine={type(op).__name__} build+transfer {t_build:.0f}s")

    method = SVDMethod.random(10, 7, PowerIterationNormalizer.QR)

    def one_fit():
        pca = (
            SparsePCABuilder()
            .n_components(cfg["k"])
            .svd_method(method)
            .random_seed(42)
            .engine(args.engine)
            .build()
        )
        t1 = time.perf_counter()
        T = pca.fit_transform(m)
        np.asarray(pca.components_)
        np.asarray(pca.explained_variance_)
        dt = time.perf_counter() - t1
        return dt, T, pca

    t_cold, T, pca = one_fit()
    _log(f"cold fit {t_cold:.1f}s")
    warms = []
    for _ in range(2):
        t_w, T, pca = one_fit()
        warms.append(t_w)
    t_warm = min(warms)
    _log(f"warm fit {t_warm:.2f}s (runs {[round(w,2) for w in warms]})")

    ev = np.asarray(pca.explained_variance_, np.float64)
    Tn = np.asarray(T[:1000])  # sanity pull of the head only (T is huge)
    assert np.isfinite(Tn).all() and np.isfinite(ev).all()
    ratio = np.asarray(pca.explained_variance_ratio(), np.float64)

    d = jax.devices()[0]
    rec = {
        "shape": f"{cfg['n']}x{cfg['p']}",
        "density": cfg["density"],
        "nnz": int(X.nnz),
        "k": cfg["k"],
        "engine": type(op).__name__,
        "backend": f"{d.platform}:{d.device_kind}",
        "build_transfer_s": round(t_build, 1),
        "cold_fit_s": round(t_cold, 1),
        "warm_fit_s": round(t_warm, 2),
        "ev_head": [round(float(v), 2) for v in ev[:5]],
        "ev_ratio_sum_k": round(float(ratio.sum()), 6),
    }
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    results[name] = rec
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
