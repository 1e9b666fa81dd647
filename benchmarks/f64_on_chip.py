"""f64 on the real TPU (VERDICT #7 / graded config #1).

Runs, with x64 mode enabled on the actual chip:

1. graded config #1 — ``sum_col`` / ``sum_col_squared`` on a synthetic
   1000x5000 f64 CSR matrix (BASELINE.json), timed warm, max error vs
   numpy f64;
2. one f64 SparsePCA fit (randomized, k=10) on a 20000x2000 matrix,
   explained-variance parity vs a CPU f64 reference of the same algorithm.

XLA:TPU has no native f64 ALU — f64 math is compiler-emulated (double-f32
pairs), so this is a correctness/parity artifact with honest timings, not
a throughput path. Results are appended to benchmarks/results_f64_tpu.json.

Usage: python benchmarks/f64_on_chip.py
"""

import json
import os
import sys
import time

os.environ["JAX_ENABLE_X64"] = "1"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def _timed(fn, n=3):
    fn()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main():
    import jax
    import scipy.sparse as sp

    import single_algebra_tpu as sat

    dev = jax.devices()[0]
    print(f"backend: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    results = {"backend": f"{dev.platform}:{dev.device_kind}"}

    # -- graded config #1: col stats on 1000x5000 f64 ---------------------
    rng = np.random.default_rng(42)
    X = sp.random(
        1000, 5000, density=0.05, format="csr", dtype=np.float64,
        random_state=rng, data_rvs=rng.standard_normal,
    )
    m = sat.SparseMatrix.from_scipy(X, dtype=np.float64)
    assert m.dtype == np.float64, m.dtype

    s = np.asarray(m.sum_col())
    sq = np.asarray(m.sum_col_squared())
    ref_s = np.asarray(X.sum(axis=0)).ravel()
    ref_sq = np.asarray(X.multiply(X).sum(axis=0)).ravel()
    err_s = float(np.abs(s - ref_s).max())
    err_sq = float(np.abs(sq - ref_sq).max())
    t_stats = _timed(lambda: (np.asarray(m.sum_col()), np.asarray(m.sum_col_squared())))
    print(f"col stats f64: {t_stats*1e3:.1f} ms warm, max err sum={err_s:.2e} sq={err_sq:.2e}",
          file=sys.stderr)
    assert err_s < 1e-9 and err_sq < 1e-9, (err_s, err_sq)
    results["config1_colstats_1000x5000_f64"] = {
        "warm_s": round(t_stats, 4),
        "max_err_sum": err_s,
        "max_err_sumsq": err_sq,
    }

    # -- one f64 PCA fit ---------------------------------------------------
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    # structured (rank-dominant) data: a flat pure-noise spectrum is
    # ill-posed for ANY randomized solver at 1e-6 — the reference's
    # randomized path would miss it identically. PCA's use case is
    # spectra with structure.
    # scRNA-like 16-cluster counts: genuinely gapped top-k spectrum
    # (gap ratios 1.2-1.5, measured) — flat spectra are unresolvable at
    # 1e-6 by ANY randomized solver, the reference's included
    n, p, k, nc = 20000, 2000, 10, 16
    rng2 = np.random.default_rng(7)
    base = rng2.gamma(2.0, 1.0, size=(nc, p)) * (rng2.random((nc, p)) < 0.5)
    lam = base * np.geomspace(8, 1, nc)[:, None]
    lam *= 0.05 / max(base.mean(), 1e-9)
    labels = rng2.integers(0, nc, n)
    Xp = sp.csr_matrix(rng2.poisson(lam[labels]).astype(np.float64))
    mp_ = sat.SparseMatrix.from_scipy(Xp, dtype=np.float64)
    pca = (
        SparsePCABuilder()
        .n_components(k)
        .svd_method(SVDMethod.random(10, 7, PowerIterationNormalizer.QR))
        .random_seed(42)
        .build()
    )
    t0 = time.perf_counter()
    T = pca.fit_transform(mp_)
    Tn = np.asarray(T)
    t_cold = time.perf_counter() - t0
    assert Tn.dtype == np.float64, Tn.dtype

    def refit():
        b = (
            SparsePCABuilder()
            .n_components(k)
            .svd_method(SVDMethod.random(10, 7, PowerIterationNormalizer.QR))
            .random_seed(42)
            .build()
        )
        np.asarray(b.fit_transform(mp_))
        return b

    t_warm = _timed(refit)

    # CPU f64 reference: exact dense SVD of the centered matrix
    D = Xp.toarray()
    Dc = D - D.mean(axis=0, keepdims=True)
    s_ref = np.linalg.svd(Dc, compute_uv=False)
    ev_ref = s_ref[:k] ** 2 / (n - 1)
    ev = np.asarray(pca.explained_variance_, dtype=np.float64)
    rel = float(np.abs(ev - ev_ref).max() / ev_ref[0])
    print(
        f"f64 PCA {n}x{p} k={k}: cold {t_cold:.1f}s warm {t_warm:.2f}s, "
        f"EV rel err vs dense f64 SVD = {rel:.2e}",
        file=sys.stderr,
    )
    assert rel < 1e-6, rel
    results["f64_pca_20000x2000_k10"] = {
        "cold_s": round(t_cold, 2),
        "warm_s": round(t_warm, 3),
        "ev_rel_err_vs_dense_f64_svd": rel,
    }

    out = os.path.join(os.path.dirname(__file__), "results_f64_tpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
