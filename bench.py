"""Benchmark: the north-star workload on real hardware.

Measures 50-component randomized-SVD PCA ``fit_transform`` (oversamples=10,
power iterations=7, QR normalizer — the reference README's recommended
config) on a seeded synthetic scRNA-scale CSR matrix, on whatever backend
JAX selects (the one real TPU chip under the driver).

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

``value`` is the warm fit_transform wall time: every output of the fused
fit graph (scores T, components, singular values) computed on device, with
the model state (components / explained variance / mean) materialized on
the host. The embedding matrix T itself stays device-resident — the
TPU-native pipeline consumes it on-chip (similarity kernels, t-SNE, UMAP,
clustering), exactly as the reference's downstream consumes its ndarray in
RAM. The wall time of additionally pulling T through this environment's
tunneled-TPU link (~20 MB at ~50 MB/s, a test-harness artifact: on a real
TPU host the same pull is a ~2 ms PCIe transfer) is reported separately in
the detail line as ``t_pull_T_s`` / ``warm_incl_T_pull_s``.

``vs_baseline`` is the speedup against a **projected 64-core** run of the
reference algorithm (the reference's PCA stress test uses a 64-thread Rayon
pool, src/dimred/pca/sparse/mod.rs:558-559). This machine exposes ONE CPU
core, so the 64-core number cannot be measured; it is projected from a
measured single-core run of the same algorithm (Halko randomized SVD over
scipy sparse matmuls — the algorithm single-svdlib implements) with a
documented, CPU-favoring scaling model:

  t_64core = t_spmm / S_SPMM + t_dense / S_DENSE

where ``t_spmm`` / ``t_dense`` are the measured single-core times of the
sparse-matvec portion vs the dense-LA portion (QR factorizations + small
SVD — serial nalgebra code in the reference, threaded BLAS at best), and

  S_SPMM  = 16  — sparse matvec is memory-bandwidth-bound; a 64-core
                  server saturates ~8-12x one core's effective bandwidth
                  (e.g. EPYC: ~400 GB/s node vs ~25-30 GB/s single-thread);
                  16x is deliberately generous to the CPU.
  S_DENSE = 32  — tall-skinny QR/GEMM under a 64-thread BLAS at 50%
                  parallel efficiency; the reference's nalgebra QR is
                  actually SERIAL, so this too is generous.

Both single-core measurements are cached in ``BASELINE_LOCAL.json``;
delete that file to re-measure.

Usage: ``python bench.py`` (full size) or ``python bench.py --smoke``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

# full-size default: ~30M nnz, dense bf16 form fits comfortably in 16 GB HBM
# sized so the whole driver run (gen + densify + transfer + cold compile +
# warm + CPU reference) stays minutes-scale on the tunneled chip: the
# sustained host->device rate is ~130 MB/s, so the 2 GB bf16 densification
# dominates the cold path
FULL = dict(n=100_000, p=10_000, density=0.03, k=50)
# --big: 4x the work; amortizes fixed per-fit overheads (dispatch RTTs)
# over a 8 GB bf16 densification — closer to the north-star regime
BIG = dict(n=200_000, p=20_000, density=0.03, k=50)
SMOKE = dict(n=20_000, p=2_000, density=0.02, k=20)
SEED = 42

# 64-core projection model (see module docstring; BASELINE.md "Scaling
# model" section for the derivation and sensitivity)
S_SPMM = 16.0
S_DENSE = 32.0

BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "BASELINE_LOCAL.json")


def make_matrix(n, p, density, seed=SEED):
    """Seeded scRNA-like count matrix (integer UMI-style values)."""

    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    mat = sp.random(
        n,
        p,
        density=density,
        format="csr",
        dtype=np.float64,
        random_state=rng,
        data_rvs=lambda size: (rng.poisson(1.5, size) + 1).astype(np.float64),
    )
    return mat.astype(np.float32)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def run_tpu(X, k):
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import (
        PowerIterationNormalizer,
        SVDMethod,
    )

    method = SVDMethod.random(10, 7, PowerIterationNormalizer.QR)

    from single_algebra_tpu.linalg import DensifiedOperator

    t0 = time.perf_counter()
    dense_path = DensifiedOperator.fits(X.shape)
    # dense engine never touches the sparse device layouts — keep them
    # host-side and skip the transpose build
    m = SparseMatrix.from_scipy(X, device=not dense_path)
    if not dense_path:
        m.transpose()  # sparse path needs both ELL orientations
    t_load = time.perf_counter() - t0
    _log(f"load done in {t_load:.1f}s (dense_path={dense_path})")

    def one_fit():
        pca = (
            SparsePCABuilder()
            .n_components(k)
            .svd_method(method)
            .random_seed(SEED)
            .build()
        )
        import jax

        t1 = time.perf_counter()
        T = pca.fit_transform(m)
        # fit() pulls the singular values of the one fused (SVD -> flip ->
        # project) dispatch, so reaching here means the whole graph —
        # including T — has executed; materialize the model state on host
        # in ONE round trip (what the reference hands back to its caller).
        jax.device_get(
            (pca.components_, pca.explained_variance_, pca.mean_)
        )
        t_done = time.perf_counter() - t1
        # separately: the full embedding pull through the tunnel
        np.asarray(T)
        t_pull = time.perf_counter() - t1 - t_done
        return t_done, t_pull, pca

    t_cold, t_cold_pull, _ = one_fit()  # includes compile + operator build
    _log(f"cold fit done in {t_cold:.1f}s (+{t_cold_pull:.1f}s T pull)")
    warms, pulls = [], []
    for _ in range(3):
        t_w, t_p, pca = one_fit()
        warms.append(t_w)
        pulls.append(t_p)
    t_warm = min(warms)  # min-of-3: tunnel latency jitter dominates
    t_pull = min(pulls)
    _log(
        f"warm fit done in {t_warm:.2f}s + {t_pull:.2f}s T pull "
        f"(runs: {[round(w, 3) for w in warms]})"
    )
    return dict(
        load=t_load, cold=t_cold, warm=t_warm, pull_T=t_pull, pca=pca
    )


def run_cpu_reference(X, k):
    """Single-core CPU pipeline: implicitly centered Halko randomized SVD
    over scipy sparse matmuls — the same algorithm the reference's
    single-svdlib implements (Gaussian sketch, QR-normalized power
    iterations, oversampling), so timings are apples-to-apples.

    Returns (total_s, spmm_s, dense_s, s[:k]): total wall time plus the
    split between the sparse-matvec portion (Rayon-parallel in the
    reference) and the dense-LA portion (serial nalgebra QR/SVD), which
    feeds the 64-core projection model.
    """

    import scipy.linalg as sla

    mu = np.asarray(X.mean(axis=0)).ravel().astype(X.dtype)
    n = X.shape[0]
    acc = {"spmm": 0.0}

    def _timed_sp(fn):
        t = time.perf_counter()
        out = fn()
        acc["spmm"] += time.perf_counter() - t
        return out

    def mv(V):  # (X - 1 mu^T) @ V
        return _timed_sp(
            lambda: X @ V - np.broadcast_to(mu @ V, (n, V.shape[1]))
        )

    def rmv(V):  # (X - 1 mu^T)^T @ V
        return _timed_sp(lambda: X.T @ V - np.outer(mu, V.sum(axis=0)))

    t0 = time.perf_counter()
    rng = np.random.default_rng(SEED)
    l = min(k + 10, min(X.shape))
    Y = mv(rng.standard_normal((X.shape[1], l)).astype(X.dtype))
    for _ in range(7):
        Y, _ = sla.qr(Y, mode="economic")
        Z = rmv(Y)
        Z, _ = sla.qr(Z, mode="economic")
        Y = mv(Z)
    Q, _ = sla.qr(Y, mode="economic")
    B = rmv(Q).T  # [l, p]
    ub, s, vt = sla.svd(B, full_matrices=False)
    T = mv(vt[:k].T)
    del T
    dt = time.perf_counter() - t0
    return dt, acc["spmm"], dt - acc["spmm"], s[:k]


def project_64core(spmm_s: float, dense_s: float) -> float:
    """CPU-favoring 64-core projection of the measured 1-core pipeline."""

    return spmm_s / S_SPMM + dense_s / S_DENSE


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()
    cfg = SMOKE if args.smoke else (BIG if args.big else FULL)

    X = make_matrix(cfg["n"], cfg["p"], cfg["density"])
    _log(f"matrix ready: {X.shape} nnz={X.nnz}")
    tpu = run_tpu(X, cfg["k"])

    key = f"{cfg['n']}x{cfg['p']}x{cfg['density']}x{cfg['k']}"
    cpu = None
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                cache = json.load(f)
            cpu = cache.get(key)
            if cpu is not None and not isinstance(cpu, dict):
                cpu = None  # stale v1 cache entry (total only)
        except Exception:
            cache = {}
    if cpu is None and not args.skip_cpu:
        total, spmm, dense, _ = run_cpu_reference(X, cfg["k"])
        cpu = {"total_1core_s": total, "spmm_s": spmm, "dense_s": dense}
        cache[key] = cpu
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f)

    vs = vs_1core = cpu64 = None
    if cpu:
        cpu64 = project_64core(cpu["spmm_s"], cpu["dense_s"])
        vs = cpu64 / tpu["warm"]
        vs_1core = cpu["total_1core_s"] / tpu["warm"]
    out = {
        "metric": (
            f"PCA fit_transform (randomized k={cfg['k']}, os=10, q=7, QR) "
            f"on {cfg['n']}x{cfg['p']} CSR d={cfg['density']} "
            f"({X.nnz} nnz), warm wall time on "
            f"{_backend_name()} (T device-resident, model state on host); "
            "vs_baseline = speedup over a PROJECTED 64-core run of the "
            f"1-core CPU Halko reference (S_spmm={S_SPMM:g}, "
            f"S_dense={S_DENSE:g}; see BASELINE.md)"
        ),
        "value": round(tpu["warm"], 4),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    print(json.dumps(out))
    print(
        json.dumps(
            {
                "detail": {
                    "load_s": round(tpu["load"], 3),
                    "cold_s": round(tpu["cold"], 3),
                    "warm_s": round(tpu["warm"], 4),
                    "t_pull_T_s": round(tpu["pull_T"], 4),
                    "warm_incl_T_pull_s": round(
                        tpu["warm"] + tpu["pull_T"], 4
                    ),
                    "cpu_1core_s": (
                        round(cpu["total_1core_s"], 3) if cpu else None
                    ),
                    "cpu_1core_spmm_s": (
                        round(cpu["spmm_s"], 3) if cpu else None
                    ),
                    "cpu_1core_dense_s": (
                        round(cpu["dense_s"], 3) if cpu else None
                    ),
                    "cpu_64core_projected_s": (
                        round(cpu64, 3) if cpu64 else None
                    ),
                    "vs_1core": round(vs_1core, 2) if vs_1core else None,
                    "vs_64core_incl_T_pull": (
                        round(cpu64 / (tpu["warm"] + tpu["pull_T"]), 2)
                        if cpu64
                        else None
                    ),
                }
            }
        ),
        file=sys.stderr,
    )


def _backend_name():
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind}"


if __name__ == "__main__":
    main()
