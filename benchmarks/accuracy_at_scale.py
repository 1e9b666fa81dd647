"""EV exactness + baselines at the flagship shapes (VERDICT r2 #1/#3).

Round 2's large-shape rows carried only an `ev_head` on flat-spectrum
uniform data (indistinguishable from a subtly wrong solve) and NO CPU
denominator. This script re-runs the reference stress shape (10M x 2,500,
``pca/sparse/mod.rs:540-562``) and the wide dense-doesn't-fit shape
(400k x 30k) with PLANTED gapped spectra (the cluster generator from
tests/conftest.py, streamed slab-wise so the dense intermediate never
materializes), and records for each:

* ``ev_rel_err`` — explained-variance relative error vs a host-computable
  f64 truth (sparse-sparse Gram + centered eigh/eigsh; cheap BECAUSE the
  data is sparse: cost ~ sum_r nnz_r^2, not n p^2);
* ``warm_fit_s`` (operator+Gram cached: the repeated-fit path) and
  ``warm_full_s`` (Gram cache dropped: one full data pass + solve +
  projection);
* ``cpu_1core_s`` measured on the SAME matrix (bench.py's Halko pipeline)
  and the projected 64-core baseline + ``vs_64core`` speedups.

Writes ``benchmarks/results_large_tpu.json`` (replacing the round-2 file —
the tautological ``ev_ratio_sum_k`` field is gone).
"""

from __future__ import annotations

import argparse
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

HERE = os.path.dirname(os.path.abspath(__file__))
TRUTH_CACHE = os.path.join(HERE, "_truth_cache")

SHAPES = {
    # stress: 16 clusters is fine — the p<=4096 solve is an exact eigh.
    # wide: 64 planted directions so the FULL k=50 range is structured
    # (with 16, ranks 17-50 sit in the near-degenerate noise bulk, which
    # no iterative solver resolves to 1e-6 — and carries no signal anyway)
    "stress": dict(
        n=10_000_000, p=2_500, density=0.01, k=50, seed=7, n_clusters=16
    ),
    "wide": dict(
        n=400_000, p=30_000, density=0.01, k=50, seed=7, n_clusters=64
    ),
    # the metric's OWN shape (BASELINE.json: "1M x 30k CSR, 50 comps") —
    # until round 4 every flagship number was at a different shape and
    # the 1M x 30k figure was an extrapolation (VERDICT r3 missing #1)
    "northstar": dict(
        n=1_000_000, p=30_000, density=0.01, k=50, seed=7, n_clusters=64
    ),
}


def _log(msg):
    print(f"[acc] {msg}", file=sys.stderr, flush=True)


def cluster_counts_big(n, p, n_clusters=16, seed=0, density=0.01):
    """Shared sparse-sampled planted-spectrum generator (_datagen.py)."""

    from _datagen import cluster_counts_big as _gen

    return _gen(
        n, p, n_clusters=n_clusters, seed=seed, density=density, log=_log
    )


def matrix_cached(name, cfg):
    """Disk-cached planted matrix: generation at 300M nnz is minutes of
    single-core work, and the CPU-baseline prep and the TPU run happen in
    separate processes."""

    import scipy.sparse as sp_io

    os.makedirs(TRUTH_CACHE, exist_ok=True)
    path = os.path.join(
        TRUTH_CACHE,
        f"{name}_{cfg['n']}x{cfg['p']}_s{cfg['seed']}"
        f"_c{cfg.get('n_clusters', 16)}.npz",
    )
    if os.path.exists(path):
        t0 = time.time()
        X = sp_io.load_npz(path)
        _log(f"loaded cached matrix {path} in {time.time() - t0:.0f}s")
        return X
    X = cluster_counts_big(
        cfg["n"], cfg["p"], seed=cfg["seed"], density=cfg["density"],
        n_clusters=cfg.get("n_clusters", 16),
    )
    if cfg["n"] * cfg["p"] >= 1e10:  # cache only the expensive ones
        sp_io.save_npz(path, X, compressed=False)
    return X


def host_truth_ev(X, k, name):
    """Top-k centered EVs in f64: sparse-sparse Gram + eigh (p <= 4096)
    or eigsh on the dense f64 Gram (larger p). Cached on disk, keyed by
    the matrix fingerprint (shape + nnz)."""

    os.makedirs(TRUTH_CACHE, exist_ok=True)
    cpath = os.path.join(
        TRUTH_CACHE, f"{name}_{X.shape[0]}x{X.shape[1]}_{X.nnz}_ev.npy"
    )
    if os.path.exists(cpath):
        return np.load(cpath)
    n, p = X.shape
    t0 = time.time()
    X64 = sp.csr_matrix(X, dtype=np.float64)
    G = (X64.T @ X64).toarray()
    mu = np.asarray(X64.mean(axis=0)).ravel()
    _log(f"truth Gram built in {time.time() - t0:.0f}s")
    Gc = G - n * np.outer(mu, mu)
    del G
    if p <= 4096:
        w = np.linalg.eigvalsh(Gc)[::-1][:k]
    else:
        from scipy.sparse.linalg import eigsh

        w, _ = eigsh(Gc, k=k, which="LA")
        w = np.sort(w)[::-1]
    ev = w / (n - 1)
    _log(f"truth eigs done in {time.time() - t0:.0f}s")
    np.save(cpath, ev)
    return ev


def cpu_reference(X, k, key):
    """Measured 1-core Halko on this matrix (cached in BASELINE_LOCAL)."""

    import bench

    cache = {}
    if os.path.exists(bench.BASELINE_CACHE):
        cache = json.load(open(bench.BASELINE_CACHE))
    if key in cache and isinstance(cache[key], dict):
        return cache[key]
    total, spmm, dense, _ = bench.run_cpu_reference(X, k)
    cache[key] = {"total_1core_s": total, "spmm_s": spmm, "dense_s": dense}
    json.dump(cache, open(bench.BASELINE_CACHE, "w"))
    return cache[key]


def tpu_fit(X, k, seed):
    """(warm_fit_s, warm_full_s, cold_s, load_s, ev, engine)."""

    import jax

    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    t0 = time.perf_counter()
    m = SparseMatrix.from_scipy(X, device=False)
    load_s = time.perf_counter() - t0

    def one_fit():
        pca = (
            SparsePCABuilder()
            .n_components(k)
            .svd_method(SVDMethod.random(10, 7, PowerIterationNormalizer.QR))
            .random_seed(seed)
            .build()
        )
        t1 = time.perf_counter()
        pca.fit(m)
        jax.device_get(
            (pca.components_, pca.explained_variance_, pca.mean_)
        )
        return time.perf_counter() - t1, pca

    cold_s, pca = one_fit()
    _log(f"cold fit {cold_s:.1f}s")
    warms = [one_fit()[0] for _ in range(3)]
    warm_fit_s = min(warms)
    # warm INCLUDING the Gram/data pass: drop the per-matrix Gram cache
    ops_cache = getattr(m, "_operator_cache", {})
    op = ops_cache.get("gram") or next(iter(ops_cache.values()), None)
    fulls = []
    for _ in range(2):
        if op is not None and hasattr(op, "_gram_cache"):
            del op._gram_cache
        dt, pca = one_fit()
        fulls.append(dt)
    warm_full_s = min(fulls)
    engine = type(op).__name__ if op is not None else "?"

    # per-fit device cost under pipelined dispatch (same protocol as
    # bench.py's headline): enqueue several solve graphs back-to-back and
    # sync once — tunnel RTTs + state pulls amortize away, leaving what a
    # production host sees across refits/seed sweeps
    pipelined_s = None
    if type(op).__name__ == "GramPCAEngine":
        from single_algebra_tpu.linalg.gram import gram_pca_graph

        G = op.gram_cached()
        reps = 4

        def enqueue():
            return [
                gram_pca_graph(
                    op, G, pca.mean_, seed + 1 + i, k=k,
                    center_svd=True, center_T=True, want_transform=False,
                )
                for i in range(reps)
            ]

        outs = enqueue()
        jax.block_until_ready([o[0] for o in outs])  # compile
        t1 = time.perf_counter()
        outs = enqueue()
        jax.block_until_ready([o[0] for o in outs])
        pipelined_s = (time.perf_counter() - t1) / reps
        _log(f"pipelined device graph: {pipelined_s:.3f}s/fit (x{reps})")
        del outs, G  # free the device refs before later engine builds

    out = dict(
        load_s=load_s, cold_s=cold_s, warm_fit_s=warm_fit_s,
        warm_full_s=warm_full_s,
        ev=np.asarray(pca.explained_variance_, np.float64), engine=engine,
    )
    if pipelined_s is not None:
        out["warm_fit_pipelined_s"] = pipelined_s

    # high-accuracy solve probe (gram engines): if the EV error shrinks
    # with a larger sketch/power budget, the default-row error is solve
    # CONVERGENCE on the planted spectrum's near-degenerate tail, not an
    # f32 floor — and the row can say so with numbers
    if type(op).__name__ == "GramPCAEngine":
        def hi_fit():
            p_hi = (
                SparsePCABuilder()
                .n_components(k)
                .svd_method(
                    SVDMethod.random(100, 12, PowerIterationNormalizer.QR)
                )
                .random_seed(seed)
                .engine("gram")
                .build()
            )
            t1 = time.perf_counter()
            p_hi.fit(m)
            jax.device_get(p_hi.explained_variance_)
            return time.perf_counter() - t1, p_hi

        _, p_hi = hi_fit()  # compile
        hi_s, p_hi = hi_fit()
        out["warm_fit_hiacc_s"] = hi_s
        out["ev_hiacc"] = np.asarray(p_hi.explained_variance_, np.float64)

    # NOTE (round 4): a "first-fit promotion" measurement block lived
    # here while 'auto' promoted a fresh gram-class matrix's first
    # randomized fit to the tiled sketch engine. The measurements it
    # produced (warm_first 103 s incl. payload rebuild, EV rel err
    # 1.2e-3 vs the Gram's 2.1e-6, ~500 s tiled-fit-graph compile) are
    # what got the promotion REMOVED — for gram-class matrices the
    # first fit IS warm_full_s (one exact data pass + solve).
    return out


def main():
    import bench as bench_mod
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=list(SHAPES))
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument(
        "--prep-only", action="store_true",
        help="build + cache the matrix, f64 truth, and 1-core CPU "
        "baseline, then exit without touching the TPU (the CPU-bound "
        "half, runnable in the background on this 1-core host)",
    )
    args = ap.parse_args()

    rows = []
    for name in args.shapes:
        cfg = SHAPES[name]
        _log(f"=== {name}: {cfg}")
        X = matrix_cached(name, cfg)
        _log(f"{name}: nnz={X.nnz} ({X.nnz / cfg['n'] / cfg['p']:.4f})")
        ev_ref = host_truth_ev(X, cfg["k"], name)
        if args.prep_only:
            key = (
                f"planted:{name}:{cfg['n']}x{cfg['p']}x{cfg['seed']}"
                f":{X.nnz}"
            )
            cpu = cpu_reference(X, cfg["k"], key)
            _log(f"{name}: prep done, cpu={json.dumps(cpu)}")
            del X
            continue

        r = tpu_fit(X, cfg["k"], cfg["seed"])
        ev = r.pop("ev")[: len(ev_ref)]
        ev_rel_err = float(np.abs(ev - ev_ref).max() / ev_ref[0])
        ev_hi = r.pop("ev_hiacc", None)
        if ev_hi is not None:
            r["ev_rel_err_hiacc"] = float(
                np.abs(ev_hi[: len(ev_ref)] - ev_ref).max() / ev_ref[0]
            )

        row = dict(
            shape=name, n=cfg["n"], p=cfg["p"], nnz=int(X.nnz),
            k=cfg["k"], backend=str(jax.devices()[0].device_kind),
            planted_spectrum=True, ev_rel_err=ev_rel_err, **{
                # never round error figures — a 4-dp round turns a
                # ~1e-6-class ev_rel_err into a meaningless 0.0
                k2: (
                    round(v, 4)
                    if isinstance(v, float) and not k2.startswith("ev_")
                    else v
                )
                for k2, v in r.items()
            },
        )
        if not args.skip_cpu:
            key = (
                f"planted:{name}:{cfg['n']}x{cfg['p']}x{cfg['seed']}"
                f":{X.nnz}"
            )
            cpu = cpu_reference(X, cfg["k"], key)
            p64 = bench_mod.project_64core(cpu["spmm_s"], cpu["dense_s"])
            row.update(
                cpu_1core_s=round(cpu["total_1core_s"], 1),
                cpu_64core_projected_s=round(p64, 2),
                vs_1core=round(cpu["total_1core_s"] / r["warm_fit_s"], 1),
                vs_64core=round(p64 / r["warm_fit_s"], 2),
                vs_64core_full=round(p64 / r["warm_full_s"], 2),
            )
            if "warm_fit_pipelined_s" in r:
                row["vs_64core_pipelined"] = round(
                    p64 / r["warm_fit_pipelined_s"], 2
                )
        rows.append(row)
        _log(json.dumps(row))
        del X

    if args.prep_only:
        print(json.dumps({"prep_done": args.shapes}))
        return

    path = os.path.join(HERE, "results_large_tpu.json")
    if os.path.exists(path):  # merge: keep rows for shapes not re-run
        try:
            old = json.load(open(path)).get("rows", [])
            done = {r["shape"] for r in rows}
            rows = rows + [
                r for r in old if r.get("shape") not in done
            ]
        except Exception:
            pass

    out = dict(
        note=(
            "flagship shapes, PLANTED gapped spectra; ev_rel_err vs host "
            "f64 sparse-Gram truth; vs_64core uses the documented "
            "CPU-favoring projection (BASELINE.md); warm_fit = operator+"
            "Gram cached (repeated-fit path), warm_full = Gram re-computed "
            "(one full data pass + solve + projection)"
        ),
        rows=rows,
    )
    path = os.path.join(HERE, "results_large_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "rows": len(rows)}))


if __name__ == "__main__":
    main()
