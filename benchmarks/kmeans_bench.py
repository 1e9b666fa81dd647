"""KMeans on-chip benchmark vs measured sklearn on this host.

Two workloads:
  (a) post-PCA embedding clustering — the pipeline stage the reference's
      similarity kernels feed (BASELINE.json graded #5 "over PCA
      embeddings for clustering"): 200k x 50 f32, k=12, planted clusters.
  (b) direct sparse-matrix clustering (no densify; rides the ELL SpMM):
      100k x 2,000 d=0.05, k=8.

Both sides run Lloyd + k-means++ with one init and the same tol/max_iter;
quality is compared by final inertia ratio (TPU / sklearn, ~1.0 means the
same local optimum class) and planted-label purity. The sklearn side is
measured on this host (single core — its Lloyd is threaded but the host
has 1 CPU; labeled as such).

Writes benchmarks/results_kmeans_tpu.json.
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

SEED = 3


def planted_embedding(n, d, k, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 4.0, (k, d))
    lab = rng.integers(0, k, n)
    X = (centers[lab] + rng.normal(0, 1.0, (n, d))).astype(np.float32)
    return X, lab


def planted_sparse(n, p, k, density, seed):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    centers = rng.gamma(2.0, 2.0, (k, p)) * (rng.random((k, p)) < density * 3)
    lab = rng.integers(0, k, n)
    lam = centers[lab]
    X = sp.csr_matrix(rng.poisson(lam).astype(np.float32))
    return X, lab


def purity(lab, pred, k):
    return sum(
        np.bincount(lab[pred == c]).max() for c in range(k) if (pred == c).any()
    ) / len(lab)


def run_tpu(X, k, warmup=True):
    import jax

    from single_algebra_tpu.models import KMeans

    km = KMeans(k, n_init=1, random_seed=SEED, max_iter=300, tol=1e-4)
    if warmup:
        t0 = time.perf_counter()
        km.fit(X)
        cold = time.perf_counter() - t0
    else:
        cold = None
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        km.fit(X)
        np.asarray(km.labels_[:1])
        times.append(time.perf_counter() - t0)
    return km, min(times), cold


def run_sklearn(X, k):
    from sklearn.cluster import KMeans as SkKMeans

    t0 = time.perf_counter()
    sk = SkKMeans(
        n_clusters=k, init="k-means++", n_init=1, max_iter=300, tol=1e-4,
        random_state=SEED, algorithm="lloyd",
    ).fit(X)
    return sk, time.perf_counter() - t0


def main():
    rows = []

    # --- (a) embedding workload -----------------------------------------
    n, d, k = 200_000, 50, 12
    E, lab = planted_embedding(n, d, k, SEED)
    print(f"[kmeans] embedding {E.shape} k={k}", file=sys.stderr, flush=True)
    km, warm, cold = run_tpu(E, k)
    pred = np.asarray(km.labels_)
    sk, sk_s = run_sklearn(E, k)
    rows.append(
        {
            "workload": "embedding_200k_x_50_k12",
            "backend": "tpu",
            "warm_fit_s": round(warm, 4),
            "cold_fit_s": round(cold, 2),
            "n_iter": int(km.n_iter_),
            "inertia": float(km.inertia_),
            "purity": round(purity(lab, pred, k), 4),
            "sklearn_1core_s": round(sk_s, 3),
            "sklearn_inertia": float(sk.inertia_),
            "sklearn_purity": round(purity(lab, sk.labels_, k), 4),
            "inertia_ratio": round(float(km.inertia_) / float(sk.inertia_), 6),
            "speedup_vs_sklearn_1core": round(sk_s / warm, 2),
        }
    )
    print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    # --- (b) sparse workload ---------------------------------------------
    n, p, k, density = 100_000, 2_000, 8, 0.05
    X, lab = planted_sparse(n, p, k, density, SEED + 1)
    print(
        f"[kmeans] sparse {X.shape} nnz={X.nnz} k={k}",
        file=sys.stderr,
        flush=True,
    )
    from single_algebra_tpu import SparseMatrix

    m = SparseMatrix.from_scipy(X)
    km, warm, cold = run_tpu(m, k)
    pred = np.asarray(km.labels_)
    # sklearn supports sparse input directly (same algorithm)
    sk, sk_s = run_sklearn(X, k)
    rows.append(
        {
            "workload": "sparse_100k_x_2000_d0.05_k8",
            "backend": "tpu",
            "warm_fit_s": round(warm, 4),
            "cold_fit_s": round(cold, 2),
            "n_iter": int(km.n_iter_),
            "inertia": float(km.inertia_),
            "purity": round(purity(lab, pred, k), 4),
            "sklearn_1core_s": round(sk_s, 3),
            "sklearn_inertia": float(sk.inertia_),
            "sklearn_purity": round(purity(lab, sk.labels_, k), 4),
            "inertia_ratio": round(float(km.inertia_) / float(sk.inertia_), 6),
            "speedup_vs_sklearn_1core": round(sk_s / warm, 2),
        }
    )
    print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_kmeans_tpu.json")
    with open(out, "w") as f:
        json.dump({"seed": SEED, "rows": rows}, f, indent=1)
    print(f"[kmeans] wrote {out}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
