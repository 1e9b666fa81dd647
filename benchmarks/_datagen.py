"""Shared planted-spectrum data generators for the benchmark suite.

One source of truth for the gamma/geomspace/poisson cluster recipe
(mirrors ``tests/conftest.py::cluster_counts`` — keep the two in sync:
the tests validate exactly the structure the benchmarks measure).
"""

from __future__ import annotations

import time

import numpy as np
import scipy.sparse as sp


def _cluster_rates(n_clusters, p, rng, density):
    base = rng.gamma(2.0, 1.0, size=(n_clusters, p)) * (
        rng.random((n_clusters, p)) < 0.5
    )
    scale = np.geomspace(8, 1, n_clusters)[:, None]
    return base * scale * (density / max(base.mean(), 1e-9))


def cluster_counts(n, p, n_clusters=16, seed=0, density=0.03):
    """Dense-sampled gapped-spectrum counts (small/medium shapes)."""

    rng = np.random.default_rng(seed)
    lam = _cluster_rates(n_clusters, p, rng, density)
    labels = rng.integers(0, n_clusters, n)
    X = rng.poisson(lam[labels]).astype(np.float64)
    return sp.csr_matrix(X)


def cluster_counts_big(
    n, p, n_clusters=16, seed=0, density=0.01, log=None
):
    """Planted-spectrum counts at flagship scale, sampled SPARSELY.

    Only the ~density*n*p nonzero entries are ever drawn (dense
    per-element poisson at 10M x 2,500 would be 2.5e10 draws — ~40
    minutes): per cluster, per-column nonzero counts ~
    Binomial(n_c, 1 - exp(-lam)), positions uniform, values
    1 + Poisson(lam); lam is calibrated so the REALIZED nonzero fraction
    hits ``density`` (uncalibrated, heavy clusters saturate ~3x over).
    Rows are grouped by cluster (order is irrelevant to spectra, CPU
    timing, and the engines).
    """

    log = log or (lambda *_: None)
    rng = np.random.default_rng(seed)
    lam = _cluster_rates(n_clusters, p, rng, density).astype(np.float64)
    lo, hi = 0.0, 1.0
    while np.mean(-np.expm1(-hi * lam)) < density:
        hi *= 2
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        if np.mean(-np.expm1(-mid * lam)) < density:
            lo = mid
        else:
            hi = mid
    lam *= 0.5 * (lo + hi)
    sizes = np.full(n_clusters, n // n_clusters, np.int64)
    sizes[: n % n_clusters] += 1
    t0 = time.time()
    blocks = []
    r_off = 0
    for c in range(n_clusters):
        n_c = int(sizes[c])
        lam_c = lam[c]
        p1 = -np.expm1(-lam_c)  # P(count >= 1) per column
        counts = rng.binomial(n_c, p1)
        total = int(counts.sum())
        cols = np.repeat(np.arange(p, dtype=np.int32), counts)
        rows = rng.integers(0, n_c, total, dtype=np.int64) + r_off
        vals = (1 + rng.poisson(np.repeat(lam_c, counts))).astype(
            np.float32
        )
        blocks.append((rows, cols, vals))
        r_off += n_c
        log(f"gen cluster {c + 1}/{n_clusters} ({time.time() - t0:.0f}s)")
    rows = np.concatenate([b[0] for b in blocks])
    cols = np.concatenate([b[1] for b in blocks])
    vals = np.concatenate([b[2] for b in blocks])
    X = sp.coo_matrix((vals, (rows, cols)), shape=(n, p)).tocsr()
    log(f"gen assembled in {time.time() - t0:.0f}s")
    return X
