"""Native Leiden throughput benchmark (host-side; no TPU needed).

Synthetic kNN-like graph with planted communities; measures the C++
core end to end (CSR in, labels out) and records ARI vs the plant.

Run: python benchmarks/leiden_bench.py [--nodes 500000]
Writes/updates benchmarks/results_host_tools.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from single_algebra_tpu.cluster import leiden  # noqa: E402
from single_algebra_tpu.metrics import adjusted_rand_index  # noqa: E402


def planted_graph(n: int, n_comm: int, k: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    comm = rng.integers(0, n_comm, n)
    rows, cols = [], []
    for c in range(n_comm):
        idx = np.where(comm == c)[0]
        a = rng.choice(idx, k * len(idx))
        b = rng.choice(idx, len(a))
        rows.append(a)
        cols.append(b)
    a = rng.integers(0, n, n // 10)
    b = rng.integers(0, n, n // 10)
    rows.append(a)
    cols.append(b)
    W = sp.coo_matrix(
        (
            np.ones(sum(len(x) for x in rows), np.float32),
            (np.concatenate(rows), np.concatenate(cols)),
        ),
        shape=(n, n),
    ).tocsr()
    W = W + W.T
    W.sum_duplicates()
    return W, comm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--communities", type=int, default=50)
    ap.add_argument("--k", type=int, default=7)
    args = ap.parse_args()

    W, comm = planted_graph(args.nodes, args.communities, args.k)
    t0 = time.perf_counter()
    res = leiden(W, seed=0)
    wall = time.perf_counter() - t0
    ari = float(adjusted_rand_index(comm, res.labels))
    row = {
        "tool": "leiden",
        "backend": res.backend,
        "n_nodes": args.nodes,
        "n_edges": int(W.nnz),
        "wall_s": round(wall, 3),
        "edges_per_s": round(W.nnz / wall),
        "ari_vs_planted": round(ari, 4),
        "n_communities": res.n_communities,
        "quality": round(res.quality, 4),
    }
    print(json.dumps(row))
    out = os.path.join(os.path.dirname(__file__), "results_host_tools.json")
    rows = []
    if os.path.exists(out):
        rows = json.load(open(out))
    rows = [r for r in rows if not (
        r.get("tool") == "leiden" and r.get("n_nodes") == args.nodes
    )]
    rows.append(row)
    json.dump(rows, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
