"""Batch-integration workflow: two 'sequencing runs' of the same tissue.

The cross-sample analysis every atlas project runs, end to end on this
framework:

  per-batch counts -> QC filter -> normalize + log1p -> HVG (batch-
  aware) -> masked PCA -> Harmony (embedding integration) ->
  leiden + paga on the corrected graph -> marker genes per cluster
  (+ ComBat shown as the expression-space alternative).

Run: python examples/integration.py [--cells-per-batch 15000]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import scipy.sparse as sp  # noqa: E402

from single_algebra_tpu import (  # noqa: E402
    Direction,
    SparseMatrix,
    calculate_qc_metrics,
    highly_variable_genes,
    leiden,
    neighbors,
    rank_genes_groups,
)
from single_algebra_tpu.cluster import paga  # noqa: E402
from single_algebra_tpu.metrics import adjusted_rand_index  # noqa: E402
from single_algebra_tpu.models import (  # noqa: E402
    MaskedSparsePCABuilder,
    harmony,
)
from single_algebra_tpu.qc import filter_cells  # noqa: E402


def two_batch_counts(n_per, n_genes, n_types=8, seed=0):
    """Same cell types, batch-specific capture efficiency + offsets."""

    rng = np.random.default_rng(seed)
    programs = rng.gamma(2.0, 1.0, (n_types, n_genes)) * (
        rng.random((n_types, n_genes)) < 0.35
    )
    batch_effect = rng.gamma(2.0, 0.5, (2, n_genes))  # per-gene capture
    Xs, types, batches = [], [], []
    for b in range(2):
        lab = rng.integers(0, n_types, n_per)
        rates = programs[lab] * batch_effect[b] * 0.1
        Xs.append(sp.csr_matrix(rng.poisson(rates).astype(np.float32)))
        types.append(lab)
        batches.append(np.full(n_per, f"run{b}"))
    return (
        sp.vstack(Xs).tocsr(),
        np.concatenate(types),
        np.concatenate(batches),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells-per-batch", type=int, default=10_000)
    ap.add_argument("--genes", type=int, default=5_000)
    args = ap.parse_args()
    t00 = time.perf_counter()

    def stamp(msg):
        print(f"[{time.perf_counter() - t00:7.2f}s] {msg}", flush=True)

    X, types, batches = two_batch_counts(args.cells_per_batch, args.genes)
    m = SparseMatrix.from_scipy(X)
    stamp(f"counts {X.shape} across 2 runs, {X.nnz} UMIs")

    obs, _ = calculate_qc_metrics(m, log1p=False)
    m, keep = filter_cells(m, min_genes=10)
    types, batches = types[keep], batches[keep]
    stamp(f"QC filter: kept {keep.sum()}/{len(keep)} cells")

    sums = np.asarray(m.sum_row())
    norm = m.normalize(sums, 1e4, Direction.ROW).log1p_normalize()
    hvg = highly_variable_genes(
        norm, n_top_genes=1_500, batches=batches.tolist()
    )
    stamp(f"batch-aware HVG: {hvg.n_selected} genes")

    pca = MaskedSparsePCABuilder().mask(hvg.mask).n_components(50).build()
    E = np.asarray(pca.fit_transform(norm), np.float32)
    stamp(f"masked PCA embedding {E.shape}")

    S0 = neighbors.connectivities(E, 15)
    r0 = leiden(S0, resolution=0.5, seed=0)
    ari0 = adjusted_rand_index(types, r0.labels)

    res = harmony(E, batches.tolist(), seed=0)
    Ec = res.embedding.astype(np.float32)
    stamp(
        f"harmony: {res.n_rounds} rounds, converged={res.converged}"
    )

    S1 = neighbors.connectivities(Ec, 15)
    r1 = leiden(S1, resolution=0.5, seed=0)
    ari1 = adjusted_rand_index(types, r1.labels)
    stamp(
        f"leiden ARI vs planted types: {ari0:.3f} (raw) -> "
        f"{ari1:.3f} (integrated), {r1.n_communities} communities"
    )

    conn = paga(S1, r1.labels)
    stamp(
        f"paga cluster graph: {(conn > 0.1).sum() // 2} strong edges "
        f"among {conn.shape[0]} clusters"
    )

    de = rank_genes_groups(
        norm, [f"c{l}" for l in r1.labels], method="wilcoxon", n_genes=5
    )
    big = f"c{np.bincount(r1.labels).argmax()}"
    stamp(
        f"markers of {big}: {list(de.names[big])} "
        f"(min padj {de.pvals_adj[big].min():.1e})"
    )
    stamp("integration workflow complete")


if __name__ == "__main__":
    main()
