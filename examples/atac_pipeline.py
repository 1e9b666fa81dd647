"""scATAC-seq workflow: peaks matrix -> TF-IDF -> LSI -> graph -> layout.

The Signac/muon chromatin-accessibility pipeline, end to end on this
framework:

  binary-ish peak counts -> QC filter -> TF-IDF (preprocess.tfidf) ->
  LSI with the depth component dropped (models.lsi) -> cosine kNN graph
  (the Signac convention for LSI space) -> leiden -> ForceAtlas2 layout
  (models.draw_graph) -> integration metrics on the embedding.

Run: python examples/atac_pipeline.py [--cells 20000] [--peaks 30000]
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

from single_algebra_tpu import SparseMatrix  # noqa: E402
from single_algebra_tpu.cluster import leiden  # noqa: E402
from single_algebra_tpu.metrics import (  # noqa: E402
    adjusted_rand_index,
    silhouette_score,
)
from single_algebra_tpu.models import draw_graph, lsi  # noqa: E402
from single_algebra_tpu.neighbors import connectivities  # noqa: E402
from single_algebra_tpu.qc import filter_cells, filter_genes  # noqa: E402


def synthetic_atac(n, p, n_types=5, seed=0):
    """Sparse binary-ish accessibility with per-type open-peak programs
    and a strong per-cell depth gradient (what LSI's first component
    soaks up)."""

    rng = np.random.default_rng(seed)
    programs = rng.random((n_types, p)) < 0.15  # type-specific open peaks
    shared = rng.random(p) < 0.015  # housekeeping-like peaks
    labels = rng.integers(0, n_types, n)
    depth = rng.lognormal(0.0, 0.6, n)  # per-cell coverage
    rows, cols = [], []
    for i in range(n):
        open_p = programs[labels[i]] | shared
        rate = 0.35 * depth[i]
        hit = np.where(open_p & (rng.random(p) < rate))[0]
        rows.append(np.full(len(hit), i))
        cols.append(hit)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    X = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, p)
    ).tocsr()
    return X, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=20000)
    ap.add_argument("--peaks", type=int, default=30000)
    args = ap.parse_args()

    t0 = time.time()
    X, labels = synthetic_atac(args.cells, args.peaks)
    print(f"[{time.time()-t0:6.1f}s] synthetic ATAC: {X.shape}, "
          f"{X.nnz/1e6:.1f}M nnz")

    m = SparseMatrix.from_scipy(X)
    m, cell_mask = filter_cells(m, min_genes=20)
    m, peak_mask = filter_genes(m, min_cells=5)
    labels = labels[np.asarray(cell_mask, bool)]
    print(f"[{time.time()-t0:6.1f}s] QC: kept {m.shape} "
          f"({int(cell_mask.sum())} cells, {int(peak_mask.sum())} peaks)")

    res = lsi(m, n_components=30)  # tfidf inside; drop_first by default
    print(f"[{time.time()-t0:6.1f}s] LSI: {res.scores.shape}, "
          f"sv head {np.round(res.singular_values[:3], 1)}")

    S = connectivities(res.scores, 15, metric="cosine")
    clust = leiden(S, resolution=0.5, seed=0)
    ari = adjusted_rand_index(labels, clust.labels)
    print(f"[{time.time()-t0:6.1f}s] leiden: "
          f"{len(np.unique(clust.labels))} clusters, ARI vs planted "
          f"types {ari:.3f}")

    pos = draw_graph(S, n_iter=1000, seed=0)
    cents = np.stack([pos[labels == c].mean(0) for c in range(5)])
    within = np.mean(
        [np.linalg.norm(pos[labels == c] - cents[c], axis=1).mean()
         for c in range(5)]
    )
    dc = np.linalg.norm(cents[:, None] - cents[None, :], axis=-1)
    ratio = dc[np.triu_indices(5, 1)].min() / within
    print(f"[{time.time()-t0:6.1f}s] ForceAtlas2 layout: "
          f"type separation (min centroid gap / within spread) {ratio:.2f}")

    assert ari > 0.9, "clustering should recover the planted programs"
    print("atac pipeline OK")


if __name__ == "__main__":
    main()
