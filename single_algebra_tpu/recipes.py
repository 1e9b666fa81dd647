"""One-call preprocessing recipes (scanpy ``pp.recipe_*`` role).

Each recipe chains this library's stages into the published order and
returns the model-ready matrix plus the masks/stats produced along the
way, so a user can reproduce a standard workflow in one line:

    Z, info = recipe_zheng17(m)          # dense [n, 1000], scaled
    E = SparsePCABuilder()...fit_transform(...)  # or PCA directly on Z
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["recipe_zheng17"]


def recipe_zheng17(
    m,
    *,
    n_top_genes: int = 1000,
    log: bool = True,
    scale_max: float = 10.0,
) -> Tuple[np.ndarray, Dict]:
    """Zheng et al. 2017 (10x 68k PBMC) preprocessing, scanpy order:

    1. drop zero-count genes,
    2. total-count normalize to the per-cell MEDIAN,
    3. CellRanger-flavor HVG ranking, keep ``n_top_genes``,
    4. subset + re-normalize the kept genes,
    5. log1p (``log=False`` skips, as scanpy allows),
    6. scale to unit variance, clipped at ``scale_max``.

    Returns ``(Z, info)``: Z a dense device array [n, n_top_genes]
    ready for PCA; info carries ``gene_mask`` (over the ORIGINAL
    columns), ``hvg`` (the HVGResult), and ``counts_mask`` from step 1.
    """

    from .feature_selection import highly_variable_genes
    from .preprocess import scale
    from .qc import filter_genes
    from .types import Direction

    n, p = m.shape
    kept, counts_mask = filter_genes(m, min_counts=1)

    sums = np.asarray(kept.sum_row())
    target = float(np.median(sums[sums > 0]))
    norm = kept.normalize(sums, target, Direction.ROW)

    hvg = highly_variable_genes(
        norm, n_top_genes=min(n_top_genes, kept.ncols),
        flavor="cell_ranger",
    )
    sub = norm.select_cols(hvg.mask)

    sums2 = np.asarray(sub.sum_row())
    target2 = float(np.median(sums2[sums2 > 0]))
    sub = sub.normalize(sums2, target2, Direction.ROW)
    if log:
        sub = sub.log1p_normalize()

    Z = scale(sub, max_value=scale_max)

    gene_mask = np.zeros(p, bool)
    gene_mask[np.where(counts_mask)[0][hvg.mask]] = True
    return Z, {
        "gene_mask": gene_mask,
        "hvg": hvg,
        "counts_mask": counts_mask,
        "target_sum": target,
    }
