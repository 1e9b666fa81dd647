"""Per-cell / per-gene QC metrics over the fused device reductions.

scanpy's ``pp.calculate_qc_metrics`` surface, computed with this
library's O(nnz) kernels (``nonzero_row`` / ``sum_row`` /
``sum_row_masked`` / column duals — reference trait parity ops,
``/root/reference/src/sparse/mod.rs:35-220``): the matrix never leaves
the device, only p- and n-length vectors reach the host.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

__all__ = ["calculate_qc_metrics", "filter_cells", "filter_genes"]


def calculate_qc_metrics(
    m,
    *,
    qc_vars: Optional[Mapping[str, np.ndarray]] = None,
    log1p: bool = True,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """QC metric frames for a cells x genes matrix of raw counts.

    Returns ``(obs, var)`` dicts of numpy arrays:

    obs (per cell): ``n_genes_by_counts``, ``total_counts``
    (+ ``log1p_*`` when ``log1p=True``), and per ``qc_vars`` entry
    ``total_counts_<name>`` / ``pct_counts_<name>`` (e.g. a mito gene
    mask -> ``pct_counts_mito``).

    var (per gene): ``n_cells_by_counts``, ``total_counts``,
    ``mean_counts``, ``pct_dropout_by_counts`` (+ log1p variants).

    ``qc_vars`` maps names to boolean GENE masks (length p) — the same
    masks :func:`highly_variable_genes` produces or plain name-prefix
    matches computed by the caller.
    """

    n, p = m.shape
    if n < 1 or p < 1:
        raise ValueError(f"Matrix has empty shape {m.shape}")

    obs: Dict[str, np.ndarray] = {}
    var: Dict[str, np.ndarray] = {}

    obs["n_genes_by_counts"] = np.asarray(m.nonzero_row())
    total = np.asarray(m.sum_row(), np.float64)
    obs["total_counts"] = total

    var["n_cells_by_counts"] = np.asarray(m.nonzero_col())
    gtotal = np.asarray(m.sum_col(), np.float64)
    var["total_counts"] = gtotal
    var["mean_counts"] = gtotal / n
    var["pct_dropout_by_counts"] = 100.0 * (
        1.0 - var["n_cells_by_counts"] / n
    )

    if log1p:
        obs["log1p_n_genes_by_counts"] = np.log1p(obs["n_genes_by_counts"])
        obs["log1p_total_counts"] = np.log1p(total)
        var["log1p_total_counts"] = np.log1p(gtotal)
        var["log1p_mean_counts"] = np.log1p(var["mean_counts"])

    denom = np.maximum(total, 1e-30)
    for name, mask in (qc_vars or {}).items():
        mask = np.asarray(mask)
        if mask.dtype != bool or mask.shape != (p,):
            raise ValueError(
                f"qc_vars[{name!r}] must be a bool mask of length {p}"
            )
        sub = np.asarray(m.sum_row_masked(mask), np.float64)
        obs[f"total_counts_{name}"] = sub
        obs[f"pct_counts_{name}"] = 100.0 * sub / denom
        if log1p:
            obs[f"log1p_total_counts_{name}"] = np.log1p(sub)

    return obs, var


def filter_cells(
    m,
    *,
    min_genes: Optional[int] = None,
    max_genes: Optional[int] = None,
    min_counts: Optional[float] = None,
    max_counts: Optional[float] = None,
):
    """Remove cells failing QC thresholds (scanpy ``pp.filter_cells``,
    all criteria combinable). Returns ``(filtered_matrix, keep_mask)``
    so callers can subset their metadata with the same mask. Thresholds
    come from the fused row reductions; the subset is one native
    O(kept nnz) extraction (``SparseMatrix.select_rows``).
    """

    n, _ = m.shape
    keep = np.ones(n, bool)
    if min_genes is not None or max_genes is not None:
        g = np.asarray(m.nonzero_row())
        if min_genes is not None:
            keep &= g >= min_genes
        if max_genes is not None:
            keep &= g <= max_genes
    if min_counts is not None or max_counts is not None:
        c = np.asarray(m.sum_row(), np.float64)
        if min_counts is not None:
            keep &= c >= min_counts
        if max_counts is not None:
            keep &= c <= max_counts
    return m.select_rows(keep), keep


def filter_genes(
    m,
    *,
    min_cells: Optional[int] = None,
    max_cells: Optional[int] = None,
    min_counts: Optional[float] = None,
    max_counts: Optional[float] = None,
):
    """Remove genes failing QC thresholds (scanpy ``pp.filter_genes``).
    Returns ``(filtered_matrix, keep_mask)``."""

    _, p = m.shape
    keep = np.ones(p, bool)
    if min_cells is not None or max_cells is not None:
        g = np.asarray(m.nonzero_col())
        if min_cells is not None:
            keep &= g >= min_cells
        if max_cells is not None:
            keep &= g <= max_cells
    if min_counts is not None or max_counts is not None:
        c = np.asarray(m.sum_col(), np.float64)
        if min_counts is not None:
            keep &= c >= min_counts
        if max_counts is not None:
            keep &= c <= max_counts
    return m.select_cols(keep), keep
