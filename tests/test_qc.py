"""QC metrics: golden values vs dense numpy, qc_vars gene subsets,
validation; plus the 10x mtx reader."""

import gzip
import os

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.qc import calculate_qc_metrics


def counts(n=200, p=80, seed=0):
    rng = np.random.default_rng(seed)
    return sp.random(
        n, p, density=0.15, format="csr", dtype=np.float64,
        random_state=rng,
        data_rvs=lambda size: (rng.poisson(3.0, size) + 1).astype(np.float64),
    ).astype(np.float32)


def test_qc_golden_vs_dense():
    X = counts()
    d = X.toarray()
    m = SparseMatrix.from_scipy(X)
    mito = np.zeros(80, bool)
    mito[:7] = True
    obs, var = calculate_qc_metrics(m, qc_vars={"mito": mito})

    np.testing.assert_array_equal(
        obs["n_genes_by_counts"], (d > 0).sum(axis=1)
    )
    np.testing.assert_allclose(obs["total_counts"], d.sum(axis=1), rtol=1e-6)
    np.testing.assert_allclose(
        obs["total_counts_mito"], d[:, mito].sum(axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(
        obs["pct_counts_mito"],
        100.0 * d[:, mito].sum(axis=1) / np.maximum(d.sum(axis=1), 1e-30),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        var["n_cells_by_counts"], (d > 0).sum(axis=0)
    )
    np.testing.assert_allclose(var["mean_counts"], d.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(
        var["pct_dropout_by_counts"],
        100.0 * (1 - (d > 0).mean(axis=0)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        obs["log1p_total_counts"], np.log1p(d.sum(axis=1)), rtol=1e-6
    )


def test_qc_matches_scanpy_formulas_no_log():
    X = counts(seed=1)
    m = SparseMatrix.from_scipy(X)
    obs, var = calculate_qc_metrics(m, log1p=False)
    assert "log1p_total_counts" not in obs
    assert "log1p_mean_counts" not in var


def test_qc_validation():
    m = SparseMatrix.from_scipy(counts(n=10, p=6, seed=2))
    with pytest.raises(ValueError, match="bool mask"):
        calculate_qc_metrics(m, qc_vars={"bad": np.zeros(5, bool)})
    with pytest.raises(ValueError, match="bool mask"):
        calculate_qc_metrics(m, qc_vars={"bad": np.zeros(6, np.int32)})


def test_read_10x_mtx(tmp_path):
    import scipy.io as sio

    from single_algebra_tpu.io import read_10x_mtx

    X = counts(n=30, p=12, seed=3)  # cells x genes
    d = str(tmp_path)
    # 10x layout: genes x cells, gzipped
    with gzip.open(os.path.join(d, "matrix.mtx.gz"), "wb") as f:
        sio.mmwrite(f, X.T.tocoo())
    with gzip.open(os.path.join(d, "barcodes.tsv.gz"), "wt") as f:
        f.write("".join(f"BC{i:04d}-1\n" for i in range(30)))
    with gzip.open(os.path.join(d, "features.tsv.gz"), "wt") as f:
        f.write(
            "".join(
                f"ENSG{i:05d}\tGene{i}\tGene Expression\n" for i in range(12)
            )
        )
    ad = read_10x_mtx(d, device=False)
    assert ad.shape == (30, 12)
    np.testing.assert_allclose(
        ad.X.to_scipy().toarray(), X.toarray(), rtol=1e-6
    )
    assert ad.obs_names[2] == "BC0002-1"
    assert ad.var_names[3] == "Gene3"
    assert ad.var["gene_ids"][3] == "ENSG00003"
    assert ad.var["feature_types"][0] == "Gene Expression"


def test_read_10x_mtx_legacy_genes(tmp_path):
    import scipy.io as sio

    from single_algebra_tpu.io import read_10x_mtx

    X = counts(n=8, p=5, seed=4)
    d = str(tmp_path)
    with open(os.path.join(d, "matrix.mtx"), "wb") as f:
        sio.mmwrite(f, X.T.tocoo())
    with open(os.path.join(d, "barcodes.tsv"), "w") as f:
        f.write("".join(f"B{i}\n" for i in range(8)))
    with open(os.path.join(d, "genes.tsv"), "w") as f:  # legacy name
        f.write("".join(f"G{i}\tName{i}\n" for i in range(5)))
    ad = read_10x_mtx(d, device=False)
    assert ad.shape == (8, 5)
    assert ad.var_names[1] == "Name1"


def test_read_10x_missing_file(tmp_path):
    from single_algebra_tpu.io import read_10x_mtx

    with pytest.raises(FileNotFoundError, match="matrix.mtx"):
        read_10x_mtx(str(tmp_path))


# ----------------------------------------------------------------------
# selection + filtering
# ----------------------------------------------------------------------


def _rand(n=120, p=50, seed=0, fmt="csr"):
    rng = np.random.default_rng(seed)
    X = sp.random(
        n, p, density=0.15, format=fmt, dtype=np.float32,
        random_state=rng, data_rvs=lambda s: rng.integers(1, 9, s).astype(np.float32),
    )
    return X


@pytest.mark.parametrize("fmt", ["csr", "csc"])
def test_select_rows_and_cols(fmt):
    X = _rand(fmt=fmt)
    m = SparseMatrix.from_scipy(X)
    rows = np.array([5, 3, 40, 7])
    cols = np.array([0, 49, 10])
    np.testing.assert_array_equal(
        m.select_rows(rows).to_dense(), X.toarray()[rows]
    )
    np.testing.assert_array_equal(
        m.select_cols(cols).to_dense(), X.toarray()[:, cols]
    )
    mask = np.zeros(X.shape[0], bool)
    mask[::3] = True
    got = m.select_rows(mask)
    np.testing.assert_array_equal(got.to_dense(), X.toarray()[mask])
    assert got.format == fmt  # format preserved


def test_select_validation():
    X = _rand()
    m = SparseMatrix.from_scipy(X)
    with pytest.raises(ValueError, match="Mask length"):
        m.select_rows(np.ones(3, bool))
    with pytest.raises(ValueError, match="indices must be in"):
        m.select_cols(np.array([1000]))


def test_filter_cells_thresholds():
    from single_algebra_tpu.qc import filter_cells

    X = _rand(seed=1)
    m = SparseMatrix.from_scipy(X)
    Xd = X.toarray()
    sub, keep = filter_cells(m, min_genes=5, max_counts=60.0)
    ref = ((Xd > 0).sum(1) >= 5) & (Xd.sum(1) <= 60.0)
    np.testing.assert_array_equal(keep, ref)
    np.testing.assert_array_equal(sub.to_dense(), Xd[ref])
    assert sub.shape == (ref.sum(), X.shape[1])


def test_filter_genes_thresholds():
    from single_algebra_tpu.qc import filter_genes

    X = _rand(seed=2)
    m = SparseMatrix.from_scipy(X)
    Xd = X.toarray()
    sub, keep = filter_genes(m, min_cells=3, min_counts=10.0)
    ref = ((Xd > 0).sum(0) >= 3) & (Xd.sum(0) >= 10.0)
    np.testing.assert_array_equal(keep, ref)
    np.testing.assert_array_equal(sub.to_dense(), Xd[:, ref])


def test_filter_then_stats_consistency():
    """Stats of the filtered matrix match numpy on the subset."""

    from single_algebra_tpu.qc import filter_cells

    X = _rand(seed=3)
    m = SparseMatrix.from_scipy(X)
    sub, keep = filter_cells(m, min_counts=20.0)
    np.testing.assert_allclose(
        np.asarray(sub.sum_row()), X.toarray()[keep].sum(1), rtol=1e-6
    )


def test_select_empty_and_full():
    X = _rand(seed=4)
    m = SparseMatrix.from_scipy(X)
    none = m.select_rows(np.zeros(X.shape[0], bool))
    assert none.shape == (0, X.shape[1]) and none.nnz == 0
    allr = m.select_rows(np.ones(X.shape[0], bool))
    np.testing.assert_array_equal(allr.to_dense(), X.toarray())
    nonec = m.select_cols(np.zeros(X.shape[1], bool))
    assert nonec.shape == (X.shape[0], 0)
    # duplicate + reordered indices are honored in order
    dup = m.select_rows(np.array([3, 3, 1]))
    np.testing.assert_array_equal(dup.to_dense(), X.toarray()[[3, 3, 1]])


def test_pipeline_h5ad_roundtrip():
    """QC + embedding results ride obs/obsm through write/read_h5ad."""

    import tempfile, os
    from single_algebra_tpu.io import read_h5ad, write_h5ad
    from single_algebra_tpu.qc import calculate_qc_metrics

    X = _rand(seed=5)
    m = SparseMatrix.from_scipy(X)
    obs, var = calculate_qc_metrics(m, log1p=False)
    emb = np.random.default_rng(0).normal(0, 1, (X.shape[0], 7)).astype(np.float32)
    path = os.path.join(tempfile.mkdtemp(), "out.h5ad")
    write_h5ad(
        path, X,
        obs={"total_counts": obs["total_counts"],
             "n_genes": obs["n_genes_by_counts"]},
        var={"n_cells": var["n_cells_by_counts"]},
        obsm={"X_pca": emb},
    )
    ad = read_h5ad(path)
    np.testing.assert_allclose(ad.obs["total_counts"], obs["total_counts"])
    np.testing.assert_array_equal(ad.var["n_cells"], var["n_cells_by_counts"])
    np.testing.assert_allclose(ad.obsm["X_pca"], emb)
    np.testing.assert_array_equal(ad.X.to_dense(), X.toarray())
