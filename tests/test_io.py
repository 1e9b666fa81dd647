"""h5ad IO: round-trip, anndata-encoding reads (incl. categoricals and
csc), streaming chunk iterator == full read, out-of-core pipeline."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.io import (
    iter_h5ad_chunks,
    read_h5ad,
    write_h5ad,
)


def counts(n=300, p=120, seed=0):
    rng = np.random.default_rng(seed)
    return sp.random(
        n, p, density=0.1, format="csr", dtype=np.float64,
        random_state=rng,
        data_rvs=lambda size: (rng.poisson(2.0, size) + 1).astype(np.float64),
    ).astype(np.float32)


def test_write_read_roundtrip(tmp_path):
    X = counts()
    path = str(tmp_path / "t.h5ad")
    emb = np.random.default_rng(1).standard_normal((300, 5)).astype(np.float32)
    write_h5ad(
        path,
        X,
        obs={"total": np.asarray(X.sum(axis=1)).ravel()},
        var={"gene_id": np.asarray([f"ENSG{i:05d}" for i in range(120)])},
        obsm={"X_pca": emb},
    )
    ad = read_h5ad(path, device=False)
    assert ad.shape == (300, 120)
    np.testing.assert_allclose(
        ad.X.to_scipy().toarray(), X.toarray(), rtol=1e-6
    )
    np.testing.assert_allclose(ad.obs["total"], np.asarray(X.sum(axis=1)).ravel())
    assert ad.var["gene_id"][3] == "ENSG00003"
    assert ad.obs_names[0] == "cell_0" and ad.var_names[-1] == "gene_119"
    np.testing.assert_allclose(ad.obsm["X_pca"], emb)


def test_reads_anndata_style_encoding(tmp_path):
    """Hand-built file mimicking anndata 0.8+ output: categorical obs
    column, csc X, custom index name."""

    import h5py

    X = counts(n=60, p=40, seed=2).tocsc()
    path = str(tmp_path / "sc.h5ad")
    with h5py.File(path, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csc_matrix"
        g.attrs["shape"] = np.asarray([60, 40], np.int64)
        g.create_dataset("data", data=X.data)
        g.create_dataset("indices", data=X.indices)
        g.create_dataset("indptr", data=X.indptr)
        obs = f.create_group("obs")
        obs.attrs["_index"] = "barcodes"
        obs.create_dataset(
            "barcodes",
            data=np.asarray(
                [f"AAAC-{i}" for i in range(60)], dtype=h5py.string_dtype()
            ),
        )
        cat = obs.create_group("cell_type")
        cat.attrs["encoding-type"] = "categorical"
        cat.create_dataset(
            "categories",
            data=np.asarray(["B", "T"], dtype=h5py.string_dtype()),
        )
        cat.create_dataset(
            "codes", data=(np.arange(60) % 2).astype(np.int8)
        )
    ad = read_h5ad(path, device=False)
    np.testing.assert_allclose(
        ad.X.to_scipy().toarray(), X.toarray(), rtol=1e-6
    )
    assert ad.obs_names[5] == "AAAC-5"
    assert list(ad.obs["cell_type"][:4]) == ["B", "T", "B", "T"]


def test_chunks_match_full_read(tmp_path):
    X = counts(n=257, p=60, seed=3)  # n not divisible by chunk
    path = str(tmp_path / "c.h5ad")
    write_h5ad(path, X)
    got = sp.vstack(list(iter_h5ad_chunks(path, chunk_rows=64))).tocsr()
    np.testing.assert_allclose(got.toarray(), X.toarray(), rtol=1e-6)
    # single big chunk, too
    (one,) = list(iter_h5ad_chunks(path, chunk_rows=10_000))
    np.testing.assert_allclose(one.toarray(), X.toarray(), rtol=1e-6)


def test_streaming_pipeline_from_disk(tmp_path):
    """h5ad chunks -> StreamingSparsePCA without loading X."""

    from single_algebra_tpu.models import StreamingSparsePCA

    X = counts(n=400, p=80, seed=4)
    path = str(tmp_path / "s.h5ad")
    write_h5ad(path, X)
    spca = StreamingSparsePCA(n_components=5, n_features=80, random_seed=0)
    for chunk in iter_h5ad_chunks(path, chunk_rows=128):
        spca.partial_fit(chunk)
    spca.finalize()
    # matches fitting the in-memory matrix
    ref = StreamingSparsePCA(n_components=5, n_features=80, random_seed=0)
    ref.partial_fit(X).finalize()
    np.testing.assert_allclose(
        np.asarray(spca.explained_variance_),
        np.asarray(ref.explained_variance_),
        rtol=1e-4,
    )


def test_skip_x_and_layer(tmp_path):
    import h5py

    X = counts(n=50, p=30, seed=5)
    path = str(tmp_path / "l.h5ad")
    write_h5ad(path, X)
    # add a layer by hand
    with h5py.File(path, "a") as f:
        g = f.create_group("layers/counts2")
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["shape"] = np.asarray([50, 30], np.int64)
        X2 = (X * 2).tocsr()
        g.create_dataset("data", data=X2.data)
        g.create_dataset("indices", data=X2.indices)
        g.create_dataset("indptr", data=X2.indptr)
    meta = read_h5ad(path, skip_x=True)
    assert meta.X is None and meta.shape == (50, 30)
    ad2 = read_h5ad(path, layer="counts2", device=False)
    np.testing.assert_allclose(
        ad2.X.to_scipy().toarray(), X.toarray() * 2, rtol=1e-6
    )
    got = sp.vstack(
        list(iter_h5ad_chunks(path, layer="counts2", chunk_rows=16))
    )
    np.testing.assert_allclose(got.toarray(), X.toarray() * 2, rtol=1e-6)


def test_validation(tmp_path):
    X = counts(n=20, p=10, seed=6)
    path = str(tmp_path / "v.h5ad")
    with pytest.raises(ValueError, match="obs_names"):
        write_h5ad(path, X, obs_names=np.asarray(["a"]))
    with pytest.raises(ValueError, match="length"):
        write_h5ad(path, X, obs={"bad": np.zeros(3)})
    with pytest.raises(ValueError, match="rows"):
        write_h5ad(path, X, obsm={"X_pca": np.zeros((5, 2))})
    write_h5ad(path, X)
    with pytest.raises(ValueError, match="chunk_rows"):
        list(iter_h5ad_chunks(path, chunk_rows=0))


def test_sparsematrix_input_and_dense_x(tmp_path):
    import h5py

    X = counts(n=40, p=20, seed=7)
    m = SparseMatrix.from_scipy(X, device=False)
    path = str(tmp_path / "m.h5ad")
    write_h5ad(path, m)
    ad = read_h5ad(path, device=False)
    np.testing.assert_allclose(
        ad.X.to_scipy().toarray(), X.toarray(), rtol=1e-6
    )
    # dense X dataset
    path2 = str(tmp_path / "d.h5ad")
    with h5py.File(path2, "w") as f:
        f.create_dataset("X", data=X.toarray())
    ad2 = read_h5ad(path2, device=False)
    np.testing.assert_allclose(
        ad2.X.to_scipy().toarray(), X.toarray(), rtol=1e-6
    )
    chunks = sp.vstack(list(iter_h5ad_chunks(path2, chunk_rows=16)))
    np.testing.assert_allclose(chunks.toarray(), X.toarray(), rtol=1e-6)
