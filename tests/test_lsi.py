"""TF-IDF (preprocess.tfidf) and LSI (models.lsi): numpy-formula parity,
sparsity preservation, sklearn TruncatedSVD agreement, scATAC semantics."""

import numpy as np
import pytest
import scipy.sparse as sp

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.models import lsi
from single_algebra_tpu.preprocess import tfidf


def _atac_counts(n=300, p=150, seed=0):
    rng = np.random.default_rng(seed)
    X = (rng.random((n, p)) < 0.08) * rng.integers(1, 4, (n, p))
    X[:5] *= 0  # a few empty cells
    X[:, :3] *= 0  # a few never-open peaks
    return X.astype(np.float64)


def _np_tfidf(X, sf=1e4, log_tf=True, log_idf=True, log_tfidf=False):
    n = X.shape[0]
    rs = X.sum(axis=1)
    cs = X.sum(axis=0)
    tf = X / np.where(rs > 0, rs, 1.0)[:, None]
    if log_tf:
        tf = np.log1p(tf * sf)
    idf = np.where(cs > 0, n / np.where(cs > 0, cs, 1.0), 0.0)
    if log_idf:
        idf = np.log1p(idf)
    out = tf * idf[None, :]
    if log_tfidf:
        out = np.log1p(out * sf)
    return out


@pytest.mark.parametrize("fmt", ["csr", "csc"])
@pytest.mark.parametrize(
    "opts",
    [
        dict(),  # muon defaults: log_tf + log_idf
        dict(log_tf=False, log_idf=False, log_tfidf=True),  # Signac method 1
        dict(log_tf=False, log_idf=True),
        dict(log_tf=True, log_idf=False, scale_factor=100.0),
    ],
)
def test_tfidf_matches_numpy(fmt, opts):
    X = _atac_counts()
    m = SparseMatrix.from_dense(X, fmt=fmt)
    out = tfidf(m, **opts)
    assert isinstance(out, SparseMatrix)  # sparsity preserved
    assert out.nnz == m.nnz
    want = _np_tfidf(X, sf=opts.get("scale_factor", 1e4),
                     log_tf=opts.get("log_tf", True),
                     log_idf=opts.get("log_idf", True),
                     log_tfidf=opts.get("log_tfidf", False))
    np.testing.assert_allclose(out.to_dense(), want, rtol=1e-12, atol=1e-12)
    assert np.isfinite(out.to_dense()).all()


def test_tfidf_rejects_conflicting_logs():
    m = SparseMatrix.from_dense(_atac_counts(50, 30))
    with pytest.raises(ValueError, match="log_tfidf"):
        tfidf(m, log_tfidf=True)


def test_lsi_matches_sklearn_truncated_svd():
    from sklearn.decomposition import TruncatedSVD

    # gapped spectrum (8 planted accessibility programs of geometrically
    # decreasing prevalence) — a flat noise spectrum is unresolvable by
    # ANY iterative truncated SVD at 1e-5 (see .claude/skills/verify)
    rng = np.random.default_rng(1)
    n, p = 400, 180
    progs = (rng.random((8, p)) < 0.3).astype(np.float64)
    lab = rng.integers(0, 8, n)
    strength = np.geomspace(16, 1, 8)
    X = (rng.random((n, p)) < 0.05 * strength[lab][:, None]) * 1.0
    X += (rng.random((n, p)) < 0.3) * progs[lab] * rng.integers(1, 3, (n, p))
    m = SparseMatrix.from_dense(X)
    res = lsi(m, n_components=8, drop_first=False, scale_embeddings=False,
              n_power_iterations=9)
    T = _np_tfidf(X)
    ref = TruncatedSVD(n_components=8, algorithm="arpack", random_state=0)
    ref_scores = ref.fit_transform(sp.csr_matrix(T))
    # leading (gapped) components tight; the tail sits in the noise bulk
    # where iterative solvers agree only to ~1e-3
    np.testing.assert_allclose(
        res.singular_values[:4], ref.singular_values_[:4], rtol=1e-5
    )
    np.testing.assert_allclose(
        res.singular_values, ref.singular_values_, rtol=5e-3
    )
    np.testing.assert_allclose(
        res.explained_variance_ratio,
        ref.explained_variance_ratio_,
        rtol=1e-2,
    )
    # score SUBSPACE agreement: near-equal singular values rotate freely
    # within their eigenspace, so compare principal angles, not entries
    qa, _ = np.linalg.qr(res.scores[:, :4])
    qb, _ = np.linalg.qr(ref_scores[:, :4])
    cosines = np.linalg.svd(qa.T @ qb, compute_uv=False)
    assert cosines.min() > 0.999


def test_lsi_drop_first_and_scaling():
    X = _atac_counts(seed=2)
    m = SparseMatrix.from_dense(X)
    full = lsi(m, n_components=6, drop_first=False, scale_embeddings=False)
    dropped = lsi(m, n_components=5, drop_first=True, scale_embeddings=False)
    # dropping the first component leaves exactly the tail of the full fit
    np.testing.assert_allclose(
        dropped.singular_values, full.singular_values[1:], rtol=1e-6
    )
    scaled = lsi(m, n_components=5, drop_first=True)
    np.testing.assert_allclose(scaled.scores.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(scaled.scores.std(axis=0), 1.0, atol=1e-4)
    assert scaled.n_components == 5


def test_lsi_separates_cell_types():
    # two accessibility programs -> LSI space separates them
    rng = np.random.default_rng(3)
    n, p = 400, 200
    open_a = rng.random(p) < 0.25
    open_b = rng.random(p) < 0.25
    X = np.zeros((n, p))
    lab = rng.integers(0, 2, n)
    for i in range(n):
        prog = open_a if lab[i] == 0 else open_b
        X[i] = (rng.random(p) < 0.15 * prog) * 1.0
    m = SparseMatrix.from_dense(X)
    res = lsi(m, n_components=4)
    from sklearn.cluster import KMeans as SK

    pred = SK(2, n_init=5, random_state=0).fit_predict(res.scores)
    from single_algebra_tpu.metrics import adjusted_rand_index

    assert adjusted_rand_index(lab, pred) > 0.9


def test_lsi_validation_and_pre_transformed():
    X = _atac_counts(40, 20, seed=4)
    m = SparseMatrix.from_dense(X)
    with pytest.raises(ValueError, match="n_components"):
        lsi(m, n_components=25)
    pre = tfidf(m)
    a = lsi(m, n_components=3, drop_first=False, scale_embeddings=False)
    b = lsi(pre, n_components=3, apply_tfidf=False, drop_first=False,
            scale_embeddings=False)
    np.testing.assert_allclose(a.singular_values, b.singular_values,
                               rtol=1e-6)
