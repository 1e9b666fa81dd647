"""rank_genes_groups vs scipy ground truth (per-gene reference tests)."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy import stats

from single_algebra_tpu import SparseMatrix
from single_algebra_tpu.de import rank_genes_groups, _bh_adjust


def _data(n=120, p=40, seed=0, integer=False):
    rng = np.random.default_rng(seed)
    if integer:  # heavy ties for the wilcoxon tie correction
        X = sp.random(
            n, p, density=0.4, format="csr", dtype=np.float32,
            random_state=rng,
            data_rvs=lambda s: rng.integers(1, 5, s).astype(np.float32),
        )
    else:
        X = sp.random(
            n, p, density=0.4, format="csr", dtype=np.float32,
            random_state=rng, data_rvs=rng.random,
        )
    labels = rng.choice(["a", "b", "c"], n).tolist()
    return X, labels


def _cols(res, g):
    """Un-sort one group's table back to gene order."""

    order = np.argsort(res.names[g])
    return {k: v[order] for k, v in res.group(g).items()}


def test_ttest_matches_scipy_welch():
    X, labels = _data()
    m = SparseMatrix.from_scipy(X)
    res = rank_genes_groups(m, labels, method="t-test", log1p_input=False)
    Xd = X.toarray().astype(np.float64)
    lab = np.asarray(labels)
    for g in ("a", "b", "c"):
        got = _cols(res, g)
        t_ref, p_ref = stats.ttest_ind(
            Xd[lab == g], Xd[lab != g], equal_var=False
        )
        np.testing.assert_allclose(got["scores"], t_ref, rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(got["pvals"], p_ref, rtol=1e-3, atol=1e-9)
        # logfoldchanges: raw-scale formula
        m1 = Xd[lab == g].mean(0)
        m2 = Xd[lab != g].mean(0)
        np.testing.assert_allclose(
            got["logfoldchanges"], np.log2((m1 + 1e-9) / (m2 + 1e-9)),
            rtol=1e-4, atol=1e-6,
        )


def test_ttest_vs_reference_group():
    X, labels = _data(seed=1)
    m = SparseMatrix.from_scipy(X)
    res = rank_genes_groups(
        m, labels, method="t-test", reference="c", log1p_input=False
    )
    assert set(res.names) == {"a", "b"}
    Xd = X.toarray().astype(np.float64)
    lab = np.asarray(labels)
    for g in ("a", "b"):
        got = _cols(res, g)
        t_ref, p_ref = stats.ttest_ind(
            Xd[lab == g], Xd[lab == "c"], equal_var=False
        )
        np.testing.assert_allclose(got["scores"], t_ref, rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(got["pvals"], p_ref, rtol=1e-3, atol=1e-9)


def test_overestim_var_is_more_conservative():
    X, labels = _data(seed=2)
    m = SparseMatrix.from_scipy(X)
    r1 = rank_genes_groups(m, labels, method="t-test", log1p_input=False)
    r2 = rank_genes_groups(
        m, labels, method="t-test_overestim_var", log1p_input=False
    )
    # group sizes differ from rest sizes, so |t| must shrink (n1 < n2)
    for g in ("a", "b", "c"):
        a = np.abs(_cols(r1, g)["scores"])
        b = np.abs(_cols(r2, g)["scores"])
        assert (b <= a + 1e-12).all()
        assert (b < a - 1e-9).any()


@pytest.mark.parametrize("integer", [False, True])
def test_wilcoxon_matches_scipy_mannwhitneyu(integer):
    X, labels = _data(seed=3, integer=integer)
    m = SparseMatrix.from_scipy(X)
    res = rank_genes_groups(
        m, labels, method="wilcoxon", log1p_input=False, block=16
    )
    Xd = X.toarray().astype(np.float64)
    lab = np.asarray(labels)
    for g in ("a", "b"):
        got = _cols(res, g)
        p_ref = np.array([
            stats.mannwhitneyu(
                Xd[lab == g, j], Xd[lab != g, j],
                alternative="two-sided", use_continuity=False,
                method="asymptotic",
            ).pvalue
            for j in range(Xd.shape[1])
        ])
        np.testing.assert_allclose(got["pvals"], p_ref, rtol=1e-6, atol=1e-12)


def test_wilcoxon_vs_reference_group():
    X, labels = _data(seed=4, integer=True)
    m = SparseMatrix.from_scipy(X)
    res = rank_genes_groups(
        m, labels, method="wilcoxon", reference="b",
        log1p_input=False, block=16,
    )
    Xd = X.toarray().astype(np.float64)
    lab = np.asarray(labels)
    got = _cols(res, "a")
    p_ref = np.array([
        stats.mannwhitneyu(
            Xd[lab == "a", j], Xd[lab == "b", j],
            alternative="two-sided", use_continuity=False,
            method="asymptotic",
        ).pvalue
        for j in range(Xd.shape[1])
    ])
    np.testing.assert_allclose(got["pvals"], p_ref, rtol=1e-6, atol=1e-12)


def test_bh_adjustment():
    rng = np.random.default_rng(5)
    p = rng.random(50)
    adj = _bh_adjust(p)
    # brute-force BH
    m = p.size
    ref = np.empty(m)
    order = np.argsort(p)
    prev = 1.0
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        prev = min(prev, p[i] * m / rank)
        ref[i] = prev
    np.testing.assert_allclose(adj, ref, rtol=1e-12)


def test_ranking_sorted_and_truncated():
    X, labels = _data(seed=6)
    m = SparseMatrix.from_scipy(X)
    vn = np.array([f"g{j}" for j in range(X.shape[1])])
    res = rank_genes_groups(
        m, labels, method="t-test", var_names=vn, n_genes=7,
        log1p_input=False,
    )
    for g in ("a", "b", "c"):
        assert len(res.names[g]) == 7
        s = res.scores[g]
        assert (np.diff(s) <= 1e-12).all()  # descending
        assert set(res.names[g]) <= set(vn)


def test_log1p_fold_change_delogs():
    X, labels = _data(seed=7)
    m = SparseMatrix.from_scipy(X)
    res = rank_genes_groups(m, labels, method="t-test", log1p_input=True)
    Xd = X.toarray().astype(np.float64)
    lab = np.asarray(labels)
    got = _cols(res, "a")
    m1 = np.expm1(Xd[lab == "a"].mean(0))
    m2 = np.expm1(Xd[lab != "a"].mean(0))
    np.testing.assert_allclose(
        got["logfoldchanges"], np.log2((m1 + 1e-9) / (m2 + 1e-9)),
        rtol=1e-4, atol=1e-6,
    )


def test_validation_errors():
    X, labels = _data(seed=8)
    m = SparseMatrix.from_scipy(X)
    with pytest.raises(ValueError, match="Unknown method"):
        rank_genes_groups(m, labels, method="anova")
    with pytest.raises(ValueError, match="not a label value"):
        rank_genes_groups(m, labels, reference="zzz")
    with pytest.raises(ValueError, match="are not label values"):
        rank_genes_groups(m, labels, groups=["a", "nope"])
    with pytest.raises(ValueError, match="var_names length"):
        rank_genes_groups(m, labels, var_names=np.arange(3))
    with pytest.raises(ValueError, match="No groups left"):
        rank_genes_groups(m, ["a"] * X.shape[0], reference="a")


def test_csc_format_parity():
    X, labels = _data(seed=9, integer=True)
    m_csr = SparseMatrix.from_scipy(X.tocsr())
    m_csc = SparseMatrix.from_scipy(X.tocsc())
    for method in ("t-test", "wilcoxon"):
        r1 = rank_genes_groups(m_csr, labels, method=method, log1p_input=False)
        r2 = rank_genes_groups(m_csc, labels, method=method, log1p_input=False)
        for g in r1.names:
            np.testing.assert_allclose(
                _cols(r1, g)["scores"], _cols(r2, g)["scores"],
                rtol=1e-5, atol=1e-7,
            )


def test_logreg_recovers_planted_markers():
    rng = np.random.default_rng(20)
    n, p = 300, 60
    X = sp.random(n, p, density=0.3, format="csr", dtype=np.float32,
                  random_state=rng, data_rvs=rng.random).toarray()
    lab = rng.choice(["a", "b", "c"], n)
    X[lab == "b", :4] += 2.0  # markers of b
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    res = rank_genes_groups(m, lab.tolist(), method="logreg",
                            log1p_input=False)
    top = set(res.names["b"][:4])
    assert top == {0, 1, 2, 3}, top
    assert np.isnan(res.pvals["b"]).all()
    assert np.isnan(res.pvals_adj["b"]).all()
    # logfoldchanges still real-valued
    assert np.isfinite(res.logfoldchanges["b"]).all()


def test_logreg_scores_correlate_with_sklearn():
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(21)
    n, p = 250, 40
    X = sp.random(n, p, density=0.4, format="csr", dtype=np.float32,
                  random_state=rng, data_rvs=rng.random).toarray()
    lab = rng.choice(["a", "b"], n)
    X[lab == "a", :6] += 1.0
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    res = rank_genes_groups(m, lab.tolist(), method="logreg",
                            log1p_input=False)
    skl = LogisticRegression(max_iter=2000).fit(X, lab)
    # sklearn's binary coef_ is for the SECOND class; our column for 'a'
    got = _cols(res, "a")["scores"]
    ref = -skl.coef_[0]
    corr = np.corrcoef(got, ref)[0, 1]
    assert corr > 0.9, corr


def test_logreg_with_reference_group():
    rng = np.random.default_rng(22)
    n, p = 240, 30
    X = sp.random(n, p, density=0.4, format="csr", dtype=np.float32,
                  random_state=rng, data_rvs=rng.random).toarray()
    lab = rng.choice(["a", "b", "c"], n)
    X[lab == "a", :3] += 2.0
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    res = rank_genes_groups(m, lab.tolist(), method="logreg",
                            reference="c", log1p_input=False)
    assert set(res.names) == {"a", "b"}
    assert set(res.names["a"][:3]) == {0, 1, 2}


def test_pts_and_filter():
    rng = np.random.default_rng(30)
    n, p = 200, 30
    X = sp.random(n, p, density=0.25, format="csr", dtype=np.float32,
                  random_state=rng, data_rvs=rng.random).toarray()
    lab = rng.choice(["a", "b"], n)
    X[lab == "a", :3] += 2.0  # strong markers, high in-group fraction
    m = SparseMatrix.from_scipy(sp.csr_matrix(X))
    res = rank_genes_groups(m, lab.tolist(), method="t-test",
                            log1p_input=False, pts=True)
    got = _cols(res, "a")
    Xd = X
    frac_in = (Xd[lab == "a"] > 0).mean(0)
    frac_out = (Xd[lab != "a"] > 0).mean(0)
    np.testing.assert_allclose(got["pts"], frac_in, rtol=1e-6)
    np.testing.assert_allclose(got["pts_rest"], frac_out, rtol=1e-6)
    filt = res.filter(min_fold_change=2.0, min_in_group_fraction=0.8,
                      max_out_group_fraction=0.5)
    assert set(filt.names["a"]) <= set(res.names["a"])
    assert set(range(3)) <= set(filt.names["a"])  # markers survive
    # scanpy semantics: RAW fold change cutoff -> log2FC >= 1
    assert (filt.logfoldchanges["a"] >= 1.0).all()
    assert (filt.pts["a"] >= 0.8).all()
    with pytest.raises(ValueError, match="positive"):
        res.filter(min_fold_change=0.0)
    # filter without pts errors
    bare = rank_genes_groups(m, lab.tolist(), method="t-test",
                             log1p_input=False)
    with pytest.raises(ValueError, match="pts=True"):
        bare.filter()


def test_marker_gene_overlap():
    from single_algebra_tpu.de import marker_gene_overlap

    # planted markers: genes 0-4 mark group 'a', 5-9 mark group 'b'
    rng = np.random.default_rng(7)
    n, p = 200, 30
    X = rng.random((n, p)).astype(np.float32)
    labels = np.array(["a"] * 100 + ["b"] * 100)
    X[:100, :5] += 5.0
    X[100:, 5:10] += 5.0
    m = SparseMatrix.from_dense(X)
    res = rank_genes_groups(m, labels.tolist(), method="t-test",
                            log1p_input=False)
    ref = {"type_a": [0, 1, 2, 3, 4], "type_b": [5, 6, 7, 8, 9]}
    counts = marker_gene_overlap(res, ref, top_n=5)
    assert counts["type_a"]["a"] == 5.0 and counts["type_a"]["b"] == 0.0
    assert counts["type_b"]["b"] == 5.0 and counts["type_b"]["a"] == 0.0
    jac = marker_gene_overlap(res, ref, top_n=5, method="jaccard")
    assert jac["type_a"]["a"] == 1.0 and jac["type_a"]["b"] == 0.0
    coef = marker_gene_overlap(res, ref, top_n=10, method="overlap_coef")
    assert coef["type_b"]["b"] == 1.0
    with pytest.raises(ValueError, match="method"):
        marker_gene_overlap(res, ref, method="bogus")
    with pytest.raises(ValueError, match="empty"):
        marker_gene_overlap(res, {})
    with pytest.raises(ValueError, match="empty"):
        marker_gene_overlap(res, {"t": []})


def test_wilcoxon_negative_and_stored_zero_values():
    """Scaled inputs carry negative stored values, and value maps can
    leave explicit stored zeros; the sparse rank kernel's analytic zero
    tie group must merge stored and implicit zeros and sit ABOVE the
    negatives. Parity vs scipy on the dense columns."""

    from scipy import stats

    rng = np.random.default_rng(7)
    n, p = 120, 30
    X = sp.random(n, p, density=0.4, random_state=3, format="csr")
    X.data = rng.normal(0, 1.0, X.nnz)  # mixed sign
    X.data[:: 7] = 0.0  # explicit stored zeros (NOT eliminated)
    labels = np.where(rng.random(n) < 0.5, "a", "b")
    m = SparseMatrix.from_scipy(X)
    assert m.nnz == X.nnz  # stored zeros preserved
    res = rank_genes_groups(
        m, labels, method="wilcoxon", log1p_input=False, block=8
    )
    Xd = X.toarray().astype(np.float64)
    for g in ("a", "b"):
        got = _cols(res, g)
        p_ref = np.array([
            stats.mannwhitneyu(
                Xd[labels == g, j], Xd[labels != g, j],
                alternative="two-sided", use_continuity=False,
                method="asymptotic",
            ).pvalue
            for j in range(p)
        ])
        np.testing.assert_allclose(
            got["pvals"], p_ref, rtol=1e-6, atol=1e-12
        )
