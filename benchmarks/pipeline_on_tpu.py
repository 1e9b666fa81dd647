"""On-chip validation + timing of the round-3 pipeline surface.

Everything driven here was built while the TPU tunnel was down and was
verified only on the virtual CPU mesh; this script runs each component
on the REAL chip and records a warm wall time plus a quality/accuracy
figure per row (the same evidence contract as results_graded.json).

Workload: planted 16-cluster scRNA-like counts (the conftest recipe),
50k cells x 5k genes at density ~0.05, plus a 50k x 50 embedding derived
from them via SparsePCA — i.e. every stage consumes what its upstream
stage actually produces.

Writes benchmarks/results_pipeline_tpu.json.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "results_pipeline_tpu.json")

N, P, K_CLUST = 50_000, 5_000, 16


def _timed(fn, n=3):
    fn()  # warm (compile + transfer)
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def _timed_dense(fn, n=2):
    """Time a stage producing a dense device array, device-complete.

    Sync = pull a scalar reduction (4 bytes), NOT the full matrix: the
    axon tunnel moves ~50 MB/s, so np.asarray on a [50k, 5k] f32 result
    costs ~20 s of pure test-harness transfer (PCIe on a real TPU host:
    ~0.3 s). The one-time full pull is measured separately and reported
    as ``host_pull_s``.
    """

    import jax.numpy as jnp

    def run():
        out = fn()
        float(jnp.sum(out))  # forces execution; 4-byte transfer

    run()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        runs.append(time.perf_counter() - t0)
    out = fn()
    t0 = time.perf_counter()
    res = np.asarray(out)
    pull = time.perf_counter() - t0
    return min(runs), pull, res


def planted_counts(n, p, n_clusters=K_CLUST, seed=0, density=0.05):
    """cluster_counts, but also returning the planted labels + batches.

    Cached on disk: the 250M-draw dense Poisson takes minutes on this
    host's single core, and reruns of this script should not pay it.
    """
    cache = os.path.join(HERE, "_truth_cache", f"pipeline_{n}x{p}_{seed}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        X = sp.csr_matrix(
            (z["data"], z["indices"], z["indptr"]), shape=(n, p)
        )
        return X, z["labels"], z["batches"]

    from _datagen import _cluster_rates

    rng = np.random.default_rng(seed)
    lam = _cluster_rates(n_clusters, p, rng, density)
    labels = rng.integers(0, n_clusters, n)
    batches = rng.integers(0, 2, n)
    shift = np.zeros((2, p), np.float32)
    shift[1, : p // 2] = 0.5
    blocks = []
    for lo in range(0, n, 8192):
        hi = min(n, lo + 8192)
        Xb = rng.poisson(lam[labels[lo:hi]]).astype(np.float32)
        # mild batch effect on half the genes so combat/harmony have work
        Xb += (Xb > 0) * shift[batches[lo:hi]]
        blocks.append(sp.csr_matrix(Xb))
    X = sp.vstack(blocks).tocsr()
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(
        cache,
        data=X.data,
        indices=X.indices,
        indptr=X.indptr,
        labels=labels,
        batches=batches,
    )
    return X, labels, batches


def scrublet_bench():
    """Scrublet cold vs warm + detection quality (VERDICT r3 weak #4,
    r4 weak #5): the 287 s r3 figure was one shot with every fresh-shape
    compile folded in AND on doublet-free data, so detected_rate=0 read
    as a broken detector. Here: (a) ~6% of the cells are replaced by
    PLANTED doublets (sums of two random cells — exactly what scrublet
    itself simulates), so detection has ground truth; (b) the second
    call reuses every jitted graph (same matrix -> same payload widths
    -> same shapes), so warm_s is the steady-state cost and compile_s =
    cold - warm is the one-time compile+cache overhead. Records AUC of
    doublet_scores against the planted labels plus the detected rate
    among planted vs background cells. Merges its row into
    results_pipeline_tpu.json in place."""

    import jax

    import single_algebra_tpu as sat
    from single_algebra_tpu import SparseMatrix

    dev = jax.devices()[0]
    assert dev.platform != "cpu", "this benchmark wants the real chip"

    Xs, _, _ = planted_counts(N, P)
    # plant doublets: replace the last ~6% of rows with sums of two
    # random distinct cells from the clean majority
    rng = np.random.default_rng(7)
    n_doub = int(round(0.06 * N))
    n_clean = N - n_doub
    pa = rng.integers(0, n_clean, n_doub)
    pb = rng.integers(0, n_clean, n_doub)
    Xd = sp.vstack([Xs[:n_clean], Xs[pa] + Xs[pb]]).tocsr()
    is_doublet = np.zeros(N, bool)
    is_doublet[n_clean:] = True
    m = SparseMatrix.from_scipy(Xd)
    print(f"nnz={Xd.nnz} planted_doublets={n_doub}", flush=True)

    t0 = time.perf_counter()
    sr = sat.scrublet(m, seed=0, verbose=True)
    cold = time.perf_counter() - t0
    print(f"cold: {cold:.1f}s", flush=True)
    t0 = time.perf_counter()
    sr = sat.scrublet(m, seed=0, verbose=True)
    warm = time.perf_counter() - t0
    print(f"warm: {warm:.1f}s", flush=True)

    # AUC of the score against planted truth (rank-sum form, ties split)
    order = np.argsort(sr.doublet_scores, kind="stable")
    ranks = np.empty(N, np.float64)
    ranks[order] = np.arange(1, N + 1)
    s = np.asarray(sr.doublet_scores, np.float64)
    # midrank ties
    for v in np.unique(s):
        sel = s == v
        if sel.sum() > 1:
            ranks[sel] = ranks[sel].mean()
    n_pos = int(is_doublet.sum())
    n_neg = N - n_pos
    auc = (ranks[is_doublet].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )

    r = {
        "component": "doublets.scrublet",
        "warm_s": round(warm, 4),
        "planted_doublet_frac": round(n_doub / N, 4),
        "auc_vs_planted": round(float(auc), 4),
        "detected_rate_planted": round(
            float(sr.predicted[is_doublet].mean()), 4
        ),
        "detected_rate_background": round(
            float(sr.predicted[~is_doublet].mean()), 4
        ),
        "detected_rate": round(float(np.mean(sr.predicted)), 4),
        "cold_s": round(cold, 4),
        "compile_s": round(cold - warm, 4),
        "note": (
            "6% planted doublets (random cell-pair sums); warm = second "
            "call in-process (all jitted graphs reused); compile_s = "
            "cold - warm (one-time shape compiles + compile-cache "
            "writes)"
        ),
    }
    print(json.dumps(r), flush=True)
    res = {"rows": []}
    if os.path.exists(OUT):
        res = json.load(open(OUT))
    res["rows"] = [
        q for q in res.get("rows", [])
        if q.get("component") != "doublets.scrublet"
    ] + [r]
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def main():
    import jax

    import single_algebra_tpu as sat
    from single_algebra_tpu import (
        SparseMatrix,
        calculate_qc_metrics,
        highly_variable_genes,
        leiden,
        rank_genes_groups,
    )
    from single_algebra_tpu import metrics as M
    from single_algebra_tpu.models import (
        KMeansBuilder,
        NMF,
        SparsePCABuilder,
        diffmap,
        draw_graph,
        harmony,
        lsi,
    )
    from single_algebra_tpu.neighbors import connectivities
    from single_algebra_tpu.preprocess import (
        combat,
        normalize_total,
        normalize_pearson_residuals,
        regress_out,
        scale,
    )
    from single_algebra_tpu.types import SVDMethod

    dev = jax.devices()[0]
    assert dev.platform != "cpu", "this benchmark wants the real chip"
    res = {
        "backend": f"{dev.platform}:{dev.device_kind}",
        "shape": [N, P],
        "rows": [],
    }

    def row(name, warm_s, quality_name, quality, **extra):
        r = {
            "component": name,
            "warm_s": round(warm_s, 4),
            quality_name: quality,
            **extra,
        }
        res["rows"].append(r)
        print(json.dumps(r), flush=True)
        # incremental write: a mid-run failure keeps the completed rows
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)

    print("generating planted counts ...", flush=True)
    Xs, labels, batches = planted_counts(N, P)
    nnz = Xs.nnz
    m = SparseMatrix.from_scipy(Xs)
    print(f"nnz={nnz} ({nnz / (N * P):.3f})", flush=True)

    # ---- QC ------------------------------------------------------------
    mito = np.zeros(P, bool)
    mito[:50] = True
    t = _timed(lambda: calculate_qc_metrics(m, qc_vars={"mt": mito}))
    obs, var = calculate_qc_metrics(m, qc_vars={"mt": mito})
    truth = np.asarray(Xs.sum(axis=1)).ravel()
    err = float(np.abs(obs["total_counts"] - truth).max() / truth.max())
    row("qc.calculate_qc_metrics", t, "total_counts_rel_err", err, nnz=nnz)

    # ---- normalize_total + log1p ---------------------------------------
    def _norm():
        mm, _sf = normalize_total(m, target_sum=1e4)
        mm = mm.log1p_normalize()
        mm.ell_data.block_until_ready()
        return mm

    t = _timed(_norm)
    mn = _norm()
    mtot, _ = normalize_total(m, target_sum=1e4)
    serr = float(np.abs(np.asarray(mtot.sum_row()) - 1e4).max() / 1e4)
    row("preprocess.normalize_total+log1p", t, "rowsum_rel_err", serr)

    # ---- HVG (seurat) ---------------------------------------------------
    t = _timed(lambda: highly_variable_genes(mn, n_top_genes=2000))
    hvg = highly_variable_genes(mn, n_top_genes=2000)
    row(
        "feature_selection.highly_variable_genes",
        t,
        "n_selected",
        int(hvg.mask.sum()),
    )

    # ---- seurat_v3 HVG flavor (raw counts) --------------------------------
    t = _timed(
        lambda: highly_variable_genes(
            m, n_top_genes=2000, flavor="seurat_v3"
        ),
        n=2,
    )
    hv3 = highly_variable_genes(m, n_top_genes=2000, flavor="seurat_v3")
    row(
        "feature_selection.hvg[seurat_v3]",
        t,
        "n_selected",
        int(hv3.mask.sum()),
    )

    # ---- pearson residuals (normalization + HVG flavor) ----------------
    t, pull, Rp = _timed_dense(
        lambda: normalize_pearson_residuals(m), n=1
    )
    t2 = _timed(
        lambda: highly_variable_genes(
            m, n_top_genes=2000, flavor="pearson_residuals"
        ),
        n=1,
    )
    row(
        "preprocess.normalize_pearson_residuals",
        t,
        "residual_abs_mean",
        round(float(np.abs(Rp).mean()), 4),
        hvg_flavor_warm_s=round(t2, 4),
        host_pull_s=round(pull, 3),
    )
    del Rp

    # ---- scale -----------------------------------------------------------
    t, pull, Z = _timed_dense(lambda: scale(mn, max_value=10.0))
    row(
        "preprocess.scale",
        t,
        "col_mean_abs_max",
        float(np.abs(Z.mean(axis=0)).max()),
        host_pull_s=round(pull, 3),
    )
    del Z

    # ---- regress_out -----------------------------------------------------
    cov = np.asarray(obs["total_counts"], np.float32)[:, None]
    t, pull, _Zr = _timed_dense(lambda: regress_out(mn, cov))
    del _Zr
    row("preprocess.regress_out", t, "ok", True,
        host_pull_s=round(pull, 3))

    # ---- combat ----------------------------------------------------------
    t, pull, Zc = _timed_dense(lambda: combat(mn, batches))
    dn = np.asarray(mn.to_dense())
    gap0 = float(
        np.abs(
            dn[batches == 0][:, : P // 2].mean(0)
            - dn[batches == 1][:, : P // 2].mean(0)
        ).mean()
    )
    gap1 = float(
        np.abs(
            Zc[batches == 0][:, : P // 2].mean(0)
            - Zc[batches == 1][:, : P // 2].mean(0)
        ).mean()
    )
    del dn, Zc
    row("preprocess.combat", t, "batch_mean_gap_after", round(gap1, 5),
        batch_mean_gap_before=round(gap0, 5), host_pull_s=round(pull, 3))

    # ---- PCA -> embedding (timing already in results_graded) -------------
    pca = (
        SparsePCABuilder()
        .n_components(50)
        .svd_method(SVDMethod.random(10, 7))
        .build()
    )
    E = np.asarray(pca.fit_transform(mn))
    print("embedding ready", flush=True)

    # ---- rank_genes_groups ------------------------------------------------
    t = _timed(
        lambda: rank_genes_groups(mn, labels, method="t-test", n_genes=50),
        n=2,
    )
    de = rank_genes_groups(mn, labels, method="t-test", n_genes=50)
    top_abs = min(
        float(np.abs(de.scores[g][:10]).min()) for g in de.scores
    )
    tw = _timed(
        lambda: rank_genes_groups(
            mn, labels, method="wilcoxon", n_genes=50
        ),
        n=2,
    )
    row("de.rank_genes_groups[t-test]", t, "min_top10_abs_score",
        round(top_abs, 2), wilcoxon_warm_s=round(tw, 4))

    # ---- neighbors graph ---------------------------------------------------
    t = _timed(lambda: connectivities(E, n_neighbors=15), n=2)
    G = connectivities(E, n_neighbors=15)
    row("neighbors.connectivities", t, "graph_nnz", int(G.nnz))

    # ---- leiden (host native) ----------------------------------------------
    t = _timed(lambda: leiden(G, resolution=1.0, seed=0), n=2)
    led = leiden(G, resolution=1.0, seed=0)
    ari = M.adjusted_rand_index(labels, led.labels)
    row("cluster.leiden", t, "ari_vs_planted", round(float(ari), 4),
        n_communities=int(led.n_communities), backend=led.backend)

    # ---- kmeans on embedding -------------------------------------------------
    km = KMeansBuilder().n_clusters(K_CLUST).random_seed(0).build()
    t = _timed(lambda: np.asarray(km.fit_predict(E)), n=2)
    pred = np.asarray(km.fit_predict(E))
    row(
        "models.KMeans[embedding]",
        t,
        "ari_vs_planted",
        round(float(M.adjusted_rand_index(labels, pred)), 4),
    )

    # ---- silhouette / lisi / kbet ---------------------------------------------
    t = _timed(lambda: M.silhouette_score(E, labels), n=2)
    sil = float(M.silhouette_score(E, labels))
    row("metrics.silhouette_score", t, "silhouette", round(sil, 4))

    t = _timed(lambda: M.lisi(E, batches), n=2)
    li = M.lisi(E, batches)
    row("metrics.lisi", t, "median_ilisi", round(float(np.median(li)), 4))

    t = _timed(lambda: M.kbet(E, batches), n=2)
    kb = M.kbet(E, batches)
    row("metrics.kbet", t, "acceptance", round(float(kb), 4))

    # ---- harmony ---------------------------------------------------------------
    t_h0 = time.perf_counter()
    hr = harmony(E, batches, seed=0)  # compile + run
    t_h_cold = time.perf_counter() - t_h0
    t_h0 = time.perf_counter()
    hr = harmony(E, batches, seed=0)
    t_h = time.perf_counter() - t_h0
    li2 = M.lisi(np.asarray(hr.embedding), batches)
    row(
        "models.harmony",
        t_h,
        "median_ilisi_after",
        round(float(np.median(li2)), 4),
        median_ilisi_before=round(float(np.median(li)), 4),
        rounds=int(hr.n_rounds),
        cold_s=round(t_h_cold, 4),
    )

    # ---- diffmap -----------------------------------------------------------------
    t = _timed(lambda: diffmap(G, n_comps=15), n=1)
    row("models.diffmap", t, "ok", True)

    # ---- magic ----------------------------------------------------------------
    t0 = time.perf_counter()
    Xm = sat.magic(mn, embedding=E, n_neighbors=15, t=3, device_out=True)
    jax.block_until_ready(Xm)
    t = time.perf_counter() - t0
    t0 = time.perf_counter()
    Xmh = np.asarray(Xm)
    pull = time.perf_counter() - t0
    row("imputation.magic", t, "imputed_mean", round(float(np.mean(Xmh)), 4),
        host_pull_s=round(pull, 3))
    del Xm, Xmh

    # ---- scrublet ---------------------------------------------------------------
    t0 = time.perf_counter()
    sr = sat.scrublet(m, seed=0)
    t = time.perf_counter() - t0
    row(
        "doublets.scrublet",
        t,
        "detected_rate",
        round(float(np.mean(sr.predicted)), 4),
    )

    # ---- NMF ---------------------------------------------------------------------
    nmf = NMF(n_components=20, max_iter=100, seed=0)
    t0 = time.perf_counter()
    nmf.fit_transform(m)
    t = time.perf_counter() - t0
    row("models.NMF[k=20,100it]", t, "frobenius_loss",
        round(float(nmf.reconstruction_err_), 2), n_iter=int(nmf.n_iter_))

    # ---- draw_graph (FA2) -----------------------------------------------------------
    t0 = time.perf_counter()
    pos = draw_graph(G, n_iter=100, seed=0)
    t = time.perf_counter() - t0
    cent = np.stack([pos[labels == t_].mean(0) for t_ in range(K_CLUST)])
    within = np.mean([
        np.linalg.norm(pos[labels == t_] - cent[t_], axis=1).mean()
        for t_ in range(K_CLUST)
    ])
    across = np.mean([
        np.linalg.norm(cent[i] - cent[j])
        for i in range(K_CLUST)
        for j in range(i + 1, K_CLUST)
    ])
    row(
        "models.draw_graph[100it]",
        t,
        "s_per_iter",
        round(t / 100, 4),
        radius=round(float(np.abs(pos).max()), 2),
        across_over_within=round(float(across / within), 2),
    )

    # ---- tfidf + lsi (scATAC path; binarized counts as peak proxy) -------------------
    mb = SparseMatrix.from_scipy(
        sp.csr_matrix(
            (np.ones_like(Xs.data), Xs.indices, Xs.indptr), shape=Xs.shape
        )
    )
    t = _timed(lambda: np.asarray(lsi(mb, n_components=30).scores), n=1)
    row("models.lsi[tfidf+svd]", t, "ok", True)

    # ---- ingest ----------------------------------------------------------------------
    half = N // 2
    t0 = time.perf_counter()
    pred_lab, conf = sat.ingest(E[:half], E[half:], labels[:half], k=15)
    t = time.perf_counter() - t0
    acc = float(np.mean(np.asarray(pred_lab) == labels[half:]))
    row("ingest.ingest[label transfer]", t, "accuracy", round(acc, 4),
        mean_confidence=round(float(np.mean(conf)), 4))

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    import sys as _sys

    if "--scrublet" in _sys.argv:
        scrublet_bench()
    else:
        main()
