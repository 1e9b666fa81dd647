"""Graded workloads #2 and #5 (BASELINE.json) + UMAP at scale, on-chip.

#2: Normalize + Log1P preprocessing on a sparse expression matrix.
#5: Cosine / euclidean similarity over PCA-scale embeddings.
Bonus: UMAP end-to-end on 50k cells x 50 dims (kNN + fuzzy graph + 200
epochs of layout optimization).

Appends results to benchmarks/results_graded.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_graded.json")


def _timed(fn, n=3):
    fn()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main():
    import jax
    import scipy.sparse as sp

    from single_algebra_tpu import Direction, SparseMatrix
    from single_algebra_tpu.similarity import (
        CosineSimilarity,
        EuclideanSimilarity,
    )
    from single_algebra_tpu.models import UMAP, UMAPConfig

    d = jax.devices()[0]
    res = {"backend": f"{d.platform}:{d.device_kind}"}

    # -- #2 normalize + log1p on 100k x 10k d=0.03 (30M nnz) --------------
    rng = np.random.default_rng(42)
    X = sp.random(
        100_000, 10_000, density=0.03, format="csr", dtype=np.float64,
        random_state=rng,
        data_rvs=lambda s: (rng.poisson(1.5, s) + 1).astype(np.float64),
    ).astype(np.float32)
    m = SparseMatrix.from_scipy(X)
    sums = np.asarray(m.sum_row())

    def pipe():
        out = m.normalize(sums, 1e4, Direction.ROW).log1p_normalize()
        np.asarray(out.sum_row()[:1])  # sync

    t2 = _timed(pipe)
    print(f"#2 normalize+log1p 30M nnz: {t2*1e3:.0f} ms warm", file=sys.stderr)
    res["config2_normalize_log1p_30Mnnz"] = {"warm_s": round(t2, 4)}

    # -- #5 similarity over embeddings ------------------------------------
    E = rng.standard_normal((20_000, 50)).astype(np.float32)
    import jax.numpy as jnp

    Ed = jnp.asarray(E)
    cos = CosineSimilarity()
    euc = EuclideanSimilarity()

    def cos_run():
        np.asarray(cos.pairwise(Ed)[:1, :1])

    def euc_run():
        np.asarray(euc.pairwise(Ed)[:1, :1])

    t5c, t5e = _timed(cos_run), _timed(euc_run)
    print(
        f"#5 cosine 20k x 20k: {t5c*1e3:.0f} ms; euclidean {t5e*1e3:.0f} ms",
        file=sys.stderr,
    )
    res["config5_similarity_20k_50d"] = {
        "cosine_warm_s": round(t5c, 4),
        "euclidean_warm_s": round(t5e, 4),
    }

    # -- UMAP on 50k x 50 --------------------------------------------------
    centers = rng.standard_normal((10, 50)) * 6.0
    lab = rng.integers(0, 10, 50_000)
    Xu = (centers[lab] + rng.standard_normal((50_000, 50))).astype(np.float32)
    t0 = time.perf_counter()
    emb = UMAP(UMAPConfig(n_neighbors=15, n_epochs=200)).fit_transform(Xu)
    emb_np = np.asarray(emb)
    t_umap = time.perf_counter() - t0
    assert np.isfinite(emb_np).all()
    within = np.mean(
        [
            np.linalg.norm(
                emb_np[lab == c] - emb_np[lab == c].mean(0), axis=1
            ).mean()
            for c in range(10)
        ]
    )
    centers2 = np.stack([emb_np[lab == c].mean(0) for c in range(10)])
    dmat = np.linalg.norm(
        centers2[:, None] - centers2[None, :], axis=-1
    )
    min_across = dmat[dmat > 0].min()
    print(
        f"UMAP 50k x 50 -> 2d: {t_umap:.1f} s end-to-end (cold incl. "
        f"compile); separation min-across/within = {min_across/within:.1f}",
        file=sys.stderr,
    )
    assert min_across > 2 * within
    res["umap_50k_50d"] = {
        "end_to_end_cold_s": round(t_umap, 1),
        "separation_ratio": round(float(min_across / within), 2),
    }

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
