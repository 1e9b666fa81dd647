"""Test the projected-Gram EV re-score for A-space randomized engines.

probe_sharded_acc.py (round 5) proved: sharded dense == 1-dev dense
bit-for-bit, the returned SUBSPACE is f64-Rayleigh-good to 1.5e-8, and
the 1.4e-5 ev_rel_err lives entirely in the sigma evaluation (B = A_c^T Q
+ small SVD; even an all-f32 HIGHEST operator floors at 4.8e-6). The
sharded_gram row (1.4e-7, plain f32) says the Gram-space evaluation of
the same quantities is ~100x more accurate on this data. So: re-score
EVs from the solver's V via the k-dim projected Gram
    W = A @ V            (one extra mv, uncentered)
    H = (W^T W - n (mu V)(mu V)^T) / (n - 1)
    ev = eigvalsh(H)
and compare against the solver's s^2/(n-1).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from single_algebra_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from _datagen import cluster_counts
from sharded_on_tpu import N, P, K, SEED, host_truth

def per_rank(ev, ev_ref):
    ev = np.asarray(ev, np.float64)[: len(ev_ref)]
    return np.abs(ev - ev_ref) / ev_ref[0]

def show(tag, e):
    print(f"{tag}: max {e.max():.2e}  head {e[:4]}", flush=True)

def main():
    assert jax.default_backend() == "tpu"
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.models import SparsePCABuilder
    from single_algebra_tpu.types import PowerIterationNormalizer, SVDMethod

    X = cluster_counts(N, P, n_clusters=32, seed=SEED).astype(np.float32)
    ev_ref = host_truth(X, K)
    m = SparseMatrix.from_scipy(X)
    method = SVDMethod.random(10, 7, PowerIterationNormalizer.QR)
    p = (SparsePCABuilder().n_components(K).svd_method(method)
         .engine("dense").random_seed(SEED).build())
    p.fit(m)
    show("solver s^2      ", per_rank(p.explained_variance_, ev_ref))

    from single_algebra_tpu.models.pca import make_engine_operator
    op = make_engine_operator(m, "dense")
    V = jnp.asarray(p.components_).T.astype(jnp.float32)  # [p, k]
    mu = jnp.asarray(np.asarray(X.mean(axis=0), np.float64).astype(np.float32)).ravel()

    @jax.jit
    def tail(W, V, mu):
        WtW = jax.lax.dot_general(
            W, W, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mv_ = mu @ V                  # [k]
        H = (WtW - N * jnp.outer(mv_, mv_)) / (N - 1)
        H = (H + H.T) / 2
        return jnp.linalg.eigvalsh(H)[::-1]

    # op matvecs are jitted internally; jitting over the closed-over op
    # would bake the payload into the compile request (HTTP 413 through
    # the tunnel), so call them eagerly and jit only the k-dim tail.
    ev2 = tail(op.mv_precise(V), V, mu)
    show("projected-Gram  ", per_rank(ev2, ev_ref))

    ev3 = tail(op.mv(V), V, mu)
    show("proj-Gram (fast)", per_rank(ev3, ev_ref))

    # f64 bookkeeping variant: pull WtW and mv to host, finish in f64
    W = np.asarray(op.mv_precise(V), np.float64)
    WtW = W.T @ W
    mvh = np.asarray(mu, np.float64) @ np.asarray(V, np.float64)
    H = (WtW - N * np.outer(mvh, mvh)) / (N - 1)
    ev4 = np.linalg.eigvalsh((H + H.T) / 2)[::-1]
    show("proj-Gram f64bk ", per_rank(ev4, ev_ref))

    # ---- Gram-route variants: G = A^T A formed by the gram machinery
    # (exact f32 for integer counts), then H = V^T Gc V.  The W-route
    # above rounds every A@V MAC at the UNCENTERED row scale; here the
    # only uncentered-scale rounding is forming Gc = G - n mu mu^T
    # (one rounding per entry), after which every contraction runs at
    # the centered scale.
    from single_algebra_tpu.parallel.sharded import make_mesh
    from single_algebra_tpu.parallel.gram import ShardedGram

    mesh = make_mesh()
    gop = ShardedGram.from_matrix(m, mesh)
    G = gop.gram_cached()  # [pp, pp] replicated f32
    pp = G.shape[0]
    mu_p = jnp.pad(mu, (0, pp - mu.shape[0]))
    V_p = jnp.pad(V, ((0, pp - V.shape[0]), (0, 0)))

    @jax.jit
    def gram_tail_formed(G, mu_p, V_p):
        Gc = G - jnp.float32(N) * jnp.outer(mu_p, mu_p)
        M = jax.lax.dot_general(
            Gc, V_p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        H = jax.lax.dot_general(
            V_p, M, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / (N - 1)
        H = (H + H.T) / 2
        return jnp.linalg.eigvalsh(H)[::-1]

    ev5 = gram_tail_formed(G, mu_p, V_p)
    show("VtGcV formed f32", per_rank(ev5, ev_ref))

    @jax.jit
    def gram_tail_rank1(G, mu_p, V_p):
        # rank-1-corrected (never forms Gc): M = G V - n mu (mu^T V)
        GV = jax.lax.dot_general(
            G, V_p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mv_ = mu_p @ V_p
        M = GV - jnp.float32(N) * mu_p[:, None] * mv_[None, :]
        H = jax.lax.dot_general(
            V_p, M, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / (N - 1)
        H = (H + H.T) / 2
        return jnp.linalg.eigvalsh(H)[::-1]

    ev6 = gram_tail_rank1(G, mu_p, V_p)
    show("VtGcV rank1 f32 ", per_rank(ev6, ev_ref))

    # host f64 bookkeeping from the device G (exact for counts): the
    # cheap exact finish for small p (pull p^2 f32 once per fit)
    Gh = np.asarray(G, np.float64)[: P, : P]
    Vh = np.asarray(V, np.float64)
    muh = np.asarray(mu, np.float64)
    Gch = Gh - N * np.outer(muh, muh)
    H = Vh.T @ Gch @ Vh / (N - 1)
    ev7 = np.linalg.eigvalsh((H + H.T) / 2)[::-1]
    show("VtGcV f64 host  ", per_rank(ev7, ev_ref))

if __name__ == "__main__":
    main()
