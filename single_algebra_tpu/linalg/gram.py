"""Gram-matrix PCA engine: exact PCA in two data passes.

The one-hot tiled SpMM pays ~32 VPU ops per DENSE element per product, and
a randomized-SVD fit makes ~32 such passes — the TPU-native alternative for
tall-skinny matrices (n >> p, p small enough that the p x p Gram matrix is
cheap) is the classic covariance method restructured for the MXU:

1. **Densify-and-contract once**: row slabs of the column-tiled payload are
   expanded to dense ``D_s [p, S]`` tiles by one one-hot Pallas pass
   (``tiled_ell_densify_t``) and immediately contracted ``G += D_s @ D_s^T``
   on the MXU inside a ``lax.fori_loop``. One pass over the data instead of
   ~32; the Gram flops ride the MXU at bf16 speed when the values are
   bf16-exact (raw counts always are).
2. **Solve in p-space**: eigenvectors of the (optionally centered) Gram
   matrix are the right singular vectors of A; ``eig(G_c) = s^2``. The
   top-k are extracted with the existing jitted randomized SVD — the
   centered Gram is symmetric PSD, and squaring the spectrum doubles the
   effective gap, so a handful of subspace iterations reach f32 accuracy.
3. **Project**: ``T = A V - 1 (mu^T V)`` with a second slab-densify pass
   (the dense slabs are never materialized in full).

The Gram matrix is computed once per matrix and cached, so repeated fits
(different k, masks, seeds) cost only the tiny p-space solve plus one
projection pass. A boolean feature mask is a SUBMATRIX of the cached G —
masked PCA at scale reuses the same two-pass machinery.

This engine requires an overflow-free (quantile=1.0) tiled layout so the
slab densify is exact; ``from_matrix`` returns the padded width, and the
'auto' selector only picks 'gram' when that payload fits the HBM budget.

Semantic map to the reference: this is an exact implementation of the PCA
the reference computes approximately (randomized path,
``src/dimred/pca/sparse/mod.rs:170-179``); with ``center_svd=False`` it is
the truncated SVD of raw X (the reference's Lanczos-path semantics,
SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import MATMUL_PRECISION, PowerIterationNormalizer
from .operators import DenseOperator
from .svd import randomized_svd, svd_flip

__all__ = ["GramPCAEngine", "gram_matrix", "gram_pca_graph"]

_SLAB = 8192  # rows densified per Gram/projection step


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GramPCAEngine:
    """Overflow-free tiled payload + slab-densify machinery."""

    tdata: jnp.ndarray  # [nt * wt, Rp]
    tlocal: jnp.ndarray
    shape: Tuple[int, int]
    meta: Tuple[int, int, int, bool]  # wt, ntiles, ct, exact_bf16

    COL_TILE = 256  # default; from_matrix picks adaptively (see below)
    COL_TILES = (256, 512, 1024)
    BLOCK_ROWS = 1024

    @classmethod
    def _payload_bytes_for(cls, m, col_tile: int) -> int:
        from ..sparse.convert import round_up, tiled_split_widths

        src = m._layout_for("row")
        src._require_host_structure()
        n, p = m.shape
        wt, ntiles, _, _ = tiled_split_widths(
            src._h_indptr, src._h_indices, n, p,
            col_tile=col_tile, quantile=1.0,
        )
        rp = round_up(n, _SLAB)
        pp = ntiles * col_tile
        # payload (f32 + i32) + G (rank-1-centered in the solve, so ONE
        # pp x pp copy) + the densified slab working set
        return ntiles * wt * rp * 8 + pp * pp * 4 + pp * _SLAB * 4 * 2

    @classmethod
    def choose_col_tile(cls, m, budget_bytes: int | None = None):
        """Smallest column tile whose overflow-free payload fits the HBM
        budget (small tiles = less one-hot VPU work per slot; large tiles
        absorb power-law rows with less global padding). Returns
        ``(col_tile, payload_bytes)`` — the best candidate even when none
        fits, so callers decide via ``fits()``."""

        from .operators import DensifiedOperator

        if budget_bytes is None:
            budget_bytes = DensifiedOperator.hbm_budget_bytes()
        best = None
        for ct in cls.COL_TILES:
            b = cls._payload_bytes_for(m, ct)
            if best is None or b < best[1]:
                best = (ct, b)
            if b <= budget_bytes:
                return ct, b
        return best

    @classmethod
    def from_matrix(cls, m) -> "GramPCAEngine":
        from ..sparse.convert import csr_to_tiled_ell_split_numpy

        import ml_dtypes

        n, p = m.shape
        ct, _ = cls.choose_col_tile(m)
        src = m._layout_for("row")
        src._require_host_structure()
        vals = src._csr_data_host()
        td, tl, wt, nt, _, _, ovw = csr_to_tiled_ell_split_numpy(
            src._h_indptr,
            src._h_indices,
            vals,
            n,
            p,
            col_tile=ct,
            rows_padded_to=_SLAB,
            quantile=1.0,  # no overflow: the slab densify must be exact
        )
        assert ovw == 0
        v32 = np.asarray(vals, np.float32)
        exact = not np.any(
            v32 - v32.astype(ml_dtypes.bfloat16).astype(np.float32)
        )
        return cls(
            jnp.asarray(td), jnp.asarray(tl), (n, p), (wt, nt, ct, exact)
        )

    @classmethod
    def payload_bytes(cls, m) -> int:
        """Device bytes of the best overflow-free payload + the Gram."""

        return cls.choose_col_tile(m)[1]

    @classmethod
    def fits(cls, m, budget_bytes: int | None = None) -> bool:
        from .operators import DensifiedOperator

        n, p = m.shape
        if p > 40960:  # G itself would crowd out HBM
            return False
        if budget_bytes is None:
            budget_bytes = DensifiedOperator.hbm_budget_bytes()
        return cls.choose_col_tile(m, budget_bytes)[1] <= budget_bytes

    # -- slab machinery ---------------------------------------------------

    @property
    def n_padded(self) -> int:
        return self.tdata.shape[1]

    @property
    def p_padded(self) -> int:
        return self.meta[1] * self.meta[2]

    def _densify_slab(self, i, out_dtype):
        from ..ops.pallas.spmm_kernel import tiled_ell_densify_t

        wt, nt, ct, _ = self.meta
        td = jax.lax.dynamic_slice(
            self.tdata, (0, i * _SLAB), (self.tdata.shape[0], _SLAB)
        )
        tl = jax.lax.dynamic_slice(
            self.tlocal, (0, i * _SLAB), (self.tlocal.shape[0], _SLAB)
        )
        interpret = jax.default_backend() != "tpu"
        return tiled_ell_densify_t(
            td, tl, wt=wt, ntiles=nt, col_tile=ct,
            block_rows=min(self.BLOCK_ROWS, _SLAB),
            out_dtype=out_dtype, interpret=interpret,
        )  # [Pp, SLAB]

    def _slab_dot(self, i, M, transposed: bool):
        """One slab product: ``D_i^T @ M`` ([SLAB, k], transposed=False) or
        ``D_i @ M_slab`` ([Pp, k], transposed=True) at full precision."""

        exact = self.meta[3]
        if exact:
            D = self._densify_slab(i, jnp.bfloat16)
            m_hi = M.astype(jnp.bfloat16)
            m_lo = (M - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((0,), (0,)) if not transposed else ((1,), (0,)))
            dot = lambda v: jax.lax.dot_general(
                D, v,
                dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
            )
            return dot(m_hi) + dot(m_lo)
        D = self._densify_slab(i, jnp.float32)
        dims = (((0,), (0,)) if not transposed else ((1,), (0,)))
        return jax.lax.dot_general(
            D, M,
            dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def mv(self, B):
        """A @ B via slab densify passes ([p, k] -> [n, k])."""

        k = B.shape[1]
        Bp = jnp.pad(
            B.astype(jnp.float32), ((0, self.p_padded - B.shape[0]), (0, 0))
        )

        def body(i, T):
            Ts = self._slab_dot(i, Bp, transposed=False)
            return jax.lax.dynamic_update_slice(T, Ts, (i * _SLAB, 0))

        T0 = jnp.zeros((self.n_padded, k), jnp.float32)
        out = jax.lax.fori_loop(0, self.n_padded // _SLAB, body, T0)
        return out[: self.shape[0]].astype(B.dtype)

    def rmv(self, C):
        """A^T @ C via slab densify passes ([n, k] -> [p, k])."""

        k = C.shape[1]
        Cp = jnp.pad(
            C.astype(jnp.float32), ((0, self.n_padded - C.shape[0]), (0, 0))
        )

        def body(i, acc):
            Cs = jax.lax.dynamic_slice(Cp, (i * _SLAB, 0), (_SLAB, k))
            return acc + self._slab_dot(i, Cs, transposed=True)

        acc0 = jnp.zeros((self.p_padded, k), jnp.float32)
        out = jax.lax.fori_loop(0, self.n_padded // _SLAB, body, acc0)
        return out[: self.shape[1]].astype(C.dtype)

    def tree_flatten(self):
        return (self.tdata, self.tlocal), (self.shape, self.meta)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # -- cached Gram -------------------------------------------------------

    def gram_cached(self) -> jnp.ndarray:
        g = getattr(self, "_gram_cache", None)
        if g is None:
            g = gram_matrix(self)
            self._gram_cache = g
        return g


def topk_psd_eigh(Gc: jnp.ndarray, k: int):
    """Exact top-k eigenpairs of a PSD matrix -> ``(s, vt)`` with
    ``s = sqrt(eig)`` and the V-based svd_flip sign convention. The robust
    choice for small Grams (pp <= ~4096): immune to flat spectra where
    subspace iteration stalls, and cheap at this size."""

    w, V = jnp.linalg.eigh(Gc)  # ascending
    s = jnp.sqrt(jnp.maximum(w[::-1][:k], 0.0))
    vt = V[:, ::-1][:, :k].T
    idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(k), idx])
    signs = jnp.where(signs == 0, 1.0, signs).astype(vt.dtype)
    return s, vt * signs[:, None]


# Grams at or below this width get the exact eigh solve; above it, the
# jitted randomized solve over the rank-1-centered operator
EIGH_MAX_PP = 4096


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _CenteredGram:
    """Symmetric operator ``G - c * mu mu^T`` (rank-1-centered Gram)."""

    G: jnp.ndarray
    mu: jnp.ndarray
    c: jnp.ndarray

    @property
    def shape(self):
        return self.G.shape

    def mv(self, B):
        corr = jnp.dot(self.mu, B, precision=MATMUL_PRECISION)  # [k]
        return (
            jnp.dot(self.G, B, precision=MATMUL_PRECISION)
            - self.c * self.mu[:, None] * corr[None, :]
        )

    rmv = mv  # symmetric

    def tree_flatten(self):
        return (self.G, self.mu, self.c), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.jit
def gram_matrix(eng: GramPCAEngine) -> jnp.ndarray:
    """``A^T A`` as ``[Pp, Pp]`` f32 — slab densify + MXU contraction.

    bf16 slabs (exact for raw-count data) ride the MXU at full speed; for
    general f32 values the slab stays f32 and the contraction runs at
    HIGHEST precision (6 bf16 passes, still one data pass overall).
    """

    exact = eng.meta[3]
    pp = eng.p_padded
    n_slabs = eng.n_padded // _SLAB

    def body(i, G):
        if exact:
            D = eng._densify_slab(i, jnp.bfloat16)
            return G + jax.lax.dot_general(
                D, D,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        D = eng._densify_slab(i, jnp.float32)
        return G + jax.lax.dot_general(
            D, D,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    G0 = jnp.zeros((pp, pp), jnp.float32)
    return jax.lax.fori_loop(0, n_slabs, body, G0)


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "center_svd",
        "center_T",
        "want_transform",
        "solver_oversamples",
        "solver_iters",
    ),
)
def gram_pca_graph(
    eng: GramPCAEngine,
    G: jnp.ndarray,
    mean: jnp.ndarray,  # [p] (zeros when uncentered)
    seed,
    *,
    k: int,
    center_svd: bool,
    center_T: bool,
    want_transform: bool,
    solver_oversamples: int = 10,
    solver_iters: int = 4,
    mask_idx: jnp.ndarray | None = None,
):
    """(s, vt, T) from the cached Gram matrix — one fused device dispatch.

    ``center_svd`` subtracts the rank-1 mean term from G before the solve
    (true PCA); ``center_T`` centers the projection (the reference applies
    it even on the uncentered Lanczos path, SURVEY.md §3.2). ``mask_idx``
    restricts features to a subset: the masked Gram is a submatrix.
    """

    n, p = eng.shape
    pp = G.shape[0]

    if mask_idx is not None:
        Gs = jnp.take(
            jnp.take(G, mask_idx, axis=0), mask_idx, axis=1
        )
        mu = jnp.take(
            jnp.pad(mean.astype(jnp.float32), (0, pp - mean.shape[0])),
            mask_idx,
        )
        p_out = mask_idx.shape[0]
    else:
        Gs = G
        mu = jnp.pad(mean.astype(jnp.float32), (0, pp - mean.shape[0]))
        p_out = p

    if Gs.shape[0] <= EIGH_MAX_PP:
        # exact solve — robust on flat spectra, trivial at this size
        Gc = (
            Gs - jnp.asarray(n, jnp.float32) * (mu[:, None] * mu[None, :])
            if center_svd
            else Gs
        )
        s, vt = topk_psd_eigh(Gc, k)
    else:
        solve_op = DenseOperator(Gs)
        if center_svd:
            # G_c = G - n mu mu^T as a rank-1 correction — never
            # materialize a second pp x pp array (at p=30k that copy
            # alone is 3.8 GB)
            solve_op = _CenteredGram(Gs, mu, jnp.asarray(n, jnp.float32))

        res = randomized_svd(
            solve_op,
            k,
            solver_oversamples,
            solver_iters,
            PowerIterationNormalizer.QR,
            seed=seed,
        )
        _, vt = svd_flip(res.u, res.vt, u_based_decision=False)
        s = jnp.sqrt(jnp.maximum(res.s, 0.0))
    if mask_idx is None:
        vt_out = vt[:, :p_out]
    else:
        vt_out = vt

    T = None
    if want_transform:
        # scatter V back to padded full width for the slab projection
        if mask_idx is not None:
            Vp = jnp.zeros((pp, k), jnp.float32).at[mask_idx].set(vt.T)
        else:
            Vp = jnp.pad(vt.T, ((0, pp - vt.shape[1]), (0, 0)))

        # _slab_dot contracts orthonormal V as a bf16 hi+lo pair on exact
        # payloads (two MXU passes, f32 accumulation) so no first-order
        # rounding enters the scores
        def body(i, T):
            Ts = eng._slab_dot(i, Vp, transposed=False)  # [SLAB, k]
            return jax.lax.dynamic_update_slice(T, Ts, (i * _SLAB, 0))

        T0 = jnp.zeros((eng.n_padded, k), jnp.float32)
        T = jax.lax.fori_loop(0, eng.n_padded // _SLAB, body, T0)[:n]
        if center_T:
            # mu and vt share the solve width (masked or padded-full)
            corr = jnp.dot(mu, vt.T, precision=MATMUL_PRECISION)  # [k]
            T = T - corr[None, :]
    return s, vt_out, T
