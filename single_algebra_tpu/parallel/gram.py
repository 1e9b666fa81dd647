"""Row-sharded Gram-PCA engine: exact two-pass PCA over a device mesh.

The single-chip :class:`~single_algebra_tpu.linalg.gram.GramPCAEngine` does
exact PCA in two data passes (slab densify -> ``G += D D^T`` on the MXU,
p-space solve, one projection pass). Sharding it follows the same recipe as
the other engines: each device holds a contiguous row slab's overflow-free
column-tiled payload; the Gram accumulation is embarrassingly local with a
single ``psum`` at the end (G is p x p — tiny next to the data); the solve
runs replicated; the projection is purely local (output row-sharded).

Collective cost per fit: ONE psum of ``[pp, pp]`` floats — independent of
n. This is the minimum-communication schedule for tall-skinny PCA (the
p-width statistics are the only cross-slab coupling).

Payload shapes are uniform across devices (global ``wt`` = max over slabs,
per-slab layouts padded on the width axis), so the whole engine is plain
``shard_map`` over stacked arrays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse import convert as _cv
from ..sparse.matrix import SparseMatrix

__all__ = ["ShardedGram", "sharded_gram_pca"]


def _local_gram(td, tl, *, wt, nt, ct, slab, exact):
    """G contribution of one device's payload [nt*wt, Rs] (sum over its
    Rs/slab sub-slabs)."""

    from ..ops.pallas.spmm_kernel import tiled_ell_densify_t

    interpret = jax.default_backend() != "tpu"
    rs = td.shape[1]
    pp = nt * ct
    block_rows = min(1024, slab)

    def densify(i, out_dtype):
        tds = jax.lax.dynamic_slice(td, (0, i * slab), (td.shape[0], slab))
        tls = jax.lax.dynamic_slice(tl, (0, i * slab), (tl.shape[0], slab))
        return tiled_ell_densify_t(
            tds, tls, wt=wt, ntiles=nt, col_tile=ct,
            block_rows=block_rows, out_dtype=out_dtype,
            interpret=interpret,
        )

    def body(i, G):
        if exact:
            D = densify(i, jnp.bfloat16)
            return G + jax.lax.dot_general(
                D, D, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        D = densify(i, jnp.float32)
        return G + jax.lax.dot_general(
            D, D, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    G0 = jnp.zeros((pp, pp), jnp.float32)
    return jax.lax.fori_loop(0, rs // slab, body, G0)


def _local_project(td, tl, Vp, corr, *, wt, nt, ct, slab):
    """[Rs, k] local projection ``D^T V - 1 corr^T`` of one device slab."""

    from ..ops.pallas.spmm_kernel import tiled_ell_densify_t

    interpret = jax.default_backend() != "tpu"
    rs = td.shape[1]
    k = Vp.shape[1]
    block_rows = min(1024, slab)

    def body(i, T):
        tds = jax.lax.dynamic_slice(td, (0, i * slab), (td.shape[0], slab))
        tls = jax.lax.dynamic_slice(tl, (0, i * slab), (tl.shape[0], slab))
        D = tiled_ell_densify_t(
            tds, tls, wt=wt, ntiles=nt, col_tile=ct,
            block_rows=block_rows, out_dtype=jnp.float32,
            interpret=interpret,
        )
        Ts = jax.lax.dot_general(
            D, Vp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.lax.dynamic_update_slice(T, Ts, (i * slab, 0))

    T0 = jnp.zeros((rs, k), jnp.float32)
    return jax.lax.fori_loop(0, rs // slab, body, T0) - corr[None, :]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedGram:
    """Row-sharded overflow-free tiled payload + the Gram machinery."""

    tdata: jnp.ndarray  # [ndev, nt*wt, Rs]  P(axis, None, None)
    tlocal: jnp.ndarray
    shape: Tuple[int, int]
    meta: Tuple[int, int, int, int, bool]  # wt, nt, ct, slab, exact
    mesh: Mesh
    axis_name: str

    @classmethod
    def from_matrix(
        cls,
        m: SparseMatrix,
        mesh: Mesh,
        axis_name: str = "rows",
        col_tile: int | None = None,
        slab: int | None = None,
    ) -> "ShardedGram":
        if m.format != "csr":
            m = m.transpose()
        m._require_host_structure()
        n, p = m.shape
        ndev = mesh.shape[axis_name]
        if slab is None:
            if n >= 8192 * ndev:
                slab = 8192
            else:
                slab = max(_cv.round_up(-(-n // ndev), 128), 128)
                if slab > 1024:
                    # the densify kernel needs slab % block_rows == 0 with
                    # block_rows = min(1024, slab)
                    slab = min(_cv.round_up(slab, 1024), 8192)
        assert slab <= 1024 or slab % 1024 == 0, slab
        rs = _cv.round_up(-(-n // ndev), slab)

        if col_tile is None:
            from ..linalg.gram import GramPCAEngine
            from ..linalg.operators import DensifiedOperator

            # per-device budget: the payload splits ndev ways
            budget = DensifiedOperator.hbm_budget_bytes() * ndev
            col_tile, _ = GramPCAEngine.choose_col_tile(m, budget)
        ct = col_tile
        nt = max(-(-p // ct), 1)

        indptr, indices = m._h_indptr, m._h_indices
        data = m._csr_data_host()
        exact = m.values_bf16_exact()

        # per-slab conversion at quantile=1.0, padded to the global width
        slabs = []
        wt = 1
        for d in range(ndev):
            r0, r1 = min(d * rs, n), min((d + 1) * rs, n)
            lo, hi = int(indptr[r0]), int(indptr[r1])
            s_indptr = (
                indptr[r0 : r1 + 1] - lo if r1 > r0 else np.zeros(1, np.int64)
            )
            td, tl, wt_d, nt_d, _, _, ovw = _cv.csr_to_tiled_ell_split_numpy(
                s_indptr, indices[lo:hi], data[lo:hi],
                max(r1 - r0, 0), p,
                col_tile=ct, rows_padded_to=rs, quantile=1.0,
            )
            assert ovw == 0 and nt_d == nt
            slabs.append((td, tl, wt_d))
            wt = max(wt, wt_d)

        tdata = np.zeros((ndev, nt * wt, rs), np.float32)
        tlocal = np.zeros((ndev, nt * wt, rs), np.int32)
        for d, (td, tl, wt_d) in enumerate(slabs):
            # width-pad [nt*wt_d, rs] -> [nt, wt, rs] (slot = tile*wt+rank)
            tdata[d, :, :] = np.pad(
                td.reshape(nt, wt_d, rs), ((0, 0), (0, wt - wt_d), (0, 0))
            ).reshape(nt * wt, rs)
            tlocal[d, :, :] = np.pad(
                tl.reshape(nt, wt_d, rs), ((0, 0), (0, wt - wt_d), (0, 0))
            ).reshape(nt * wt, rs)

        sh = NamedSharding(mesh, P(axis_name, None, None))
        return cls(
            jax.device_put(tdata, sh),
            jax.device_put(tlocal, sh),
            (n, p),
            (wt, nt, ct, slab, exact),
            mesh,
            axis_name,
        )

    # -- device passes ---------------------------------------------------

    @jax.jit
    def gram(self) -> jnp.ndarray:
        """Replicated ``A^T A`` [pp, pp] — local accumulation + one psum."""

        wt, nt, ct, slab, exact = self.meta
        ax = self.axis_name

        def local(td, tl):
            G = _local_gram(
                td[0], tl[0], wt=wt, nt=nt, ct=ct, slab=slab, exact=exact
            )
            return jax.lax.psum(G, ax)

        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None, None)),
            out_specs=P(),
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )(self.tdata, self.tlocal)

    def gram_cached(self) -> jnp.ndarray:
        g = getattr(self, "_gram_cache", None)
        if g is None:
            g = self.gram()
            self._gram_cache = g
        return g

    @partial(jax.jit, static_argnames=())
    def project(self, Vp: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
        """Row-sharded scores ``(A - 1 mu^T) V`` -> [n, k]; no collectives
        (Vp [pp, k] and corr [k] are replicated)."""

        wt, nt, ct, slab, _ = self.meta
        ax = self.axis_name

        def local(td, tl, Vp, corr):
            return _local_project(
                td[0], tl[0], Vp, corr, wt=wt, nt=nt, ct=ct, slab=slab
            )

        T = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None, None), P(), P()),
            out_specs=P(ax, None),
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )(self.tdata, self.tlocal, Vp, corr)
        return T[: self.shape[0]]

    def tree_flatten(self):
        return (self.tdata, self.tlocal), (
            self.shape, self.meta, self.mesh, self.axis_name,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def sharded_gram_pca(
    m: SparseMatrix,
    mesh: Mesh,
    n_components: int = 50,
    center: bool = True,
    seed: int = 42,
    mask=None,
    axis_name: str = "rows",
):
    """Exact two-pass PCA over the mesh. Returns the same tuple fields as
    ``sharded_pca_fit_transform`` (transformed row-sharded, components,
    explained_variance, mean, total_variance)."""

    from ..linalg.gram import solve_gram_topk

    cache = getattr(m, "_operator_cache", None)
    key = f"sharded:gram:{mesh.shape}:{tuple(d.id for d in mesh.devices.flat)}"
    if cache is not None and key in cache:
        op = cache[key]
    else:
        op = ShardedGram.from_matrix(m, mesh, axis_name=axis_name)
        if cache is not None:
            cache[key] = op

    n, p = op.shape
    pp = op.meta[1] * op.meta[2]
    k = n_components

    # host f64 column moments (exact, one numpy pass, cached on the matrix)
    from ..models.pca import _host_col_stats

    s64, sq64 = _host_col_stats(m)
    mean64 = s64 / n
    mean = jnp.asarray(mean64.astype(np.float32))

    G = op.gram_cached()

    idx_np = None
    if mask is not None:
        mask = np.asarray(mask, bool)
        if mask.shape[0] != p:
            raise ValueError(
                "The mask vector length and the number of features (columns)"
                " have to be the same!"
            )
        idx_np = np.where(mask)[0]
        idx = jnp.asarray(idx_np.astype(np.int32))
        Gs = jnp.take(jnp.take(G, idx, axis=0), idx, axis=1)
        mu_solve = jnp.take(
            jnp.pad(mean, (0, pp - p)), idx
        )
    else:
        Gs = G
        mu_solve = jnp.pad(mean, (0, pp - p))

    s_dev, vt = solve_gram_topk(
        Gs, mu_solve, jnp.asarray(n), seed, k=k, center=center
    )

    # scatter V to padded full width for the local projections
    if idx_np is not None:
        Vp = jnp.zeros((pp, k), jnp.float32).at[
            jnp.asarray(idx_np.astype(np.int32))
        ].set(vt.T)
        comps = vt
    else:
        Vp = jnp.pad(vt.T, ((0, pp - vt.shape[1]), (0, 0)))
        comps = vt[:, :p]
    from ..types import MATMUL_PRECISION

    corr = (
        jnp.dot(mu_solve, vt.T, precision=MATMUL_PRECISION)
        if center
        else jnp.zeros((k,), jnp.float32)
    )
    T = op.project(Vp, corr)

    ev64 = np.asarray(s_dev, np.float64) ** 2 / max(n - 1, 1)
    if center:
        var_all = (sq64 - mean64 * s64) / max(n - 1, 1)
        total_var = float(
            var_all.sum() if idx_np is None else var_all[idx_np].sum()
        )
    else:
        total_var = float(ev64.sum())

    from .pca import ShardedPCAResult

    return ShardedPCAResult(
        T, comps, jnp.asarray(ev64.astype(np.float32)), mean,
        total_var,
    )
