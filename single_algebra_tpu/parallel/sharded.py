"""Row-sharded sparse operator over a device mesh.

The reference's entire parallelism story is Rayon threads in one process
(SURVEY.md §2.3 — no distributed backend exists). The TPU-native scaling
axis is the cell/sample (row) dimension sharded across a
``jax.sharding.Mesh``: each device holds a contiguous row slab of the matrix
in TWO layouts —

* the slab's row-major ELL  -> ``A @ B`` is embarrassingly local
  (B replicated, output row-sharded; zero collectives), and
* the slab's **transposed** ELL (column-major with slab-local row ids)
  -> ``A^T @ C = sum_slabs A_slab^T @ C_slab`` is one local SpMM followed by
  a single ``psum`` over ICI.

Column statistics ride the same transposed layout (local width-reductions +
``psum``), replacing the reference's ``_chunk`` streaming accumulators
(``src/sparse/mod.rs:44-50``) with device-parallel slabs.

Everything is expressed with ``shard_map`` inside ``jit`` so the collective
schedule is explicit and the operator plugs unchanged into the jitted SVD
engines (``randomized_svd(ShardedSpMM(...), ...)``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.spmm import ell_spmm
from ..sparse import convert as _cv
from ..sparse.matrix import SparseMatrix

__all__ = ["ShardedSpMM", "make_mesh"]


def make_mesh(n_devices: int | None = None, axis_name: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedSpMM:
    """Row-sharded sparse operator (mv/rmv/shape protocol).

    Build with :meth:`from_matrix`; arrays are placed with NamedShardings so
    XLA never moves slab data between devices.
    """

    row_data: jnp.ndarray  # [ndev * Rs, Wr]   sharded P(axis, None)
    row_ids: jnp.ndarray  # [ndev * Rs, Wr]
    tr_data: jnp.ndarray  # [ndev, Pp, Wt]    sharded P(axis, None, None)
    tr_ids: jnp.ndarray  # [ndev, Pp, Wt]    slab-LOCAL row indices
    tr_nnz: jnp.ndarray  # [ndev, Pp]
    shape: Tuple[int, int]
    rows_per_shard: int
    mesh: Mesh
    axis_name: str

    # -- construction ---------------------------------------------------

    @classmethod
    def from_matrix(
        cls,
        m: SparseMatrix,
        mesh: Mesh,
        axis_name: str = "rows",
    ) -> "ShardedSpMM":
        if m.format != "csr":
            m = m.transpose()  # row-major view of the same logical matrix
        m._require_host_structure()
        n, p = m.shape
        ndev = mesh.shape[axis_name]
        rs = _cv.round_up(-(-n // ndev), 8)
        pp = _cv.pad_rows(p)

        indptr = m._h_indptr
        indices = m._h_indices
        data = m._csr_data_host()

        # per-slab layouts, padded to common widths across slabs
        slab_row, slab_tr = [], []
        wr = wt = 1
        for d in range(ndev):
            # clamp BOTH bounds: sublane rounding of rs can push d*rs past
            # n for trailing devices (empty slabs fall through n_rows==0)
            r0, r1 = min(d * rs, n), min((d + 1) * rs, n)
            lo, hi = int(indptr[r0]), int(indptr[r1])
            s_indptr = indptr[r0 : r1 + 1] - lo if r1 > r0 else np.zeros(1, np.int64)
            s_idx = indices[lo:hi]
            s_dat = data[lo:hi]
            n_rows = max(r1 - r0, 0)
            wr = max(wr, int(np.diff(s_indptr).max()) if n_rows else 1)
            t_indptr, t_indices, t_data = _cv.csr_transpose_numpy(
                s_indptr, s_idx, s_dat, n_rows, p
            )
            wt = max(wt, int(np.diff(t_indptr).max()) if len(t_indices) else 1)
            slab_row.append((s_indptr, s_idx, s_dat, n_rows))
            slab_tr.append((t_indptr, t_indices, t_data))

        wr = _cv.pad_width(wr)
        wt = _cv.pad_width(wt)

        row_data = np.zeros((ndev * rs, wr), data.dtype)
        row_ids = np.zeros((ndev * rs, wr), np.int32)
        tr_data = np.zeros((ndev, pp, wt), data.dtype)
        tr_ids = np.zeros((ndev, pp, wt), np.int32)
        tr_nnz = np.zeros((ndev, pp), np.int32)
        for d in range(ndev):
            s_indptr, s_idx, s_dat, n_rows = slab_row[d]
            if n_rows:
                ed, ei, _ = _cv.csr_to_ell_numpy(
                    s_indptr, s_idx, s_dat, n_rows, width=wr, rows_padded=rs
                )
                row_data[d * rs : (d + 1) * rs] = ed
                row_ids[d * rs : (d + 1) * rs] = ei
            t_indptr, t_indices, t_dat = slab_tr[d]
            ed, ei, en = _cv.csr_to_ell_numpy(
                t_indptr, t_indices, t_dat, p, width=wt, rows_padded=pp
            )
            tr_data[d], tr_ids[d], tr_nnz[d] = ed, ei, en

        row_sh = NamedSharding(mesh, P(axis_name, None))
        tr_sh = NamedSharding(mesh, P(axis_name, None, None))
        tr2_sh = NamedSharding(mesh, P(axis_name, None))
        return cls(
            jax.device_put(row_data, row_sh),
            jax.device_put(row_ids, row_sh),
            jax.device_put(tr_data, tr_sh),
            jax.device_put(tr_ids, tr_sh),
            jax.device_put(tr_nnz, tr2_sh),
            (n, p),
            rs,
            mesh,
            axis_name,
        )

    # -- operator protocol ---------------------------------------------

    @property
    def n_padded(self) -> int:
        return self.row_data.shape[0]

    def mv(self, B: jnp.ndarray) -> jnp.ndarray:
        """A @ B -> [n, k] row-sharded; no collectives."""

        ax = self.axis_name

        def local(rd, ri, Bf):
            return ell_spmm(rd, ri, Bf)

        out = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None), P(ax, None), P()),
            out_specs=P(ax, None),
        )(self.row_data, self.row_ids, B)
        return out[: self.shape[0]]

    def rmv(self, C: jnp.ndarray) -> jnp.ndarray:
        """A^T @ C -> [p, k] replicated; one psum over the mesh axis."""

        ax = self.axis_name
        Cp = jnp.zeros((self.n_padded, C.shape[1]), C.dtype)
        Cp = jax.lax.dynamic_update_slice(Cp, C.astype(Cp.dtype), (0, 0))

        def local(td, ti, Cl):
            part = ell_spmm(td[0], ti[0], Cl)  # [Pp, k]
            return jax.lax.psum(part, ax)

        out = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None, None), P(ax, None)),
            out_specs=P(),
        )(self.tr_data, self.tr_ids, Cp)
        return out[: self.shape[1]]

    @jax.jit
    def col_stats(self) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(sum, sum_sq, nnz_count) per column — local width-reductions on
        the transposed slabs + one psum. Jitted: an eager shard_map retraces
        on every call, which costs seconds per dispatch on tunneled TPUs."""

        ax = self.axis_name

        def local(td, ti, tn):
            s = jnp.sum(td[0], axis=1)
            sq = jnp.sum(td[0] * td[0], axis=1)
            cnt = tn[0].astype(jnp.int32)
            return jax.lax.psum((s, sq, cnt), ax)

        s, sq, cnt = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None, None), P(ax, None, None), P(ax, None)),
            out_specs=(P(), P(), P()),
        )(self.tr_data, self.tr_ids, self.tr_nnz)
        p = self.shape[1]
        return s[:p], sq[:p], cnt[:p]

    # -- pytree ---------------------------------------------------------

    def tree_flatten(self):
        children = (
            self.row_data,
            self.row_ids,
            self.tr_data,
            self.tr_ids,
            self.tr_nnz,
        )
        aux = (self.shape, self.rows_per_shard, self.mesh, self.axis_name)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedDensified:
    """Row-sharded dense-bf16 engine: the north-star configuration.

    A 1M x 30k matrix is ~60 GB as bf16 — beyond one chip but ~7.5 GB per
    chip on a v5e-8 mesh. Each device holds a row slab of the densified
    matrix (hi, and lo when the data is not bf16-exact); ``A @ B`` is a
    local MXU matmul (B replicated), ``A^T @ C`` is a local matmul plus one
    ``psum`` over ICI. Collective layout follows the scaling-book recipe:
    shard the big axis, replicate the skinny sketch operands.
    """

    hi: jnp.ndarray  # [Np, p] bf16, sharded P(axis, None)
    lo: jnp.ndarray | None
    shape: Tuple[int, int]
    mesh: Mesh
    axis_name: str

    @classmethod
    def from_matrix(
        cls, m: SparseMatrix, mesh: Mesh, axis_name: str = "rows"
    ) -> "ShardedDensified":
        from ..linalg.operators import DensifiedOperator

        # host densify (native C++); rows are padded and sharded straight
        # from HOST memory — the full dense array must never be staged on
        # one device (the north-star 1M x 30k is ~60 GB bf16, far beyond
        # a single chip's HBM but fine in host RAM)
        hi_np, lo_np = DensifiedOperator.densify_host(m)
        n, p = m.shape
        ndev = mesh.shape[axis_name]
        rs = _cv.round_up(-(-n // ndev), 8)
        pad = ndev * rs - n
        sh = NamedSharding(mesh, P(axis_name, None))

        def place(arr):
            if arr is None:
                return None
            a = np.pad(arr, ((0, pad), (0, 0))) if pad else arr
            return jax.device_put(a, sh)

        return cls(place(hi_np), place(lo_np), (n, p), mesh, axis_name)

    def _dots(self, x, B, dims):
        return jax.lax.dot_general(
            x,
            B.astype(jnp.bfloat16),
            dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mv(self, B):
        ax = self.axis_name

        def local(hi, Bf):
            return self._dots(hi, Bf, ((1,), (0,)))

        out = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None), P()),
            out_specs=P(ax, None),
        )(self.hi, B)
        return out[: self.shape[0]].astype(B.dtype)

    def rmv(self, C):
        ax = self.axis_name
        Np = self.hi.shape[0]
        Cp = jnp.zeros((Np, C.shape[1]), C.dtype)
        Cp = jax.lax.dynamic_update_slice(Cp, C, (0, 0))

        def local(hi, Cl):
            part = self._dots(hi, Cl, ((0,), (0,)))
            return jax.lax.psum(part, ax)

        out = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None), P(ax, None)),
            out_specs=P(),
        )(self.hi, Cp)
        return out.astype(C.dtype)

    def _precise(self, B, dims, mv_like):
        ax = self.axis_name
        parts = [self.hi] + ([self.lo] if self.lo is not None else [])
        # barrier the hi cast: XLA:TPU folds the f32->bf16->f32 round trip
        # to identity otherwise, zeroing the compensation term (see
        # DensifiedOperator._split)
        b_hi = jax.lax.optimization_barrier(B.astype(jnp.bfloat16))
        b_lo = (B - b_hi.astype(B.dtype)).astype(jnp.bfloat16)

        def local(*args):
            *mats, bh, bl = args
            acc = None
            for a in mats:
                term = self._dots(a, bh, dims) + self._dots(a, bl, dims)
                acc = term if acc is None else acc + term
            if not mv_like:
                acc = jax.lax.psum(acc, ax)
            return acc

        if mv_like:
            in_specs = tuple([P(ax, None)] * len(parts)) + (P(), P())
            out = jax.shard_map(
                local, mesh=self.mesh, in_specs=in_specs,
                out_specs=P(ax, None),
            )(*parts, b_hi, b_lo)
            return out[: self.shape[0]].astype(B.dtype)
        in_specs = tuple([P(ax, None)] * len(parts)) + (
            P(ax, None), P(ax, None),
        )
        out = jax.shard_map(
            local, mesh=self.mesh, in_specs=in_specs, out_specs=P()
        )(*parts, b_hi, b_lo)
        return out.astype(B.dtype)

    def mv_precise(self, B):
        return self._precise(B, ((1,), (0,)), True)

    def rmv_precise(self, C):
        Np = self.hi.shape[0]
        Cp = jnp.zeros((Np, C.shape[1]), C.dtype)
        Cp = jax.lax.dynamic_update_slice(Cp, C, (0, 0))
        return self._precise(Cp, ((0,), (0,)), False)

    @jax.jit
    def col_stats(self):
        ax = self.axis_name
        parts = [self.hi] + ([self.lo] if self.lo is not None else [])

        def local(*mats):
            x = mats[0].astype(jnp.float32)
            for a in mats[1:]:
                x = x + a.astype(jnp.float32)
            return jax.lax.psum(
                (jnp.sum(x, axis=0), jnp.sum(x * x, axis=0)), ax
            )

        in_specs = tuple([P(ax, None)] * len(parts))
        s, sq = jax.shard_map(
            local, mesh=self.mesh, in_specs=in_specs, out_specs=(P(), P())
        )(*parts)
        return s, sq

    def tree_flatten(self):
        if self.lo is None:
            return (self.hi,), (self.shape, self.mesh, self.axis_name, False)
        return (self.hi, self.lo), (
            self.shape, self.mesh, self.axis_name, True,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, mesh, axis_name, has_lo = aux
        if has_lo:
            return cls(children[0], children[1], shape, mesh, axis_name)
        return cls(children[0], None, shape, mesh, axis_name)
