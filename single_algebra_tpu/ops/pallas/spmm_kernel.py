"""Pallas TPU SpMM kernel over the column-tiled padded-ELL layout.

The TPU has no efficient arbitrary gather/scatter, so the CSR SpMM the
reference drives with Rayon pointer-chasing (``A @ B`` inside
single-svdlib's sketching loops) is reformulated as *densify-then-contract*:

  for each (row-block i, column-tile t):
      D[col_tile, i_rows] <- one-hot accumulate of the tile's (lid, val)
                             pairs              (VPU: compare/select/add)
      out[:, i_rows]      += B[tile].T @ D      (MXU)

The one-hot build touches each stored slot once (~3 vreg-ops per slot at
col_tile=256) and the contraction runs at dense MXU speed — the classic
trade of a little dense compute for zero irregular memory traffic.

Everything lives in a TRANSPOSED orientation (entries/outputs have the row
axis on lanes): TPU block shapes need the last dim 128-divisible, and the
row axis is the only one guaranteed large — with rows on lanes every block
is (wt | kp | col_tile, block_rows) and tiles cleanly. The grid iterates
tiles innermost so each output block stays resident in VMEM and
accumulates across tiles.

Layout is produced host-side by ``convert.csr_to_tiled_ell_numpy``
(values + within-tile local column ids, per-(row, tile) groups padded to a
static width) and transposed on the host. Padding slots are (v=0, lid=0):
they add exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "tiled_ell_spmm_t",
    "tiled_ell_rmv_t",
    "tiled_ell_densify_t",
    "DEFAULT_COL_TILE",
    "DEFAULT_BLOCK_ROWS",
]

# measured on v5e at 60M nnz: (256, 1024) beats (256, 512) by ~8% and
# (512, *) by ~18% with no memory penalty; (128, 1024) is ~13% faster still
# but costs +32% HBM for the layout
DEFAULT_COL_TILE = 256
DEFAULT_BLOCK_ROWS = 1024

# Index-map constants must be explicit int32: with jax_enable_x64 on (the
# f64 configuration), a Python literal `0` traces as i64 and Mosaic fails
# to legalize the index-map function (`func.return (i64, i32)`), killing
# every tiled kernel on hardware. A numpy scalar stays i32 either way
# (and, unlike jnp.int32(0), doesn't touch the backend at import time).
_ZERO = np.int32(0)


def _check_mosaic_dtype(dtype, interpret: bool) -> None:
    # Mosaic has no 64-bit support; surface the limit at the API edge
    # instead of a NotImplementedError deep inside kernel lowering
    if not interpret and jnp.dtype(dtype).itemsize == 8:
        raise ValueError(
            f"Pallas TPU kernels do not support 64-bit dtypes (got {dtype});"
            " use engine='sparse' or 'gram' for f64 matrices, or fit in f32"
        )


def _onehot_densify(vals, lids, ct: int, wt: int):
    """[wt, BR] values+local ids -> one-hot densified [ct, BR] tile.

    The select always runs in (at least) 32-bit space: the i1 mask of an
    int32 compare carries the (8, 128) vreg layout, which Mosaic cannot
    relayout onto 16-bit value lanes ("Invalid relayout ... replicated in
    destination") — and v5e supports neither 16-bit iota nor 16-bit
    compares to build a (16, 128) mask directly. So bf16 payloads are
    upcast for the wt select-adds and the finished tile is cast back down
    once; the bf16 win stays where it matters (the MXU contraction runs
    native-bf16 instead of XLA's 6-pass f32 HIGHEST decomposition, and
    payload HBM traffic halves)."""

    br = vals.shape[1]
    out_dt = vals.dtype
    if out_dt.itemsize == 2:
        vals = vals.astype(jnp.float32)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (ct, br), 0)
    dense = jnp.zeros((ct, br), vals.dtype)
    for w in range(wt):
        lid_w = lids[w, :][None, :]  # [1, BR]
        v_w = vals[w, :][None, :]
        dense = dense + jnp.where(col_iota == lid_w, v_w, 0)
    return dense.astype(out_dt)


def _tile_dot_precision(dense_dtype):
    # HIGHEST forces the 6-pass decomposition on f32 inputs (wanted: that
    # path is the operator's exact mode) but is an invalid operand spec
    # for native-bf16 MXU contraction ("Bad lhs type")
    if jnp.dtype(dense_dtype).itemsize == 2:
        return None
    return jax.lax.Precision.HIGHEST


def _spmm_kernel(
    td_ref, tl_ref, bt_ref, o_ref, *, wt: int, ct: int, upcast: bool = False
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    dense = _onehot_densify(td_ref[...], tl_ref[...], ct, wt)
    bt = bt_ref[...]
    if upcast:  # interpret mode: XLA:CPU has no bf16 x bf16 -> f32 dot
        dense = dense.astype(jnp.float32)
        bt = bt.astype(jnp.float32)

    o_ref[...] += jnp.dot(
        bt,
        dense,
        preferred_element_type=o_ref.dtype,
        precision=_tile_dot_precision(dense.dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "wt", "ntiles", "col_tile", "block_rows", "out_dtype", "interpret",
    ),
)
def tiled_ell_spmm_t(
    tdata_t: jnp.ndarray,  # [ntiles * wt, R]  values, transposed layout
    tlocal_t: jnp.ndarray,  # [ntiles * wt, R]  int32 local col ids
    Bt: jnp.ndarray,  # [kp, ntiles * col_tile]  dense operand, transposed
    *,
    wt: int,
    ntiles: int,
    col_tile: int = DEFAULT_COL_TILE,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``out[k, r] = sum_nnz v * B[col, k]`` -> [kp, R] (transposed).

    ``Bt`` must be pre-padded to [kp (mult of 128), ntiles * col_tile].
    R must be a multiple of ``block_rows`` (a multiple of 128).
    ``out_dtype`` sets the accumulator/output dtype (default: the payload
    dtype) — bf16 payloads MUST accumulate in f32.

    The one-hot loop always runs the full static ``wt`` passes: a
    runtime-predicated variant driven by scalar-prefetched per-block true
    widths was built and MEASURED SLOWER (1.20 s vs 0.79 s warm at
    150k x 49k d=0.004) — at block_rows=1024 the per-block max width sits
    near the p99 ``wt`` anyway, and the predication forces the accumulator
    through a VMEM scratch round-trip per pass.
    """

    _check_mosaic_dtype(tdata_t.dtype, interpret)
    if out_dtype is None:
        # 16-bit payloads must NOT accumulate in their own dtype
        out_dtype = (
            jnp.float32
            if jnp.dtype(tdata_t.dtype).itemsize == 2
            else tdata_t.dtype
        )
    R = tdata_t.shape[1]
    kp = Bt.shape[0]
    assert R % block_rows == 0, (R, block_rows)
    # kp rides the SUBLANE axis everywhere in this kernel, so a multiple of
    # 8 suffices — [kp, R] outputs on multi-million-row matrices would waste
    # gigabytes if padded to a full lane (128)
    assert kp % 8 == 0 and Bt.shape[1] == ntiles * col_tile

    grid = (R // block_rows, ntiles)
    out = pl.pallas_call(
        functools.partial(
            _spmm_kernel, wt=wt, ct=col_tile,
            upcast=interpret and jnp.dtype(tdata_t.dtype).itemsize == 2,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (wt, block_rows), lambda i, t: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wt, block_rows), lambda i, t: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (kp, col_tile), lambda i, t: (_ZERO, t), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (kp, block_rows), lambda i, t: (_ZERO, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp, R), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ntiles * col_tile * kp,
            bytes_accessed=tdata_t.size * 8 + R * kp * 4,
            transcendentals=0,
        ),
    )(tdata_t, tlocal_t, Bt)
    return out


def _densify_kernel(td_ref, tl_ref, o_ref, *, wt: int, ct: int):
    dense = _onehot_densify(td_ref[...], tl_ref[...], ct, wt)
    o_ref[...] = dense.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "wt", "ntiles", "col_tile", "block_rows", "out_dtype", "interpret",
    ),
)
def tiled_ell_densify_t(
    tdata_t: jnp.ndarray,  # [ntiles * wt, R]
    tlocal_t: jnp.ndarray,  # [ntiles * wt, R] int32
    *,
    wt: int,
    ntiles: int,
    col_tile: int = DEFAULT_COL_TILE,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Expand the tiled layout into the TRANSPOSED dense matrix
    ``[ntiles * ct, R]`` (columns on sublanes, rows on lanes) — one one-hot
    pass. This is the front half of the Gram-PCA engine: each row SLAB is
    densified once and immediately contracted ``D @ D^T`` on the MXU, so
    the ~32-VPU-ops-per-dense-element one-hot cost is paid once per fit
    instead of once per SpMM in the sketching loop."""

    _check_mosaic_dtype(tdata_t.dtype, interpret)
    R = tdata_t.shape[1]
    assert R % block_rows == 0, (R, block_rows)
    grid = (ntiles, R // block_rows)
    return pl.pallas_call(
        functools.partial(_densify_kernel, wt=wt, ct=col_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (wt, block_rows), lambda t, i: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wt, block_rows), lambda t, i: (t, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (col_tile, block_rows), lambda t, i: (t, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles * col_tile, R), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=R * ntiles * col_tile,
            bytes_accessed=tdata_t.size * 8
            + R * ntiles * col_tile * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(tdata_t, tlocal_t)


def _rmv_kernel(
    td_ref, tl_ref, ct_ref, o_ref, *, wt: int, ct: int, upcast: bool = False
):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    dense = _onehot_densify(td_ref[...], tl_ref[...], ct, wt)
    c_op = ct_ref[...]
    if upcast:  # interpret mode: XLA:CPU has no bf16 x bf16 -> f32 dot
        dense = dense.astype(jnp.float32)
        c_op = c_op.astype(jnp.float32)

    # [ct, BR] x [kp, BR] -> [ct, kp], contracting the row axis
    o_ref[...] += jax.lax.dot_general(
        dense,
        c_op,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=o_ref.dtype,
        precision=_tile_dot_precision(dense.dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "wt", "ntiles", "col_tile", "block_rows", "out_dtype", "interpret",
    ),
)
def tiled_ell_rmv_t(
    tdata_t: jnp.ndarray,  # [ntiles * wt, R]  values, transposed layout
    tlocal_t: jnp.ndarray,  # [ntiles * wt, R]  int32 local col ids
    Ct: jnp.ndarray,  # [kp, R]  dense operand, transposed
    *,
    wt: int,
    ntiles: int,
    col_tile: int = DEFAULT_COL_TILE,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``out[c, k] = sum_nnz v(r, c) * C[r, k]`` -> [ntiles * ct, kp].

    ``A^T @ C`` computed from the SAME row-major tiled payload as
    :func:`tiled_ell_spmm_t` — the one-hot densified tile is contracted on
    its ROW axis instead of its column axis, so the transposed product needs
    no second (column-major) copy of the matrix. Grid iterates row-blocks
    innermost so each [ct, kp] output tile stays VMEM-resident while it
    accumulates across row blocks.
    """

    _check_mosaic_dtype(tdata_t.dtype, interpret)
    if out_dtype is None:
        out_dtype = (
            jnp.float32
            if jnp.dtype(tdata_t.dtype).itemsize == 2
            else Ct.dtype
        )
    R = tdata_t.shape[1]
    kp = Ct.shape[0]
    assert R % block_rows == 0, (R, block_rows)
    # operand kp on sublanes (mult of 8); the [ntiles*ct, kp] OUTPUT has kp
    # on lanes, where Mosaic masks partial vregs — still keep it a multiple
    # of 8 so the mask logic stays cheap
    assert kp % 8 == 0 and Ct.shape[1] == R

    grid = (ntiles, R // block_rows)
    out = pl.pallas_call(
        functools.partial(
            _rmv_kernel, wt=wt, ct=col_tile,
            upcast=interpret and jnp.dtype(tdata_t.dtype).itemsize == 2,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (wt, block_rows), lambda t, i: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wt, block_rows), lambda t, i: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (kp, block_rows), lambda t, i: (_ZERO, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (col_tile, kp), lambda t, i: (t, _ZERO), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles * col_tile, kp), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ntiles * col_tile * kp,
            bytes_accessed=tdata_t.size * 8 + R * kp * 4,
            transcendentals=0,
        ),
    )(tdata_t, tlocal_t, Ct)
    return out
