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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tiled_ell_spmm_t", "DEFAULT_COL_TILE", "DEFAULT_BLOCK_ROWS"]

# measured on v5e at 60M nnz: (256, 1024) beats (256, 512) by ~8% and
# (512, *) by ~18% with no memory penalty; (128, 1024) is ~13% faster still
# but costs +32% HBM for the layout
DEFAULT_COL_TILE = 256
DEFAULT_BLOCK_ROWS = 1024


def _spmm_kernel(td_ref, tl_ref, bt_ref, o_ref, *, wt: int, ct: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    vals = td_ref[...]  # [wt, BR]
    lids = tl_ref[...]  # [wt, BR] int32 in [0, ct)
    br = vals.shape[1]

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (ct, br), 0)
    dense = jnp.zeros((ct, br), vals.dtype)
    for w in range(wt):
        lid_w = lids[w, :][None, :]  # [1, BR]
        v_w = vals[w, :][None, :]
        dense = dense + jnp.where(col_iota == lid_w, v_w, 0)

    o_ref[...] += jnp.dot(
        bt_ref[...],
        dense,
        preferred_element_type=o_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit,
    static_argnames=("wt", "ntiles", "col_tile", "block_rows", "interpret"),
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
    interpret: bool = False,
) -> jnp.ndarray:
    """``out[k, r] = sum_nnz v * B[col, k]`` -> [kp, R] (transposed).

    ``Bt`` must be pre-padded to [kp (mult of 128), ntiles * col_tile].
    R must be a multiple of ``block_rows`` (a multiple of 128).
    """

    R = tdata_t.shape[1]
    kp = Bt.shape[0]
    assert R % block_rows == 0, (R, block_rows)
    assert kp % 128 == 0 and Bt.shape[1] == ntiles * col_tile

    grid = (R // block_rows, ntiles)
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, wt=wt, ct=col_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (wt, block_rows), lambda i, t: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wt, block_rows), lambda i, t: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (kp, col_tile), lambda i, t: (0, t), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (kp, block_rows), lambda i, t: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp, R), tdata_t.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ntiles * col_tile * kp,
            bytes_accessed=tdata_t.size * 8 + R * kp * 4,
            transcendentals=0,
        ),
    )(tdata_t, tlocal_t, Bt)
    return out


def _densify_kernel(td_ref, tl_ref, hi_ref, lo_ref, acc_ref, *, wt: int, ct: int):
    br = td_ref.shape[1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (ct, br), 0)
    acc_ref[...] = jnp.zeros((ct, br), td_ref.dtype)

    # rolled loop: wt can be large (wide tiles), an unrolled graph would
    # blow up Mosaic; dynamic sublane indexing of the [wt, BR] block is cheap
    def body(w, _):
        lid_w = tl_ref[w, :][None, :]
        v_w = td_ref[w, :][None, :]
        acc_ref[...] += jnp.where(col_iota == lid_w, v_w, 0)
        return 0

    jax.lax.fori_loop(0, wt, body, 0)

    dense = acc_ref[...]
    hi = dense.astype(jnp.bfloat16)
    hi_ref[...] = hi
    lo_ref[...] = (dense - hi.astype(dense.dtype)).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("wt", "ntiles", "col_tile", "block_rows", "interpret"),
)
def tiled_ell_densify(
    tdata_t: jnp.ndarray,  # [ntiles * wt, R]
    tlocal_t: jnp.ndarray,  # [ntiles * wt, R] int32
    *,
    wt: int,
    ntiles: int,
    col_tile: int = 2048,
    block_rows: int = 512,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Densify the tiled-ELL layout into (hi, lo) bf16 [ntiles * col_tile, R]
    — the TRANSPOSED dense matrix (columns on the leading axis), which is
    the orientation the one-hot tiles are built in; consumers flip the
    contraction dims instead of materializing a transpose.

    The device-side construction path of ``DensifiedOperator``: shipping the
    ~2x-nnz tiled layout through the (slow) host tunnel and expanding it
    with the one-hot kernel beats transferring the full dense array by the
    density factor. ``lo`` carries the bf16 rounding residual (all zeros for
    bf16-exact data; the caller drops it after a cheap device-side check).
    """

    R = tdata_t.shape[1]
    assert R % block_rows == 0, (R, block_rows)

    grid = (R // block_rows, ntiles)
    hi, lo = pl.pallas_call(
        functools.partial(_densify_kernel, wt=wt, ct=col_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (wt, block_rows), lambda i, t: (t, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (wt, block_rows), lambda i, t: (t, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (col_tile, block_rows),
                lambda i, t: (t, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (col_tile, block_rows),
                lambda i, t: (t, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles * col_tile, R), jnp.bfloat16),
            jax.ShapeDtypeStruct((ntiles * col_tile, R), jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((col_tile, block_rows), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=R * ntiles * col_tile,
            bytes_accessed=tdata_t.size * 8 + 2 * R * ntiles * col_tile * 2,
            transcendentals=0,
        ),
    )(tdata_t, tlocal_t)
    return hi, lo
