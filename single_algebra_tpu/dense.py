"""Dense-array preprocessing (reference ``src/dense/mod.rs``).

The reference implements ``Normalize`` for ``ndarray::Array2`` with strict
length validation (``bail!`` on mismatch, ``src/dense/mod.rs:19-41``) and —
unlike the sparse impls — no zero-sum guard: dense normalize divides by the
given sums unconditionally. We preserve both behaviors, plus a ``log1p``
convenience for parity with the sparse surface.

Functions are pure (return new arrays) and jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.precise_math import log1p as _plog1p
from .types import Direction

__all__ = ["normalize", "log1p"]


def normalize(
    arr: jnp.ndarray, sums, target, direction: Direction
) -> jnp.ndarray:
    """Scale rows/columns of a dense matrix so each sums to ``target``.

    Matches reference dense semantics exactly: validates the sums length
    (src/dense/mod.rs:20-27,37-44) and scales by ``target / sums`` with no
    zero guard (a zero sum yields inf/nan, as in the reference).
    """

    arr = jnp.asarray(arr)
    sums = jnp.asarray(sums, dtype=arr.dtype)
    if arr.ndim != 2:
        raise ValueError(f"expected a 2-D array, got ndim={arr.ndim}")
    if direction == Direction.ROW:
        if sums.shape[0] != arr.shape[0]:
            raise ValueError(
                f"Length of sums ({sums.shape[0]}) does not match number of "
                f"rows ({arr.shape[0]})"
            )
        scale = jnp.asarray(target, arr.dtype) / sums
        return arr * scale[:, None]
    else:
        if sums.shape[0] != arr.shape[1]:
            raise ValueError(
                f"Length of sums ({sums.shape[0]}) does not match number of "
                f"columns ({arr.shape[1]})"
            )
        scale = jnp.asarray(target, arr.dtype) / sums
        return arr * scale[None, :]


@jax.jit
def log1p(arr: jnp.ndarray) -> jnp.ndarray:
    """Elementwise ln(1 + x)."""

    return _plog1p(arr)
