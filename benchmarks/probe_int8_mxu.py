"""Does XLA:TPU on v5e hit the 2x int8 MXU path for dot_general?

Times the Gram-shaped contraction D @ D^T (D = [2048*15, 8192], i.e.
one padded-p slab at the wide/north-star shape) in bf16->f32 vs
int8->int32 vs int8->int32->f32-accum, plus the per-pair blocked variant
the symmetric-half Gram actually uses. Decides whether an int8-exact
Gram engine path is worth building.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PP, SLAB, RB = 2048 * 15, 8192, 2048
REPS = 8


def timed(f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    Dh = rng.poisson(1.5, (PP, SLAB)).astype(np.float32)
    Dh = np.minimum(Dh, 127)

    D_bf16 = jnp.asarray(Dh, jnp.bfloat16)
    D_i8 = jnp.asarray(Dh.astype(np.int8))

    @jax.jit
    def gram_bf16(D):
        return jax.lax.dot_general(
            D, D, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def gram_i8(D):
        return jax.lax.dot_general(
            D, D, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    nb = PP // RB
    pairs = [(r, c) for r in range(nb) for c in range(r + 1)]

    def blocked(D, acc_f32):
        blocks = [
            jax.lax.dynamic_slice(D, (r * RB, 0), (RB, SLAB))
            for r in range(nb)
        ]
        out = []
        for r, c in pairs:
            prod = jax.lax.dot_general(
                blocks[r], blocks[c],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=(
                    jnp.float32 if D.dtype == jnp.bfloat16 else jnp.int32
                ),
            )
            out.append(prod.astype(jnp.float32) if acc_f32 else prod)
        return out

    blocked_bf16 = jax.jit(lambda D: blocked(D, True))
    blocked_i8_raw = jax.jit(lambda D: blocked(D, False))
    blocked_i8_f32 = jax.jit(lambda D: blocked(D, True))

    flops = 2 * PP * PP * SLAB
    half = 2 * SLAB * RB * RB * len(pairs)

    t = timed(gram_bf16, D_bf16)
    print(f"full  bf16->f32 : {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} Tflop/s",
          flush=True)
    t = timed(gram_i8, D_i8)
    print(f"full  int8->i32 : {t*1e3:7.1f} ms  {flops/t/1e12:6.1f} Top/s",
          flush=True)
    t = timed(blocked_bf16, D_bf16)
    print(f"half  bf16->f32 : {t*1e3:7.1f} ms  {half/t/1e12:6.1f} Tflop/s",
          flush=True)
    t = timed(blocked_i8_raw, D_i8)
    print(f"half  int8->i32 : {t*1e3:7.1f} ms  {half/t/1e12:6.1f} Top/s",
          flush=True)
    t = timed(blocked_i8_f32, D_i8)
    print(f"half  i8->i32->f32: {t*1e3:5.1f} ms  {half/t/1e12:6.1f} Top/s",
          flush=True)

    # exactness sanity: int32 == f64 reference on one block pair
    ref = Dh[:RB].astype(np.float64) @ Dh[RB:2*RB].astype(np.float64).T
    got = np.asarray(
        jax.lax.dot_general(
            D_i8[:RB], D_i8[RB:2*RB],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ),
        np.float64,
    )
    print("int8 block exact:", bool(np.array_equal(ref, got)), flush=True)


if __name__ == "__main__":
    main()
