"""Seconds-scale int8-vs-bf16 measurement of the REAL Gram pass shape.

probe_int8_mxu.py's numbers came back dispatch-floored (0.0-0.3 ms for
what is >10 s of MXU work at these shapes — an async artifact of the
tunneled backend), so they cannot decide the int8 question. This probe
times the actual symmetric-half pair-blocked contraction ACCUMULATED
OVER SLABS inside one jitted fori_loop — the exact compute structure of
``gram_matrix`` — sized so the true wall time is seconds and a
block_until_ready can't lie.

Decision input for VERDICT r4 #2 (full-pass >= 2x at the north-star
shape): v5e int8 MXU peak is 2x bf16; if the measured end-to-end ratio
here is >= ~1.6x, an int8-exact Gram path (counts <= 127) is worth
building into gram_matrix.
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
NSLAB = 12  # ~ 100k rows worth of slabs; bf16 expectation ~12 s
NB = PP // RB
PAIRS = [(r, c) for r in range(NB) for c in range(r + 1)]


def build(dtype):
    rng = np.random.default_rng(0)
    Dh = np.minimum(rng.poisson(1.5, (PP, SLAB)), 127)
    return jnp.asarray(Dh.astype(dtype))


def make_loop(acc_i32_per_slab: bool):
    """fori_loop over NSLAB slabs; per-pair carries like gram_matrix."""

    def run(D):
        def body(_, S):
            blocks = [
                jax.lax.dynamic_slice(D, (r * RB, 0), (RB, SLAB))
                for r in range(NB)
            ]
            out = []
            for idx, (r, c) in enumerate(PAIRS):
                prod = jax.lax.dot_general(
                    blocks[r], blocks[c],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if acc_i32_per_slab else jnp.float32
                    ),
                )
                out.append(S[idx] + prod.astype(jnp.float32))
            return tuple(out)

        S0 = tuple(
            jnp.zeros((RB, RB), jnp.float32) for _ in range(len(PAIRS))
        )
        S = jax.lax.fori_loop(0, NSLAB, body, S0)
        # reduce to one scalar so block_until_ready waits on everything
        return sum(jnp.sum(s) for s in S)

    return jax.jit(run)


def main():
    print("backend:", jax.default_backend(), flush=True)
    flops = 2 * SLAB * RB * RB * len(PAIRS) * NSLAB

    for tag, dtype, i32 in (
        ("bf16->f32", np.float32, False),  # cast below
        ("int8->i32->f32", np.int8, True),
    ):
        D = build(dtype)
        if dtype == np.float32:
            D = D.astype(jnp.bfloat16)
        fn = make_loop(i32)
        out = fn(D)
        jax.block_until_ready(out)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(D))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(
            f"{tag:16s}: {t:7.2f} s  {flops/t/1e12:6.1f} "
            f"T{'op' if i32 else 'flop'}/s  runs={['%.2f' % x for x in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
