"""Seconds-scale int8-vs-bf16 measurement of the REAL Gram pass shape.

probe_int8_mxu.py's numbers came back dispatch-floored (0.0-0.3 ms for
what is >10 s of MXU work at these shapes — an async artifact of the
tunneled backend), and the first version of THIS probe fell to two more
traps: (a) its fori_loop body ignored the loop index, so XLA hoisted the
(loop-invariant) dot out of the loop and timed 1/NSLAB of the work; (b)
``block_until_ready`` on the tunneled backend returns before the device
is actually done, so even the hoisted work wasn't waited on. This
version slices a big operand by the loop index (exactly how
``gram_matrix`` walks its payload slabs) and syncs by pulling the scalar
result to the host.

Decision input for VERDICT r4 #2 (full-pass >= 2x at the north-star
shape): v5e int8 MXU peak is 2x bf16; if the measured end-to-end ratio
here is >= ~1.6x, the int8-exact Gram path (integer counts <= 127) in
``gram_matrix`` is the right default for int-valued matrices.
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

PP, SLAB, RB = 2048 * 4, 8192, 2048
NSLAB = 24  # bf16 expectation ~4 s of MXU work
NB = PP // RB
# NOTE: PP is deliberately 4 blocks (10 pair dots), NOT the flagship 15
# (120 pair dots): the remote-compile tunnel takes tens of minutes on the
# 120-dot loop body, and a killed client leaves the server compiling —
# which wedges the chip for every later process. The per-dot shapes
# ([2048, 8192] x [2048, 8192]^T) are identical to the flagship graph, so
# the int8:bf16 throughput RATIO transfers.
PAIRS = [(r, c) for r in range(NB) for c in range(r + 1)]


def build(dtype):
    rng = np.random.default_rng(0)
    Dh = np.minimum(rng.poisson(1.5, (PP, SLAB * NSLAB)), 127)
    return jnp.asarray(Dh.astype(dtype))


def make_loop(acc_i32_per_slab: bool):
    """fori_loop over NSLAB slabs; per-pair carries like gram_matrix."""

    def run(D):
        def body(i, S):
            Ds = jax.lax.dynamic_slice(D, (0, i * SLAB), (PP, SLAB))
            blocks = [
                jax.lax.dynamic_slice(Ds, (r * RB, 0), (RB, SLAB))
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
        # one scalar: the host pull below is the only reliable sync on
        # the tunneled backend
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
        float(np.asarray(fn(D)))  # compile + first run, host-pull sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fn(D)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(
            f"{tag:16s}: {t:7.2f} s  {flops/t/1e12:6.1f} "
            f"T{'op' if i32 else 'flop'}/s  runs={['%.2f' % x for x in ts]}",
            flush=True,
        )
        del D, fn


if __name__ == "__main__":
    main()
