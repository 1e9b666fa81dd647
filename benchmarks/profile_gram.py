"""Per-component timing of the Gram full pass (VERDICT r3 #2).

Decomposes ``gram_matrix`` wall time at a flagship shape into:

* densify-only (one-hot expansion of every slab + a scalar reduction —
  the VPU half),
* the full symmetric-blocked contraction (``sym=True``), and
* optionally the naive full dot (``--full``; costs a fresh compile).

Every timed graph ends in a scalar pull (tunnel-safe sync). Usage:
``python benchmarks/profile_gram.py [--shape wide|northstar] [--full]``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

HERE = os.path.dirname(os.path.abspath(__file__))


def t(label, fn, n=3):
    fn()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    print(f"{label:44s} min={min(runs):8.3f}s runs={[round(r, 3) for r in runs]}",
          flush=True)
    return min(runs)


def main():
    import jax
    import jax.numpy as jnp

    from accuracy_at_scale import SHAPES, matrix_cached
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.linalg.gram import (
        GramPCAEngine, _slab_for, gram_matrix,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="wide")
    ap.add_argument("--full", action="store_true",
                    help="also time the naive (sym=False) contraction")
    args = ap.parse_args()

    cfg = SHAPES[args.shape]
    X = matrix_cached(args.shape, cfg)
    m = SparseMatrix.from_scipy(X, device=False)
    t0 = time.perf_counter()
    eng = GramPCAEngine.from_matrix(m)
    print(f"engine built in {time.perf_counter() - t0:.1f}s "
          f"ct={eng.meta[2]} buckets={eng.bwidths}", flush=True)

    slab = _slab_for(eng.shape[0])

    @jax.jit
    def densify_only(eng):
        acc = jnp.zeros((), jnp.float32)
        for b, (_, rc) in enumerate(eng.bwidths):
            def body(i, a, b=b):
                D = eng._densify(b, i, jnp.bfloat16)
                return a + jnp.sum(D.astype(jnp.float32)[:8, :8])

            acc = jax.lax.fori_loop(0, rc // slab, body, acc)
        return acc

    t("densify-only (all slabs)", lambda: float(densify_only(eng)))
    t("gram_matrix sym=True",
      lambda: float(jnp.sum(gram_matrix(eng)[:8, :8])))
    if args.full:
        t("gram_matrix sym=False",
          lambda: float(jnp.sum(gram_matrix(eng, sym=False)[:8, :8])))


if __name__ == "__main__":
    main()
