"""Diagnose the config2 normalize+log1p warm-time jump (0.046 -> 0.505 s).

Times the graded-config #2 pipe end-to-end and per stage (normalize,
log1p, sum_row sync) on the same 100k x 10k d=0.03 matrix, and reports
whether a transpose layout is resident (map_stored then runs twice).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

from single_algebra_tpu import SparseMatrix  # noqa: E402
from single_algebra_tpu.types import Direction  # noqa: E402


def timed(f, reps=3):
    f()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(42)
    X = sp.random(
        100_000, 10_000, density=0.03, format="csr", dtype=np.float64,
        random_state=rng,
        data_rvs=lambda s: (rng.poisson(1.5, s) + 1).astype(np.float64),
    ).astype(np.float32)
    m = SparseMatrix.from_scipy(X)
    sums = np.asarray(m.sum_row())
    print("transpose cached on m:", m._transpose is not None
          if hasattr(m, "_transpose") else "n/a", flush=True)
    print("ell payload shape:", m.ell_data.shape, flush=True)

    def pipe():
        out = m.normalize(sums, 1e4, Direction.ROW).log1p_normalize()
        np.asarray(out.sum_row()[:1])
        return out

    t_pipe = timed(pipe)
    print(f"pipe end-to-end warm: {t_pipe*1e3:.1f} ms", flush=True)

    # stage 1: normalize alone (block on the payload)
    def s1():
        out = m.normalize(sums, 1e4, Direction.ROW)
        out.ell_data.block_until_ready()
        return out

    t1 = timed(s1)
    nrm = s1()
    print(f"normalize alone:      {t1*1e3:.1f} ms", flush=True)
    print("transpose cached on nrm:", getattr(nrm, "_transpose", None)
          is not None, flush=True)

    # stage 2: log1p on the normalized matrix
    def s2():
        out = nrm.log1p_normalize()
        out.ell_data.block_until_ready()
        return out

    t2 = timed(s2)
    lg = s2()
    print(f"log1p alone:          {t2*1e3:.1f} ms", flush=True)

    # stage 3: sum_row on the result
    def s3():
        np.asarray(lg.sum_row()[:1])

    t3 = timed(s3)
    print(f"sum_row alone:        {t3*1e3:.1f} ms", flush=True)

    # scale synthesis alone (the eager jnp.where in normalize)
    def s0():
        sc = np.asarray(
            jax.jit(lambda s: jax.numpy.where(s > 0, 1e4 / s, 0))(
                jax.numpy.asarray(sums)
            )
        )
        return sc

    t0 = timed(s0)
    print(f"scale synth (jit):    {t0*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
