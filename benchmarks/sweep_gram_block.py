"""Sym-Gram row-block sweep at the wide flagship shape (400k x 30720).

The full-pass ratio sits at 0.94x vs the projected 64-core baseline
(results_large_tpu.json); the Gram contraction is ~2.5 s of the 2.9 s
full pass. This sweeps the pair-carry block size rb around the current
2048 to see whether the last ~0.2 s is on the table.

OUTCOME (round 4, v5e): rb=1024 and rb=1536 both RESOURCE_EXHAUST —
finer blocks keep the same ~0.53 pp^2 f32 carry total but the larger
pair count no longer buffer-assigns alongside the [ppb, ppb] assembly
on 16 GB HBM. rb=2048 (2.55 s) is ~80% of the chip's bf16 MXU peak for
the 0.53 * 2 * n * ppb^2 flops — the pass is flops-bound, there is no
~0.2 s on the table at this density. 2048 stands (`_gram_block` docs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import scipy.sparse as sp

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax


def log(m):
    print(f"[sweep] {m}", file=sys.stderr, flush=True)


def main():
    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.linalg.gram import GramPCAEngine, gram_matrix

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "_truth_cache",
        "wide_400000x30000_s7_c64.npz",
    )
    X = sp.load_npz(path)
    log(f"matrix loaded; nnz={X.nnz}")
    m = SparseMatrix.from_scipy(X, device=False)
    t0 = time.time()
    eng = GramPCAEngine.from_matrix(m)
    log(f"gram payload built+shipped {time.time() - t0:.0f}s")

    ref = None
    # rb=1024 tried and OOMs: its 465 pair carries + the [ppb, ppb]
    # assembly target cannot coexist at pp=30720 on 16 GB HBM
    for rb in (1536, 2048, 3072, 4096):
        G = gram_matrix(eng, rb=rb)
        jax.block_until_ready(G)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            G = gram_matrix(eng, rb=rb)
            jax.block_until_ready(G)
            ts.append(time.perf_counter() - t0)
        probe = np.asarray(G[:64, :64], np.float64)
        if ref is None:
            ref = probe
        err = float(np.abs(probe - ref).max() / max(np.abs(ref).max(), 1))
        log(f"rb={rb}: {min(ts):.3f}s  (block equality vs first: {err:.1e})")
        del G


if __name__ == "__main__":
    main()
