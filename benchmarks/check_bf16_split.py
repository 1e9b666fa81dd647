"""On-chip regression probe: the bf16 hi/lo split must not fold to zero.

XLA:TPU's simplifier treats the f32 -> bf16 -> f32 round trip as identity
unless the hi cast is hidden behind an optimization_barrier, which zeroes
the compensation term of every device-side split (lo == 0) and silently
collapses the 'precise' bf16 products to single-bf16 accuracy. The CPU
backend does not exhibit the fold, so the pytest suite cannot catch a
regression — run THIS on the real chip:

    python benchmarks/check_bf16_split.py

Exits non-zero if the split is folded or a precise product misses 1e-5.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from single_algebra_tpu import SparseMatrix
    from single_algebra_tpu.linalg.operators import DensifiedOperator
    from single_algebra_tpu.models.pca import make_engine_operator

    assert jax.default_backend() == "tpu", "run this on the real chip"

    # 1. the split itself: lo must be nonzero for non-bf16-exact input
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.standard_normal((512, 8)).astype(np.float32))
    hi, lo = jax.jit(DensifiedOperator._split)(M)
    lo_mag = float(np.abs(np.asarray(lo, np.float32)).max())
    print(f"device split lo magnitude: {lo_mag:.2e}")
    assert lo_mag > 1e-4, "bf16 split folded to zero on device!"

    # 2. end-to-end precise products at f32-class accuracy
    X = sp.random(
        3000, 400, density=0.1, format="csr", dtype=np.float64,
        random_state=rng,
        data_rvs=lambda s: (rng.poisson(2.0, s) + 1).astype(np.float64),
    ).astype(np.float32)
    m = SparseMatrix.from_scipy(X)
    B = jnp.asarray(rng.standard_normal((400, 8)).astype(np.float32))
    ref = X @ np.asarray(B)
    for name, op in [
        ("gram", make_engine_operator(m, "gram")),
        ("dense", make_engine_operator(m, "dense")),
    ]:
        mv = getattr(op, "mv_precise", op.mv)
        rel = float(
            np.abs(np.asarray(mv(B)) - ref).max() / np.abs(ref).max()
        )
        print(f"{name} precise mv rel err: {rel:.2e}")
        assert rel < 1e-5, (name, rel)
    print("BF16 SPLIT OK")


if __name__ == "__main__":
    main()
