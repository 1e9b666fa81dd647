"""SparsePCA — PCA for sparse matrices over the jitted SVD engines.

Rebuild of the reference's L4 API (``SparsePCA``/``SparsePCABuilder``,
``src/dimred/pca/sparse/mod.rs:33-484``) with identical builder defaults
(n_components=50, alpha=1.0, tolerance=1e-6, seed=42, center=true,
verbose=false, method=Lanczos — reference ``sparse/mod.rs:392-402``).

Semantics preserved from the reference:

* **Lanczos never centers the matrix** even when ``center=true`` — only
  ``transform`` subtracts the mean (reference passes raw ``x`` to
  ``svd_las2``, ``sparse/mod.rs:134-144``; see SURVEY.md §3.2). The Lanczos
  path is therefore TruncatedSVD-with-post-hoc-centering, while the
  randomized path is true centered PCA (``center`` flag forwarded at
  ``sparse/mod.rs:176``).
* ``explained_variance_ratio`` normalizes by the sum of the COMPUTED
  components' variances (``sparse/mod.rs:312-322``), not the total variance
  — ratios sum to 1. (sklearn divides by total variance; we match the
  reference.)
* ``feature_importances`` = squared loadings, k x p (``sparse/mod.rs:295-302``).

Divergences (intended semantics, reference defects not copied):

* ``transform`` computes ``T = (X - 1 mu^T) V^T`` as one SpMM minus a rank-1
  term. The reference's transform iterates the *global* col_indices array
  per row (``sparse/mod.rs:268-282``) — O(n_rows * k * nnz_total) and wrong
  whenever a column has more than one nonzero.
* ``mean_`` has length n_features when ``center=false`` (the reference
  allocates ``zeros(n_samples)``, ``sparse/mod.rs:116``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..linalg import (
    CenteredOperator,
    DensifiedOperator,
    SparseOperator,
    lanczos_svd,
    randomized_svd,
    svd_flip,
)
from ..sparse.matrix import SparseMatrix
from ..types import MATMUL_PRECISION, PowerIterationNormalizer, SVDMethod

__all__ = ["SparsePCA", "SparsePCABuilder"]


def _as_matrix(x) -> SparseMatrix:
    if isinstance(x, SparseMatrix):
        return x
    return SparseMatrix.from_scipy(x)


class SparsePCA:
    """PCA on sparse matrices (samples x features).

    State after ``fit``: ``components_`` (k x p), ``explained_variance_``
    (k), ``mean_`` (p) — mirroring the reference struct fields
    (``sparse/mod.rs:37-47``).
    """

    def __init__(
        self,
        n_components: int = 50,
        alpha: float = 1.0,
        tolerance: float = 1e-6,
        random_seed: int = 42,
        center: bool = True,
        verbose: bool = False,
        svd_method: SVDMethod = SVDMethod.lanczos(),
        engine: str = "auto",
    ):
        self.n_components = n_components
        self.engine = engine
        self._fit_cache = None  # (id(matrix), operator)
        self.alpha = alpha  # parity field; unused, as in the reference
        self.tolerance = tolerance
        self.random_seed = random_seed
        self.center = center
        self.verbose = verbose
        self.svd_method = svd_method
        self.components_: Optional[jnp.ndarray] = None
        self.explained_variance_: Optional[jnp.ndarray] = None
        self.mean_: Optional[jnp.ndarray] = None
        self.total_variance_: Optional[float] = None
        self.noise_variance_: Optional[float] = None

    # -- fitting -------------------------------------------------------

    def fit(self, x) -> "SparsePCA":
        m = _as_matrix(x)
        n_samples, n_features = m.shape
        k = self.n_components
        t0 = time.perf_counter()

        op = self._make_operator(m)

        if isinstance(op, DensifiedOperator):
            col_sums, col_sq = op.col_stats()
        else:
            col_sums = m.sum_col()
            col_sq = None
        n_f = jnp.asarray(n_samples, col_sums.dtype)
        if self.center:
            self.mean_ = col_sums / n_f
        else:
            self.mean_ = jnp.zeros((n_features,), col_sums.dtype)

        total_var = None
        if self.center and n_samples > 1:
            if col_sq is None:
                col_sq = m.sum_col_squared()
            mean = col_sums / n_f
            total_var = float(
                jnp.sum((col_sq - mean * col_sums) / (n_f - 1))
            )

        if self.svd_method.is_random:
            if self.verbose:
                print("Computing randomized SVD...")
            svd_op = CenteredOperator(op, self.mean_) if self.center else op
            res = randomized_svd(
                svd_op,
                k,
                self.svd_method.n_oversamples,
                self.svd_method.n_power_iterations,
                self.svd_method.normalizer,
                seed=self.random_seed,
            )
        else:
            # Lanczos on the RAW matrix — reference semantic (SURVEY §3.2)
            res = lanczos_svd(op, k, seed=self.random_seed)

        u, vt = svd_flip(res.u, res.vt, u_based_decision=False)
        self.components_ = vt
        n_minus_1 = max(n_samples - 1, 1)
        self.explained_variance_ = (res.s**2) / n_minus_1

        if total_var is None:
            total_var = float(jnp.sum(self.explained_variance_))
        self.total_variance_ = total_var

        min_dim = min(n_samples, n_features)
        if k < min_dim:
            self.noise_variance_ = (
                total_var - float(jnp.sum(self.explained_variance_))
            ) / (min_dim - k)
        else:
            self.noise_variance_ = 0.0

        if self.verbose:
            name = "randomized" if self.svd_method.is_random else "Lanczos"
            print(f"SVD using {name} algorithm:")
            print(
                f"  Input shape: {n_samples} samples x {n_features} features"
            )
            print(f"  Reduced to: {k} components")
            print(
                f"  Compression ratio: {k / n_features * 100.0:.2f}%"
            )
            if self.svd_method.is_random:
                print(f"  Oversampling: {self.svd_method.n_oversamples}")
                print(
                    f"  Power iterations: "
                    f"{self.svd_method.n_power_iterations}"
                )
            print(f"  Estimated noise variance: {self.noise_variance_}")
            print(f"  Fit took {time.perf_counter() - t0:.3f}s")
        return self

    # -- inference -----------------------------------------------------

    def _make_operator(self, m):
        if self._fit_cache is not None and self._fit_cache[0] == id(m):
            return self._fit_cache[1]
        engine = self.engine
        if engine == "auto":
            import jax

            use_dense = (
                jax.default_backend() == "tpu"
                and DensifiedOperator.fits(m.shape)
                and m.dtype == jnp.float32
            )
            engine = "dense" if use_dense else "sparse"
        if engine == "dense":
            op = DensifiedOperator.from_matrix(m)
        elif engine == "sparse":
            op = SparseOperator.from_matrix(m)
        else:
            raise ValueError(f"unknown engine {engine!r}")
        self._fit_cache = (id(m), op)
        return op

    def transform(self, x) -> jnp.ndarray:
        self._check_fitted()
        m = _as_matrix(x)
        op = self._make_operator(m)
        if self.center:
            op = CenteredOperator(op, self.mean_)
        mv = getattr(op, "mv_precise", op.mv)
        return mv(self.components_.T.astype(self.components_.dtype))

    def fit_transform(self, x) -> jnp.ndarray:
        m = _as_matrix(x)  # convert once; fit and transform share layouts
        self.fit(m)
        return self.transform(m)

    # -- analysis ------------------------------------------------------

    def feature_importances(self) -> jnp.ndarray:
        self._check_fitted()
        return self.components_**2

    def explained_variance_ratio(self) -> jnp.ndarray:
        self._check_fitted()
        ev = self.explained_variance_
        return ev / jnp.sum(ev)

    def cumulative_explained_variance_ratio(self) -> jnp.ndarray:
        return jnp.cumsum(self.explained_variance_ratio())

    def _check_fitted(self):
        if self.components_ is None:
            raise RuntimeError("Must be fitted before transform!")

    # -- persistence (reference relies on serde upstream; SURVEY §5) ----

    def save(self, path: str) -> None:
        np.savez(
            path,
            components=np.asarray(self.components_),
            explained_variance=np.asarray(self.explained_variance_),
            mean=np.asarray(self.mean_),
            meta=np.array(
                [
                    self.n_components,
                    int(self.center),
                    self.random_seed,
                    self.total_variance_ or 0.0,
                    self.noise_variance_ or 0.0,
                ],
                dtype=np.float64,
            ),
        )

    @classmethod
    def load(cls, path: str) -> "SparsePCA":
        with np.load(path) as z:
            meta = z["meta"]
            obj = cls(
                n_components=int(meta[0]),
                center=bool(meta[1]),
                random_seed=int(meta[2]),
            )
            obj.components_ = jnp.asarray(z["components"])
            obj.explained_variance_ = jnp.asarray(z["explained_variance"])
            obj.mean_ = jnp.asarray(z["mean"])
            obj.total_variance_ = float(meta[3])
            obj.noise_variance_ = float(meta[4])
        return obj


@dataclasses.dataclass
class SparsePCABuilder:
    """Fluent builder with the reference's exact defaults
    (``sparse/mod.rs:392-402``)."""

    _n_components: int = 50
    _alpha: float = 1.0
    _tolerance: float = 1e-6
    _random_seed: int = 42
    _center: bool = True
    _verbose: bool = False
    _svd_method: SVDMethod = dataclasses.field(
        default_factory=SVDMethod.lanczos
    )
    _engine: str = "auto"

    def engine(self, e: str) -> "SparsePCABuilder":
        """Compute engine: 'auto' (densified bf16 fast path on TPU when the
        dense form fits HBM), 'sparse' (padded-ELL kernels), 'dense'."""

        self._engine = e
        return self

    def n_components(self, n: int) -> "SparsePCABuilder":
        self._n_components = n
        return self

    def alpha(self, a: float) -> "SparsePCABuilder":
        self._alpha = a
        return self

    def tolerance(self, t: float) -> "SparsePCABuilder":
        self._tolerance = t
        return self

    def random_seed(self, s: int) -> "SparsePCABuilder":
        self._random_seed = s
        return self

    def center(self, c: bool) -> "SparsePCABuilder":
        self._center = c
        return self

    def verbose(self, v: bool) -> "SparsePCABuilder":
        self._verbose = v
        return self

    def svd_method(self, m: SVDMethod) -> "SparsePCABuilder":
        self._svd_method = m
        return self

    def build(self) -> SparsePCA:
        return SparsePCA(
            n_components=self._n_components,
            alpha=self._alpha,
            tolerance=self._tolerance,
            random_seed=self._random_seed,
            center=self._center,
            verbose=self._verbose,
            svd_method=self._svd_method,
            engine=self._engine,
        )
