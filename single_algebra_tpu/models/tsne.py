"""t-SNE — exact (quadratic) implementation as one jitted XLA program.

The reference wraps the external ``bhtsne`` crate's Barnes-Hut tree code
behind ``TSNEConfig`` / ``run_f32`` / ``run_f64``
(``src/dimred/tsne/mod.rs:7-66``, marked WIP at ``tsne/mod.rs:1-2``).
Barnes-Hut trees are a CPU pointer structure with data-dependent control
flow — the opposite of what XLA wants. On TPU the idiomatic trade is the
EXACT O(n^2) formulation: the n x n distance/affinity matrices are plain
MXU/VPU work (an n=20k embedding is a 1.6 GB f32 intermediate — fine in
HBM), every epoch is two matmuls plus elementwise math, and the whole
optimization runs inside ``lax.fori_loop`` with zero host round-trips.
The ``theta`` field is accepted for config parity and ignored (exact mode
corresponds to theta=0).

Standard t-SNE recipe (van der Maaten & Hinton): per-point perplexity
calibration by bisection on sigma, symmetrized P, early exaggeration,
momentum gradient descent on the student-t Q.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..types import MATMUL_PRECISION

__all__ = ["TSNEConfig", "run", "run_f32", "run_f64"]


@dataclasses.dataclass(frozen=True)
class TSNEConfig:
    """Mirror of the reference config (``tsne/mod.rs:7-13``)."""

    output_dim: int = 2
    perplexity: float = 30.0
    epochs: int = 1000
    theta: float = 0.5  # parity field; exact mode ignores it

    # TPU-side knobs (defaults follow the standard reference implementation)
    learning_rate: float = 200.0
    early_exaggeration: float = 12.0
    exaggeration_epochs: int = 250
    initial_momentum: float = 0.5
    final_momentum: float = 0.8
    seed: int = 42


def _sq_dists(x):
    g = jnp.dot(x, x.T, precision=MATMUL_PRECISION)
    sq = jnp.diag(g)
    d = sq[:, None] + sq[None, :] - 2.0 * g
    return jnp.maximum(d, 0.0)


def _calibrate_p(d2, perplexity, iters=50):
    """Per-point bisection on beta = 1/(2 sigma^2) to hit log(perplexity)."""

    n = d2.shape[0]
    target = jnp.log(perplexity)
    eye = jnp.eye(n, dtype=bool)
    d2m = jnp.where(eye, jnp.inf, d2)

    def entropy_probs(beta):
        logits = -d2m * beta[:, None]
        logits = logits - jnp.max(
            jnp.where(eye, -jnp.inf, logits), axis=1, keepdims=True
        )
        w = jnp.where(eye, 0.0, jnp.exp(logits))
        sw = jnp.sum(w, axis=1, keepdims=True)
        p = w / jnp.maximum(sw, 1e-30)
        h = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=1)
        return h, p

    def body(_, carry):
        beta, lo, hi = carry
        h, _ = entropy_probs(beta)
        too_high = h > target  # entropy too high -> increase beta
        lo = jnp.where(too_high, beta, lo)
        hi = jnp.where(too_high, hi, beta)
        beta = jnp.where(
            jnp.isinf(hi), beta * 2.0, (lo + hi) / 2.0
        )
        return beta, lo, hi

    beta0 = jnp.ones((n,), d2.dtype)
    lo0 = jnp.zeros((n,), d2.dtype)
    hi0 = jnp.full((n,), jnp.inf, d2.dtype)
    beta, _, _ = jax.lax.fori_loop(0, iters, body, (beta0, lo0, hi0))
    _, p = entropy_probs(beta)
    return p


@partial(jax.jit, static_argnames=("config",))
def _tsne_jit(x, config: TSNEConfig):
    n = x.shape[0]
    dt = x.dtype

    d2 = _sq_dists(x)
    p_cond = _calibrate_p(d2, jnp.asarray(config.perplexity, dt))
    p = (p_cond + p_cond.T) / (2.0 * n)
    p = jnp.maximum(p, 1e-12)

    key = jax.random.PRNGKey(config.seed)
    y0 = 1e-4 * jax.random.normal(key, (n, config.output_dim), dt)

    eye = jnp.eye(n, dtype=bool)

    def grad(y, exaggeration):
        d2y = _sq_dists(y)
        num = 1.0 / (1.0 + d2y)  # student-t kernel
        num = jnp.where(eye, 0.0, num)
        q = num / jnp.maximum(jnp.sum(num), 1e-12)
        q = jnp.maximum(q, 1e-12)
        pq = (exaggeration * p - q) * num  # [n, n]
        # dY_i = 4 sum_j pq_ij (y_i - y_j)
        row = jnp.sum(pq, axis=1, keepdims=True) * y
        mix = jnp.dot(pq, y, precision=MATMUL_PRECISION)
        return 4.0 * (row - mix)

    def body(i, carry):
        y, vel, gains = carry
        exag = jnp.where(
            i < config.exaggeration_epochs,
            jnp.asarray(config.early_exaggeration, dt),
            jnp.asarray(1.0, dt),
        )
        momentum = jnp.where(
            i < config.exaggeration_epochs,
            jnp.asarray(config.initial_momentum, dt),
            jnp.asarray(config.final_momentum, dt),
        )
        g = grad(y, exag)
        same_sign = (g > 0) == (vel > 0)
        gains = jnp.clip(
            jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, None
        )
        vel = momentum * vel - config.learning_rate * gains * g
        y = y + vel
        y = y - jnp.mean(y, axis=0, keepdims=True)
        return y, vel, gains

    y, _, _ = jax.lax.fori_loop(
        0,
        config.epochs,
        body,
        (y0, jnp.zeros_like(y0), jnp.ones_like(y0)),
    )
    return y


def run(x, config: TSNEConfig | None = None) -> jnp.ndarray:
    """Embed rows of ``x`` [n, d] into ``config.output_dim`` dimensions."""

    if config is None:
        config = TSNEConfig()
    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError(f"expected [n, d] input, got shape {x.shape}")
    if x.shape[0] <= config.perplexity * 3:
        raise ValueError(
            f"perplexity {config.perplexity} too large for n={x.shape[0]}"
        )
    return _tsne_jit(x, config)


def run_f32(x, config: TSNEConfig | None = None) -> jnp.ndarray:
    """Reference-parity alias (``tsne/mod.rs:15``)."""

    return run(jnp.asarray(x, jnp.float32), config)


def run_f64(x, config: TSNEConfig | None = None) -> jnp.ndarray:
    """Reference-parity alias (``tsne/mod.rs:41``); needs x64 mode."""

    return run(jnp.asarray(x, jnp.float64), config)
