"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-device sharding is validated without TPU hardware by forcing the host
CPU platform to expose 8 devices — the TPU answer to "test multi-node
without a cluster" (the reference has no distributed testing at all;
SURVEY.md §4 prescribes this setup). x64 is enabled so f64 golden tests can
hit the reference's 1e-10 tolerances.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NOTE: the axon TPU-tunnel plugin ignores the JAX_PLATFORMS env var; the
# programmatic config is the only override that sticks in this environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest
import scipy.sparse as sp


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_random_csr(n, p, density=0.1, seed=42, dtype=np.float64, fmt="csr"):
    rng = np.random.default_rng(seed)
    mat = sp.random(
        n, p, density=density, format=fmt, dtype=np.float64,
        random_state=rng, data_rvs=rng.random,
    )
    return mat.astype(dtype)


@pytest.fixture
def small_csr():
    return make_random_csr(50, 37, density=0.15, seed=1)
