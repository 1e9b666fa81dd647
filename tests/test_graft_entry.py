"""Driver-contract tests: entry() compiles and runs; dryrun_multichip
executes the full sharded fit on the virtual mesh."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    out_np = np.asarray(out)
    assert out_np.ndim == 2 and np.isfinite(out_np).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
