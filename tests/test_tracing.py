"""Stage tracing utilities."""

import numpy as np

from single_algebra_tpu.utils.tracing import (
    reset_stage_timings,
    stage,
    stage_timings,
)


def test_stage_accumulates():
    reset_stage_timings()
    with stage("a"):
        x = np.ones(10).sum()
    with stage("a"):
        x += 1
    with stage("b"):
        pass
    t = stage_timings()
    assert set(t) == {"a", "b"}
    assert t["a"] >= 0 and t["b"] >= 0
    reset_stage_timings()
    assert stage_timings() == {}
