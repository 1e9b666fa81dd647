"""MNN correction: planted shift removed, structure preserved."""

import numpy as np
import pytest

from single_algebra_tpu.models.mnn import mnn_correct, MNNResult


def _shifted_batches(n_per=150, d=8, shift=5.0, n_batches=2, seed=0):
    rng = np.random.default_rng(seed)
    types = rng.normal(0, 7, (3, d))
    Z, t_lab, b_lab = [], [], []
    for b in range(n_batches):
        off = rng.normal(0, 1, d)
        off = off / np.linalg.norm(off) * shift * b
        for t in range(3):
            Z.append(types[t] + off + rng.normal(0, 0.7, (n_per, d)))
            t_lab += [t] * n_per
            b_lab += [f"b{b}"] * n_per
    return (
        np.concatenate(Z).astype(np.float32),
        np.asarray(t_lab),
        np.asarray(b_lab),
    )


def _gap(Z, t_lab, b_lab, b0, b1):
    gaps = []
    for t in np.unique(t_lab):
        a = Z[(t_lab == t) & (b_lab == b0)].mean(0)
        b = Z[(t_lab == t) & (b_lab == b1)].mean(0)
        gaps.append(np.linalg.norm(a - b))
    return float(np.mean(gaps))


def test_mnn_removes_shift_keeps_types():
    Z, t_lab, b_lab = _shifted_batches()
    res = mnn_correct(Z, b_lab, k=15, iterations=3)
    assert isinstance(res, MNNResult)
    assert res.corrected.shape == Z.shape
    assert res.n_pairs[0] > 50
    before = _gap(Z, t_lab, b_lab, "b0", "b1")
    after = _gap(res.corrected, t_lab, b_lab, "b0", "b1")
    assert after < 0.25 * before, (before, after)
    # the reference batch is untouched
    np.testing.assert_array_equal(
        res.corrected[b_lab == "b0"], Z[b_lab == "b0"]
    )
    # type structure survives downstream clustering
    from single_algebra_tpu.metrics import adjusted_rand_index
    from single_algebra_tpu.models import KMeans

    km = KMeans(n_clusters=3, n_init=3, random_seed=0).fit(
        res.corrected.astype(np.float32)
    )
    assert adjusted_rand_index(t_lab, np.asarray(km.labels_)) > 0.95


def test_mnn_three_batches_sequential():
    Z, t_lab, b_lab = _shifted_batches(n_batches=3, seed=1)
    res = mnn_correct(Z, b_lab, k=15, iterations=3)
    assert len(res.n_pairs) == 2
    for pair in (("b0", "b1"), ("b0", "b2"), ("b1", "b2")):
        assert _gap(res.corrected, t_lab, b_lab, *pair) < 0.3 * _gap(
            Z, t_lab, b_lab, "b0", "b2"
        )


def test_mnn_single_batch_and_validation():
    Z, _, _ = _shifted_batches(seed=2)
    res = mnn_correct(Z, ["one"] * Z.shape[0])
    np.testing.assert_array_equal(res.corrected, Z)
    with pytest.raises(ValueError, match="batch length"):
        mnn_correct(Z, ["a"] * 3)
    with pytest.raises(ValueError, match="X must be"):
        mnn_correct(np.zeros(5), ["a"] * 5)
    with pytest.raises(ValueError, match="iterations"):
        mnn_correct(Z, ["a"] * Z.shape[0], iterations=0)
