"""Harmony batch integration: mixing improves, structure survives."""

import numpy as np
import pytest

from single_algebra_tpu.models.harmony import harmony, HarmonyResult


def _batched_embedding(n_per=120, d=8, shift=4.0, seed=0):
    """Two batches x three cell types; batch adds a constant offset."""

    rng = np.random.default_rng(seed)
    types = rng.normal(0, 6, (3, d))
    offset = rng.normal(0, 1, d)
    offset = offset / np.linalg.norm(offset) * shift
    Z, t_lab, b_lab = [], [], []
    for b in range(2):
        for t in range(3):
            Z.append(
                types[t] + (offset * b) + rng.normal(0, 0.8, (n_per, d))
            )
            t_lab += [t] * n_per
            b_lab += [f"batch{b}"] * n_per
    return (
        np.concatenate(Z).astype(np.float32),
        np.asarray(t_lab),
        np.asarray(b_lab),
    )


def _batch_separation(Z, t_lab, b_lab):
    """Mean distance between the two batches' centroids per cell type,
    normalized by the global scale."""

    gaps = []
    for t in np.unique(t_lab):
        a = Z[(t_lab == t) & (b_lab == "batch0")].mean(0)
        b = Z[(t_lab == t) & (b_lab == "batch1")].mean(0)
        gaps.append(np.linalg.norm(a - b))
    return float(np.mean(gaps) / (Z.std() + 1e-12))


def test_harmony_removes_batch_keeps_types():
    Z, t_lab, b_lab = _batched_embedding()
    res = harmony(Z, b_lab, n_clusters=6, seed=0)
    assert isinstance(res, HarmonyResult)
    assert res.embedding.shape == Z.shape
    before = _batch_separation(Z, t_lab, b_lab)
    after = _batch_separation(res.embedding, t_lab, b_lab)
    assert after < 0.3 * before, (before, after)

    # cell-type structure survives: KMeans on the corrected embedding
    # still recovers the three types
    from single_algebra_tpu.metrics import adjusted_rand_index
    from single_algebra_tpu.models import KMeans

    km = KMeans(n_clusters=3, n_init=3, random_seed=0).fit(
        res.embedding.astype(np.float32)
    )
    ari = adjusted_rand_index(t_lab, np.asarray(km.labels_))
    assert ari > 0.95, ari


def test_harmony_objective_decreases_across_rounds():
    Z, _, b_lab = _batched_embedding(seed=1)
    res = harmony(Z, b_lab, n_clusters=6, max_rounds=5, seed=0)
    assert len(res.objective) >= 2
    # integration monotonically improves the harmony objective
    assert res.objective[-1] <= res.objective[0]


def test_harmony_single_batch_identity():
    Z, _, _ = _batched_embedding(seed=2)
    res = harmony(Z, ["only"] * Z.shape[0])
    np.testing.assert_array_equal(res.embedding, Z)
    assert res.converged and res.n_rounds == 0


def test_harmony_no_batch_effect_small_change():
    """Without a real batch effect the correction stays small."""

    rng = np.random.default_rng(3)
    Z = rng.normal(0, 3, (300, 6)).astype(np.float32)
    b_lab = rng.choice(["a", "b"], 300)
    res = harmony(Z, b_lab, n_clusters=5, max_rounds=3, seed=0)
    rel = np.linalg.norm(res.embedding - Z) / np.linalg.norm(Z)
    assert rel < 0.25, rel


def test_harmony_validation_and_determinism():
    Z, _, b_lab = _batched_embedding(seed=4)
    with pytest.raises(ValueError, match="batch length"):
        harmony(Z, b_lab[:-1])
    with pytest.raises(ValueError, match="must be"):
        harmony(np.zeros(5), ["a"] * 5)
    r1 = harmony(Z, b_lab, n_clusters=4, max_rounds=2, seed=7)
    r2 = harmony(Z, b_lab, n_clusters=4, max_rounds=2, seed=7)
    np.testing.assert_allclose(r1.embedding, r2.embedding, atol=1e-5)
