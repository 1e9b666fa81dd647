"""cross_knn + ingest label/value transfer."""

import numpy as np
import pytest

from single_algebra_tpu import neighbors
from single_algebra_tpu.ingest import ingest, transfer_values


def _ref_query(seed=0, n_ref=200, n_q=60, d=6):
    rng = np.random.default_rng(seed)
    mu = rng.normal(0, 8, (3, d))
    E_ref = np.concatenate(
        [rng.normal(mu[c], 1.0, (n_ref // 2 if c == 0 else n_ref // 4, d))
         for c in range(3)]
    ).astype(np.float32)
    lab_ref = np.concatenate([
        np.full(n_ref // 2, "alpha"),
        np.full(n_ref // 4, "beta"),
        np.full(n_ref // 4, "gamma"),
    ])
    q_types = rng.integers(0, 3, n_q)
    E_q = (mu[q_types] + rng.normal(0, 1.0, (n_q, d))).astype(np.float32)
    lab_q = np.array(["alpha", "beta", "gamma"])[q_types]
    return E_ref, lab_ref, E_q, lab_q


def test_cross_knn_matches_bruteforce():
    rng = np.random.default_rng(1)
    R = rng.normal(0, 1, (80, 5)).astype(np.float32)
    Q = rng.normal(0, 1, (33, 5)).astype(np.float32)
    d, idx = neighbors.cross_knn(Q, R, 7, block=16)
    d, idx = np.asarray(d), np.asarray(idx)
    full = np.linalg.norm(Q[:, None] - R[None], axis=2)
    ref_idx = np.argsort(full, axis=1)[:, :7]
    np.testing.assert_array_equal(np.sort(idx, 1), np.sort(ref_idx, 1))
    np.testing.assert_allclose(
        d, np.sort(full, axis=1)[:, :7], rtol=1e-4, atol=1e-4
    )
    assert (np.diff(d, axis=1) >= -1e-6).all()  # ascending


def test_cross_knn_validation():
    with pytest.raises(ValueError, match="equal feature"):
        neighbors.cross_knn(np.ones((3, 4)), np.ones((5, 6)), 2)
    with pytest.raises(ValueError, match="k="):
        neighbors.cross_knn(np.ones((3, 4)), np.ones((5, 4)), 9)


def test_ingest_labels():
    E_ref, lab_ref, E_q, lab_q = _ref_query()
    pred, conf = ingest(E_ref, E_q, lab_ref, k=10)
    assert (pred == lab_q).mean() == 1.0
    assert conf.min() > 0.5 and conf.max() <= 1.0 + 1e-12
    with pytest.raises(ValueError, match="labels length"):
        ingest(E_ref, E_q, lab_ref[:-1])


def test_ingest_exact_match_confidence():
    """A query identical to a reference point copies its label with
    full confidence."""

    E_ref, lab_ref, _, _ = _ref_query(seed=2)
    pred, conf = ingest(E_ref, E_ref[:5], lab_ref, k=10)
    assert (pred == lab_ref[:5]).all()
    np.testing.assert_allclose(conf, 1.0)


def test_transfer_values():
    E_ref, lab_ref, E_q, lab_q = _ref_query(seed=3)
    # transfer a value that is constant per type: must come back intact
    vmap_ = {"alpha": 1.0, "beta": 5.0, "gamma": 9.0}
    vals = np.array([vmap_[l] for l in lab_ref])
    got = transfer_values(E_ref, E_q, vals, k=10)
    want = np.array([vmap_[l] for l in lab_q])
    np.testing.assert_allclose(got, want, atol=0.5)
    # 2-d values keep their shape
    got2 = transfer_values(E_ref, E_q, np.stack([vals, -vals], 1), k=10)
    assert got2.shape == (len(lab_q), 2)
    with pytest.raises(ValueError, match="values rows"):
        transfer_values(E_ref, E_q, vals[:-1])
