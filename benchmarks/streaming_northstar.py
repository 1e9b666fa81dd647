"""Out-of-core north-star: 1M x 30k through StreamingSparsePCA.

Two purposes (VERDICT r3 #3 / #7):

* **accuracy attribution** — the streaming driver folds the device f32
  Gram into a host f64 accumulator every ``fold_every`` slabs, bounding
  accumulation drift to one fold group. If its EV error lands at the
  ~1e-6 randomized-solve plateau while the one-shot GramPCAEngine row
  reads 4.9e-6, the gap is G-accumulation drift and the residual is the
  f32 solve floor — measured, not asserted.
* **ingest bandwidth** — the streaming path re-transfers the payload
  every pass by design (out-of-core contract). Records MB/s of the
  narrow wire format (bf16 values + int16 local ids) so the
  "host-build-bound" r3 streaming row is attributed: build vs transfer.

Writes a ``streaming_northstar`` entry into results_large_tpu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from single_algebra_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax

    from accuracy_at_scale import SHAPES, host_truth_ev, matrix_cached
    from single_algebra_tpu.models import StreamingSparsePCA

    cfg = SHAPES["northstar"]
    X = matrix_cached("northstar", cfg)
    ev_ref = host_truth_ev(X, cfg["k"], "northstar")
    n, p = X.shape
    print(f"[stream] {n}x{p} nnz={X.nnz}", file=sys.stderr, flush=True)

    # fold every 16 slabs: drift bounded to eps*sqrt(16) within a group,
    # groups combine in f64
    pca = StreamingSparsePCA(
        n_components=cfg["k"], n_features=p, random_seed=cfg["seed"],
        fold_every=16,
    )
    t0 = time.perf_counter()
    chunk_rows = 65536
    for r0 in range(0, n, chunk_rows):
        pca.partial_fit(X[r0 : r0 + chunk_rows])
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pca.finalize()
    fin_s = time.perf_counter() - t0

    ev = np.asarray(pca.explained_variance_, np.float64)[: len(ev_ref)]
    err = float(np.abs(ev - ev_ref).max() / ev_ref[0])
    print(
        f"[stream] partial_fit {fit_s:.1f}s finalize {fin_s:.1f}s "
        f"ev_rel_err {err:.2e}",
        file=sys.stderr, flush=True,
    )

    # actual wire bytes: re-derive from the payload shapes of one slab
    # pass (every slab is [nt*wt, 8192] bf16 + int16)
    from single_algebra_tpu.models.streaming_pca import (
        _SLAB, _bf16_exact, _slab_payload,
    )

    sl = X[:_SLAB]
    td, tl, wt, nt = _slab_payload(
        sl.indptr.astype(np.int64), sl.indices.astype(np.int32),
        sl.data.astype(np.float32), _SLAB, p, pca.ct,
        exact=_bf16_exact(sl.data.astype(np.float32)),
    )
    per_slab = td.nbytes + tl.nbytes
    n_slabs = -(-n // _SLAB)
    total_mb = per_slab * n_slabs / 2**20
    print(
        f"[stream] wire format {td.dtype}/{tl.dtype}, "
        f"{per_slab / 2**20:.1f} MB/slab x {n_slabs} = {total_mb:.0f} MB; "
        f"ingest {total_mb / fit_s:.0f} MB/s (build+transfer+compute "
        "overlapped)",
        file=sys.stderr, flush=True,
    )

    row = {
        "shape": "northstar_streaming",
        "n": n, "p": p, "nnz": int(X.nnz), "k": cfg["k"],
        "backend": str(jax.devices()[0].device_kind),
        "engine": "StreamingSparsePCA[fold_every=16,f64-fold]",
        "ev_rel_err": err,
        "partial_fit_s": round(fit_s, 2),
        "finalize_s": round(fin_s, 2),
        "wire_mb": round(total_mb, 1),
        "ingest_mb_s": round(total_mb / fit_s, 1),
        "note": (
            "out-of-core pass: payload re-transferred every fit (bf16 "
            "values + int16 local ids wire format); ev vs the same host "
            "f64 truth as the one-shot northstar row"
        ),
    }
    path = os.path.join(HERE, "results_large_tpu.json")
    res = json.load(open(path)) if os.path.exists(path) else {"rows": []}
    res["rows"] = [
        q for q in res.get("rows", [])
        if q.get("shape") != "northstar_streaming"
    ] + [row]
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
