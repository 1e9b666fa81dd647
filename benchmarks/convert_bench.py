"""Native converter throughput (host-side; the cold-path payload build).

Measures the two O(nnz) host passes that gate cold fits at wide shapes:
the CSR transpose and the transposed tiled-ELL payload fill (the one
rewritten to block-local buffering — 15 s -> 2.5 s single-core at this
shape). Appends rows to benchmarks/results_host_tools.json.

Run: python benchmarks/convert_bench.py [--rows 400000 --cols 30000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from single_algebra_tpu.native import build as nb  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--cols", type=int, default=30_000)
    ap.add_argument("--nnz-per-row", type=int, default=120)
    ap.add_argument("--col-tile", type=int, default=256)
    args = ap.parse_args()

    lib = nb.get_lib()
    if lib is None:
        print(json.dumps({"error": "native library unavailable"}))
        return

    rng = np.random.default_rng(0)
    n, p, k = args.rows, args.cols, args.nnz_per_row
    indptr = np.arange(n + 1, dtype=np.int64) * k
    indices = np.sort(
        rng.integers(0, p, (n, k)).astype(np.int32), axis=1
    ).ravel()
    data = rng.random(n * k, np.float32)
    nnz = len(data)

    t0 = time.perf_counter()
    out_indptr = np.zeros(p + 1, np.int64)
    out_indices = np.empty(nnz, np.int32)
    out_data = np.empty(nnz, np.float32)
    work = np.empty(p, np.int64)
    lib.csr_transpose_f32(
        indptr, indices, data, n, p, out_indptr, out_indices, out_data, work
    )
    transpose_s = time.perf_counter() - t0

    ct = args.col_tile
    wt = lib.csr_tile_width(indptr, indices, n, ct)
    rows_padded = -(-n // 8) * 8
    ntiles = -(-p // ct)
    td = np.zeros((ntiles * wt, rows_padded), np.float32)
    tl = np.zeros((ntiles * wt, rows_padded), np.int32)
    t0 = time.perf_counter()
    dropped = lib.csr_to_tiled_ell_t_f32(
        indptr, indices, data, n, ct, wt, rows_padded, ntiles * wt, td, tl
    )
    fill_s = time.perf_counter() - t0
    assert dropped == 0

    row = {
        "tool": "converters",
        "n_rows": n,
        "n_cols": p,
        "nnz": int(nnz),
        "threads": int(os.environ.get("OMP_NUM_THREADS", os.cpu_count())),
        "transpose_s": round(transpose_s, 3),
        "transpose_mnnz_per_s": round(nnz / transpose_s / 1e6, 1),
        "tiled_fill_s": round(fill_s, 3),
        "tiled_fill_mnnz_per_s": round(nnz / fill_s / 1e6, 1),
        "payload_gb": round(td.nbytes * 2 / 1e9, 2),
    }
    print(json.dumps(row))
    out = os.path.join(os.path.dirname(__file__), "results_host_tools.json")
    rows = json.load(open(out)) if os.path.exists(out) else []
    rows = [r for r in rows if r.get("tool") != "converters"]
    rows.append(row)
    json.dump(rows, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
