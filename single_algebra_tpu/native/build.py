"""Lazy build + ctypes bindings for the native conversion library.

Compiles ``ell_convert.cpp`` with g++ on first use (cached as a .so next to
the source, keyed by source mtime) and exposes typed wrappers. Everything
degrades gracefully to the numpy implementations in ``sparse.convert`` when
a compiler is unavailable or ``SINGLE_ALGEBRA_TPU_NO_NATIVE=1`` is set.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ell_convert.cpp")
_SO = os.path.join(_HERE, "_ell_convert.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    base = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _SO,
    ]
    # OpenMP parallelizes the row loops (the host payload build is the
    # cold-path bottleneck at wide shapes); fall back to serial if the
    # toolchain lacks it
    for cmd in (base[:1] + ["-fopenmp"] + base[1:], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _SO
        except Exception:
            continue
    return None


def get_lib():
    """The loaded ctypes library, or None when native is unavailable."""

    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SINGLE_ALGEBRA_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None

        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        c64 = ctypes.c_int64

        lib.csr_to_ell_f32.argtypes = [
            i64p, i32p, f32p, c64, c64, f32p, i32p, i32p,
        ]
        lib.csr_to_ell_f32.restype = None
        lib.csr_transpose_f32.argtypes = [
            i64p, i32p, f32p, c64, c64, i64p, i32p, f32p, i64p,
        ]
        lib.csr_transpose_f32.restype = None
        lib.csr_to_tiled_ell_t_f32.argtypes = [
            i64p, i32p, f32p, c64, c64, c64, c64, c64, f32p, i32p,
        ]
        # returns the count of entries whose rank overflowed wt (caller
        # bug when nonzero — a stale width plan would otherwise corrupt
        # the heap silently)
        lib.csr_to_tiled_ell_t_f32.restype = c64
        lib.csr_tile_width.argtypes = [i64p, i32p, c64, c64]
        lib.csr_tile_width.restype = c64
        lib.csr_densify_bf16.argtypes = [
            i64p, i32p, f32p, c64, c64, u16p, ctypes.c_void_p,
        ]
        lib.csr_densify_bf16.restype = ctypes.c_int32
        lib.csr_tile_group_hist.argtypes = [i64p, i32p, c64, c64, i64p, c64]
        lib.csr_tile_group_hist.restype = None
        lib.csr_overflow_width.argtypes = [i64p, i32p, c64, c64, c64]
        lib.csr_overflow_width.restype = c64
        lib.csr_to_tiled_ell_split_t_f32.argtypes = [
            i64p, i32p, f32p, c64, c64, c64, c64, c64,
            f32p, i32p, f32p, i32p, c64,
        ]
        lib.csr_to_tiled_ell_split_t_f32.restype = None
        lib.csr_row_tile_widths.argtypes = [i64p, i32p, c64, c64, i64p]
        lib.csr_row_tile_widths.restype = None
        lib.csr_extract_rows_f32.argtypes = [
            i64p, i32p, f32p, i64p, c64, i64p, i32p, f32p,
        ]
        lib.csr_extract_rows_f32.restype = None
        lib.f32_bf16_exact.argtypes = [f32p, c64]
        lib.f32_bf16_exact.restype = ctypes.c_int32
        _lib = lib
        return _lib


_LEIDEN_SRC = os.path.join(_HERE, "leiden.cpp")
_LEIDEN_SO = os.path.join(_HERE, "_leiden.so")
_leiden_lib = None
_leiden_tried = False


def get_leiden_lib():
    """The loaded leiden ctypes library, or None when unavailable."""

    global _leiden_lib, _leiden_tried
    if _leiden_tried:
        return _leiden_lib
    with _lock:
        if _leiden_tried:
            return _leiden_lib
        _leiden_tried = True
        if os.environ.get("SINGLE_ALGEBRA_TPU_NO_NATIVE"):
            return None
        if not (
            os.path.exists(_LEIDEN_SO)
            and os.path.getmtime(_LEIDEN_SO) >= os.path.getmtime(_LEIDEN_SRC)
        ):
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", _LEIDEN_SRC, "-o", _LEIDEN_SO,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LEIDEN_SO)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.leiden_cluster.argtypes = [
            i64p, i32p, f32p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_uint64, ctypes.c_int64, i32p,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.leiden_cluster.restype = ctypes.c_int64
        _leiden_lib = lib
        return _leiden_lib


def leiden_native(indptr, indices, weights, n, resolution, seed, max_levels):
    """Native Leiden; returns (labels int32 [n], n_communities, quality)
    or None when the native library is unavailable."""

    lib = get_leiden_lib()
    if lib is None:
        return None
    labels = np.empty(n, np.int32)
    q = ctypes.c_double(0.0)
    k = lib.leiden_cluster(
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(weights, np.float32),
        n,
        float(resolution),
        int(seed) & 0xFFFFFFFFFFFFFFFF,
        int(max_levels),
        labels,
        ctypes.byref(q),
    )
    if k < 0:
        return None
    return labels, int(k), float(q.value)


# ---------------------------------------------------------------------------
# typed wrappers (numpy in/out); None return means "use the numpy fallback"
# ---------------------------------------------------------------------------


def csr_to_ell(indptr, indices, data, n_rows, width, rows_padded):
    lib = get_lib()
    if lib is None or data.dtype != np.float32:
        return None
    ell_data = np.zeros((rows_padded, width), np.float32)
    ell_ids = np.zeros((rows_padded, width), np.int32)
    row_nnz = np.zeros(rows_padded, np.int32)
    lib.csr_to_ell_f32(
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(data, np.float32),
        n_rows,
        width,
        ell_data,
        ell_ids,
        row_nnz,
    )
    return ell_data, ell_ids, row_nnz


def csr_transpose(indptr, indices, data, n_rows, n_cols):
    lib = get_lib()
    if lib is None or data.dtype != np.float32:
        return None
    nnz = len(indices)
    out_indptr = np.zeros(n_cols + 1, np.int64)
    out_indices = np.empty(nnz, np.int32)
    out_data = np.empty(nnz, np.float32)
    work = np.empty(max(n_cols, 1), np.int64)
    lib.csr_transpose_f32(
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(data, np.float32),
        n_rows,
        n_cols,
        out_indptr,
        out_indices,
        out_data,
        work,
    )
    return out_indptr, out_indices, out_data


def csr_densify_bf16(indptr, indices, data, n_rows, n_cols, need_lo):
    """Returns (hi_u16 [n, p], lo_u16 or None, exact: bool) or None."""

    lib = get_lib()
    if lib is None or data.dtype != np.float32:
        return None
    hi = np.zeros((n_rows, n_cols), np.uint16)
    lo = np.zeros((n_rows, n_cols), np.uint16) if need_lo else None
    exact = lib.csr_densify_bf16(
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(data, np.float32),
        n_rows,
        n_cols,
        hi,
        lo.ctypes.data if lo is not None else None,
    )
    return hi, lo, bool(exact)
