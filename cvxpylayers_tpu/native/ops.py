"""Numpy-facing wrappers over the native kernels, with vectorized numpy
fallbacks (identical results)."""

from __future__ import annotations

import ctypes

import numpy as np

from .build import get_lib


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr_i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr_f64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def join_pairs(ka, kb):
    """All index pairs (ia, ib) with ka[ia] == kb[ib], grouped by ia.

    Returns (ia, ib) int64 arrays.
    """
    ka = _as_i64(ka)
    kb = _as_i64(kb)
    if ka.size == 0 or kb.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()

    lib = get_lib()
    if lib is not None:
        order = np.empty(kb.size, dtype=np.int64)
        counts = np.empty(ka.size, dtype=np.int64)
        total = lib.join_count(
            _ptr_i64(ka), ka.size, _ptr_i64(kb), kb.size,
            _ptr_i64(order), _ptr_i64(counts),
        )
        ia = np.empty(total, dtype=np.int64)
        ib = np.empty(total, dtype=np.int64)
        kb_sorted = kb[order]
        lib.join_fill(
            _ptr_i64(ka), ka.size, _ptr_i64(kb_sorted), kb.size,
            _ptr_i64(order), _ptr_i64(ia), _ptr_i64(ib),
        )
        return ia, ib

    # vectorized numpy fallback (no Python-level per-entry loop)
    order = np.argsort(kb, kind="stable")
    kb_sorted = kb[order]
    starts = np.searchsorted(kb_sorted, ka, side="left")
    ends = np.searchsorted(kb_sorted, ka, side="right")
    counts = ends - starts
    total = int(counts.sum())
    ia = np.repeat(np.arange(ka.size, dtype=np.int64), counts)
    # positions within runs: global offset trick
    run_offsets = np.repeat(starts, counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    ib = order[run_offsets + within]
    return ia, ib


def coo_matmat(rows, var_cols, param_cols, vals, L_csc):
    """Entries of L @ E for a TensorRep's COO entry list: for every entry
    k and every stored L[i, rows[k]], emit (i, var_cols[k], param_cols[k],
    L[i, rows[k]] * vals[k]). `L_csc` is a scipy CSC matrix with columns
    indexed by the rep's rows (shape (n_out, n_rows)).

    Returns (out_rows, out_vars, out_pars, out_vals) or None when the
    native library is unavailable (callers fall back to scipy).
    """
    lib = get_lib()
    if lib is None:
        return None
    rows = _as_i64(rows)
    var_cols = _as_i64(var_cols)
    param_cols = _as_i64(param_cols)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    indptr = _as_i64(L_csc.indptr)
    indices = _as_i64(L_csc.indices)
    data = np.ascontiguousarray(L_csc.data, dtype=np.float64)
    n_in = L_csc.shape[1]
    total = lib.coo_matmat_count(_ptr_i64(rows), rows.size,
                                 _ptr_i64(indptr), n_in)
    out_rows = np.empty(total, dtype=np.int64)
    out_vars = np.empty(total, dtype=np.int64)
    out_pars = np.empty(total, dtype=np.int64)
    out_vals = np.empty(total, dtype=np.float64)
    lib.coo_matmat_fill(
        _ptr_i64(rows), _ptr_i64(var_cols), _ptr_i64(param_cols),
        _ptr_f64(vals), rows.size,
        _ptr_i64(indptr), _ptr_i64(indices), _ptr_f64(data), n_in,
        _ptr_i64(out_rows), _ptr_i64(out_vars), _ptr_i64(out_pars),
        _ptr_f64(out_vals),
    )
    return out_rows, out_vars, out_pars, out_vals
