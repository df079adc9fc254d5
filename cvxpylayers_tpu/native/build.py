"""Compile-and-cache loader for the native canon kernels."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = Path(__file__).parent / "csrc" / "canon_kernels.cpp"


def _cache_dir() -> Path:
    d = Path(
        os.environ.get("CVXPYLAYERS_TPU_CACHE",
                       os.path.expanduser("~/.cache/cvxpylayers_tpu"))
    )
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    so = _cache_dir() / f"canon_kernels_{tag}.so"
    if not so.exists():
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            str(_SRC), "-o", str(so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.join_count.restype = ctypes.c_int64
    lib.join_count.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64,
                               i64p, i64p]
    lib.join_fill.restype = None
    lib.join_fill.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64,
                              i64p, i64p, i64p]
    lib.coo_matmat_count.restype = ctypes.c_int64
    lib.coo_matmat_count.argtypes = [i64p, ctypes.c_int64, i64p,
                                     ctypes.c_int64]
    lib.coo_matmat_fill.restype = None
    lib.coo_matmat_fill.argtypes = [
        i64p, i64p, i64p, f64p, ctypes.c_int64,
        i64p, i64p, f64p, ctypes.c_int64,
        i64p, i64p, i64p, f64p,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if not _tried:
            _lib = _build()
            _tried = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None
