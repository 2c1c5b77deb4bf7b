"""ctypes bindings for the native streaming parsers (native/fastparse.cpp)
— the framework's counterpart of the reference's C++ file_parser layer.
Builds lazily with `make -C native` the first time it's needed; callers
fall back to the pure-Python parsers when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_failed = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastparse.so")


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR, "libfastparse.so"],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO_PATH)
            lib.fp_read_delim.restype = ctypes.c_void_p
            lib.fp_read_delim.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                          ctypes.c_int]
            lib.fp_read_mtx.restype = ctypes.c_void_p
            lib.fp_read_mtx.argtypes = [ctypes.c_char_p]
            for fn in ("fp_nrows", "fp_ncols", "fp_nnz"):
                getattr(lib, fn).restype = ctypes.c_int64
                getattr(lib, fn).argtypes = [ctypes.c_void_p]
            lib.fp_data.restype = ctypes.POINTER(ctypes.c_float)
            lib.fp_data.argtypes = [ctypes.c_void_p]
            lib.fp_rowidx.restype = ctypes.POINTER(ctypes.c_int32)
            lib.fp_rowidx.argtypes = [ctypes.c_void_p]
            lib.fp_colidx.restype = ctypes.POINTER(ctypes.c_int32)
            lib.fp_colidx.argtypes = [ctypes.c_void_p]
            lib.fp_rownames.restype = ctypes.c_char_p
            lib.fp_rownames.argtypes = [ctypes.c_void_p]
            lib.fp_colnames.restype = ctypes.c_char_p
            lib.fp_colnames.argtypes = [ctypes.c_void_p]
            lib.fp_error.restype = ctypes.c_char_p
            lib.fp_error.argtypes = [ctypes.c_void_p]
            lib.fp_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def _names(blob: bytes) -> Optional[List[str]]:
    if not blob:
        return None
    return blob.decode("utf-8", errors="replace").split("\n")


def read_delim(path: str, sep: str, gct: bool = False
               ) -> Tuple[np.ndarray, Optional[List[str]], Optional[List[str]]]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    h = lib.fp_read_delim(path.encode(), sep.encode(), 1 if gct else 0)
    try:
        err = lib.fp_error(h)
        if err:
            raise ValueError(err.decode())
        n, m = lib.fp_nrows(h), lib.fp_ncols(h)
        mat = np.ctypeslib.as_array(lib.fp_data(h), shape=(n, m)).copy()
        return (mat.astype(np.float32, copy=False),
                _names(lib.fp_rownames(h)), _names(lib.fp_colnames(h)))
    finally:
        lib.fp_free(h)


def read_mtx_coo(path: str
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    h = lib.fp_read_mtx(path.encode())
    try:
        err = lib.fp_error(h)
        if err:
            raise ValueError(err.decode())
        nnz = lib.fp_nnz(h)
        rows = np.ctypeslib.as_array(lib.fp_rowidx(h), shape=(nnz,)).copy()
        cols = np.ctypeslib.as_array(lib.fp_colidx(h), shape=(nnz,)).copy()
        vals = np.ctypeslib.as_array(lib.fp_data(h), shape=(nnz,)).copy()
        return rows, cols, vals, int(lib.fp_nrows(h)), int(lib.fp_ncols(h))
    finally:
        lib.fp_free(h)
