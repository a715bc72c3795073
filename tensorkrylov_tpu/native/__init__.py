"""ctypes bindings for the native host runtime (csrc/libtkcore.so).

Builds on demand with `make -C csrc` the first time it's imported; every
entry point has a pure-numpy fallback, so the package works without a
toolchain. See csrc/tkcore.cpp for what lives natively and why.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libtkcore.so")
_lib = None
_tried = False

__all__ = ["available", "banded_spmv", "dense_to_bands", "parse_bh_file"]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(os.path.join(_CSRC, "Makefile")):
        try:
            subprocess.run(
                ["make", "-C", _CSRC, "-s"], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    for suffix, dt in (("f64", np.float64), ("f32", np.float32)):
        fn = getattr(lib, f"tk_banded_spmv_{suffix}")
        p = np.ctypeslib.ndpointer(dt, flags="C")
        fn.argtypes = [p, c_i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int64, p, p, ctypes.c_int]
        fn.restype = None
    lib.tk_dense_to_bands_f64.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int, ctypes.c_int64,
        c_i64p, ctypes.c_int, np.ctypeslib.ndpointer(np.float64, flags="C"),
    ]
    lib.tk_detect_offsets_f64.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
    ]
    lib.tk_parse_bh_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
    ]
    lib.tk_parse_bh_file.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def banded_spmv(bands: np.ndarray, offsets, v: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """u[s] = A_s v[s] on the host. bands (d, nb, n), v (d, n)."""
    lib = _load()
    bands = np.ascontiguousarray(bands)
    v = np.ascontiguousarray(v, dtype=bands.dtype)
    d, nb, n = bands.shape
    off = np.asarray(offsets, np.int64)
    if lib is None:
        u = np.zeros_like(v)
        for b, o in enumerate(offsets):
            if o >= 0:
                u[:, : n - o] += bands[:, b, : n - o] * v[:, o:]
            else:
                u[:, -o:] += bands[:, b, -o:] * v[:, : n + o]
        return u
    u = np.empty_like(v)
    fn = lib.tk_banded_spmv_f64 if bands.dtype == np.float64 else lib.tk_banded_spmv_f32
    fn(bands, off, nb, d, n, v, u, nthreads)
    return u


def dense_to_bands(mats: np.ndarray) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """Detect nonzero diagonals and extract (d, nb, n) bands from dense
    (d, n, n) factors, natively when possible."""
    lib = _load()
    mats = np.ascontiguousarray(mats, np.float64)
    d, n, _ = mats.shape
    if lib is None:
        from ..models.gallery import dense_to_bands as py_impl

        return py_impl(mats)
    nz = np.zeros(2 * n - 1, np.uint8)
    lib.tk_detect_offsets_f64(mats, d, n, nz)
    offsets = tuple(int(o) for o in (np.nonzero(nz)[0] - (n - 1)))
    if not offsets:
        offsets = (0,)
    off = np.asarray(offsets, np.int64)
    bands = np.empty((d, len(offsets), n), np.float64)
    lib.tk_dense_to_bands_f64(mats, d, n, off, len(offsets), bands)
    return bands, offsets


def parse_bh_file(path: str, t: int) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a Braess–Hackbusch coefficient file → (omega, alpha)."""
    lib = _load()
    if lib is None:
        from ..coeffs.preprocess import parse_coefficient_file

        return parse_coefficient_file(path, t)
    omega = np.empty(t)
    alpha = np.empty(t)
    rc = lib.tk_parse_bh_file(path.encode(), t, omega, alpha)
    if rc != 0:
        raise ValueError(f"tk_parse_bh_file({path!r}, {t}) failed with code {rc}")
    return omega, alpha
