"""ctypes bindings for the C++ native loader (native/loader.cpp).

Builds the shared library on first use (g++ -O3 -shared, links libjpeg/libpng) and
exposes `NativeBatchLoader.load(paths, out_size, make_square) -> (N, S, S, 3) u8`.
Decode + resize run with the GIL released across a C++ thread pool — the native
replacement for the reference's 8 Python DataLoader workers (SURVEY §2.9). Falls
back cleanly if the toolchain or headers are missing (`available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "loader.cpp")
_SO = os.path.join(_REPO, "native", "libs4gloader.so")

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
           "-ljpeg", "-lpng", "-lpthread"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except Exception as e:  # g++ missing etc.
        return str(e)
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                       os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            err = _build()
            if err:
                _build_error = err
                return
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return
        lib.s4g_pool_create.restype = ctypes.c_void_p
        lib.s4g_pool_create.argtypes = [ctypes.c_int]
        lib.s4g_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.s4g_load_batch.restype = ctypes.c_int
        lib.s4g_load_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
        lib.s4g_augment_classification.restype = ctypes.c_int
        lib.s4g_augment_classification.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_float)]
        lib.s4g_decode_info.restype = ctypes.c_int
        lib.s4g_decode_info.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int)]
        _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> Optional[str]:
    return _build_error


class NativeBatchLoader:
    def __init__(self, num_threads: Optional[int] = None):
        _load()
        if _lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        n = num_threads or max(os.cpu_count() or 1, 1)
        self._pool = _lib.s4g_pool_create(n)

    def load(self, paths: List[str], out_size: int,
             make_square: bool = False) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, out_size, out_size, 3), np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = _lib.s4g_load_batch(
            self._pool, arr, n, out_size, int(make_square),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if rc != 0:
            raise IOError(f"native decode failed for {paths[rc - 1]}")
        return out

    def __del__(self):
        if getattr(self, "_pool", None) and _lib is not None:
            _lib.s4g_pool_destroy(self._pool)
            self._pool = None


def augment_classification(loader: "NativeBatchLoader", imgs_u8: np.ndarray,
                           seed: int) -> np.ndarray:
    """Full host-side classification augmentation (jitter/blur/flips/rotation/
    normalize) across the C++ thread pool. imgs_u8: (N, S, S, 3) uint8 ->
    float32 normalized. Statistical match of data/augment.py's device pipeline;
    intended for multi-core hosts where this overlaps device compute."""
    n, S = imgs_u8.shape[0], imgs_u8.shape[1]
    imgs_u8 = np.ascontiguousarray(imgs_u8)
    out = np.empty((n, S, S, 3), np.float32)
    _lib.s4g_augment_classification(
        loader._pool, imgs_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, S, ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
