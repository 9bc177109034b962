"""ctypes binding + on-demand build of the native data loader.

``load_batch(paths, crop, out_size, flips, num_threads)`` fills an NHWC
float32 array with decoded/cropped/resized/min-max-normalized images using a
C++ thread pool (GIL released for the whole batch).  Falls back gracefully:
``available()`` is False if the toolchain or codec libs are missing, and the
Python/PIL path in ``srgan_tpu.data.dataset`` keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataio.cc")
_LIB = os.path.join(_DIR, "libsrgan_dataio.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB, "-lpng", "-ljpeg", "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error:
                return
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _build_error = str(e)
            return
        lib.srgan_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.srgan_load_image.restype = ctypes.c_int
        lib.srgan_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.srgan_load_batch.restype = ctypes.c_int
        _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def load_image(path: str, crop: int, out_size: int,
               flip: bool = False) -> np.ndarray:
    _load()
    if _lib is None:
        raise RuntimeError(f"native dataio unavailable: {_build_error}")
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = _lib.srgan_load_image(
        path.encode(), crop, out_size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


def load_batch(paths: Sequence[str], crop: int, out_size: int,
               flips: Optional[np.ndarray] = None,
               num_threads: int = 0) -> np.ndarray:
    _load()
    if _lib is None:
        raise RuntimeError(f"native dataio unavailable: {_build_error}")
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if flips is None:
        flips = np.zeros(n, np.uint8)
    flips = np.ascontiguousarray(flips, np.uint8)
    num_threads = num_threads or min(os.cpu_count() or 8, 16)
    rc = _lib.srgan_load_batch(
        arr, n, crop, out_size,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native decode failed for {rc}/{n} images")
    return out
