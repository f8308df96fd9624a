"""ctypes bindings for the native C++ data loader (cpp/dataloader.cpp).

Builds libsnvc_loader.so on demand (g++, libpng); falls back to the
cv2/numpy path transparently when unavailable.  The native loader decodes
PNGs in parallel directly into padded batch buffers — no per-image Python
allocations or copies.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "cpp", "dataloader.cpp")
_LIB = os.path.join(_REPO, "cpp", "libsnvc_loader.so")
_lock = threading.Lock()
_lib = None
_unavailable = False


def _load():
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC,
                     "-lpng", "-lz", "-lpthread"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.snvc_decode_png_rgb.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.snvc_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.snvc_load_velodyne.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ]
            lib.snvc_load_velodyne.restype = ctypes.c_long
            _lib = lib
        except Exception:
            _unavailable = True
        return _lib


def available() -> bool:
    return _load() is not None


def decode_png_padded(path: str, out_hw) -> Optional[np.ndarray]:
    """Decode one PNG into a zero-padded [H, W, 3] uint8 array."""
    lib = _load()
    if lib is None:
        return None
    H, W = out_hw
    buf = np.zeros((H, W, 3), np.uint8)
    rc = lib.snvc_decode_png_rgb(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W
    )
    return buf if rc == 0 else None


def decode_batch_padded(paths: Sequence[str], out_hw,
                        n_threads: int = 4) -> Optional[np.ndarray]:
    """Decode a batch of PNGs in parallel into [N, H, W, 3] uint8."""
    lib = _load()
    if lib is None:
        return None
    H, W = out_hw
    n = len(paths)
    buf = np.zeros((n, H, W, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.snvc_decode_batch(
        arr, n, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
        n_threads,
    )
    return buf if rc == 0 else None


def load_velodyne(path: str, max_points: int = 200000) -> Optional[np.ndarray]:
    """Read a velodyne .bin into [N, 4] float32."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(max_points * 4, np.float32)
    got = lib.snvc_load_velodyne(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size,
    )
    if got < 0:
        return None
    return buf[:got].reshape(-1, 4).copy()
