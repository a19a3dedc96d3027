"""ctypes bindings + lazy build of the native preprocessing library.

The C++ kernels (native/laneops.cpp) implement the input pipeline's hot path:
PIL-parity triangle-filter resize fused with normalization, and
nearest-neighbor mask resize. Built on first use with g++ (cached next to the
source); falls back to the pure-PIL path if no compiler is available
(`available()` returns False).

ctypes calls release the GIL, so the loader's decode thread pool
(data/loader.py) scales across cores.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "laneops.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "liblaneops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-fPIC",
               "-shared", "-std=c++17", _SRC, "-o", _LIB_PATH]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resample_to_f32.argtypes = [u8p] + [ctypes.c_int] * 3 + [f32p] + \
        [ctypes.c_int] * 3
    lib.resample_to_f32.restype = None
    lib.resize_nearest_u8.argtypes = [u8p] + [ctypes.c_int] * 2 + [u8p] + \
        [ctypes.c_int] * 3
    lib.resize_nearest_u8.restype = None
    lib.u8_to_unit_f32.argtypes = [u8p] + [ctypes.c_int] * 3 + [f32p, ctypes.c_int]
    lib.u8_to_unit_f32.restype = None
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _tried = True
                try:
                    _lib = _build()
                except Exception:
                    _lib = None
    return _lib


def available() -> bool:
    return _get() is not None


def resample_to_f32(src: np.ndarray, dh: int, dw: int,
                    flip: bool = False) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [0,1], PIL-BILINEAR-equivalent resample."""
    lib = _get()
    assert lib is not None, "native library unavailable"
    src = np.ascontiguousarray(src, dtype=np.uint8)
    sh, sw, ch = src.shape
    out = np.empty((dh, dw, ch), dtype=np.float32)
    lib.resample_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        int(flip))
    return out


def u8_to_unit_f32(src: np.ndarray, flip: bool = False) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [0,1], optional horizontal mirror — the
    in-RAM image-cache serving path (no decode, no resample)."""
    lib = _get()
    if lib is None:
        out = src.astype(np.float32) / 255.0
        return out[:, ::-1].copy() if flip else out
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h, w, ch = src.shape
    out = np.empty((h, w, ch), dtype=np.float32)
    lib.u8_to_unit_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(flip))
    return out


def resize_nearest_u8(src: np.ndarray, dh: int, dw: int,
                      flip: bool = False) -> np.ndarray:
    """uint8 HW -> uint8 HW nearest-neighbor resize (mask path)."""
    lib = _get()
    assert lib is not None, "native library unavailable"
    src = np.ascontiguousarray(src, dtype=np.uint8)
    sh, sw = src.shape
    out = np.empty((dh, dw), dtype=np.uint8)
    lib.resize_nearest_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
        int(flip))
    return out
