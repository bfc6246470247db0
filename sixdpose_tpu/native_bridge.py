"""ctypes bridge to the native host-runtime library (native/).

The TPU owns the compute path; these C++ kernels cover the serial,
latency-bound host algorithms between device stages (greedy feature
selection, Floyd-Steinberg seeding, NMS) — the places the reference also
used native code.  Pure-Python fallbacks keep everything working when the
library hasn't been built; build it with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.environ.get("SIXDPOSE_NATIVE_LIB", ""),
        os.path.join(here, "native", "libsixdpose_native.so"),
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "libsixdpose_native.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _build_if_possible() -> Optional[str]:
    """Try a one-shot build of the native library (best effort)."""
    import shutil
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ndir = os.path.join(here, "native")
    if not os.path.isdir(ndir) or shutil.which("make") is None:
        return None
    try:
        subprocess.run(
            ["make", "-C", ndir], check=True, capture_output=True, timeout=120
        )
    except Exception:
        return None
    return _find_library()


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _find_library() or _build_if_possible()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.select_scattered.restype = ctypes.c_int32
    lib.select_scattered.argtypes = [
        i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float, i32p,
    ]
    lib.floyd_steinberg.restype = ctypes.c_int32
    lib.floyd_steinberg.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32, f32p, ctypes.c_int32,
    ]
    lib.nms_boxes.restype = None
    lib.nms_boxes.argtypes = [
        f32p, u8p, ctypes.c_int32, ctypes.c_float, u8p,
    ]
    lib.union_find_flatten.restype = None
    lib.union_find_flatten.argtypes = [i32p, ctypes.c_int32]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def select_scattered(xs: np.ndarray, ys: np.ndarray, num_features: int, distance: float):
    """Native greedy scattered selection; None if unavailable or failed."""
    lib = get_lib()
    if lib is None:
        return None
    xs32 = np.ascontiguousarray(xs, np.int32)
    ys32 = np.ascontiguousarray(ys, np.int32)
    out = np.zeros(num_features, np.int32)
    n = lib.select_scattered(xs32, ys32, len(xs32), num_features, float(distance), out)
    if n < 0:
        return None
    return out[:n].astype(np.int64)


def floyd_steinberg(density: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(density, np.float32)
    cap = int(max(d.sum() * 2 + 1024, 4096))
    out = np.zeros(cap * 2, np.float32)
    n = lib.floyd_steinberg(d, d.shape[0], d.shape[1], out, cap)
    n = min(n, cap)
    return out[: 2 * n].reshape(-1, 2).astype(np.float64)


def nms_boxes(boxes: np.ndarray, valid: np.ndarray, iou: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(boxes, np.float32)
    v = np.ascontiguousarray(valid, np.uint8)
    keep = np.zeros(len(b), np.uint8)
    lib.nms_boxes(b, v, len(b), float(iou), keep)
    return keep.astype(bool)
