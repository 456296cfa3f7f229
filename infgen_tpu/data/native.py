"""ctypes bindings for the native host-side kernels (native/womd_native.cc).

Auto-builds the shared object with `make` on first use when a toolchain is
available; all callers fall back to the numpy implementations otherwise.
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwomd_native.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.interpolate_polyline.restype = ctypes.c_int
    lib.interpolate_polyline.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.tfrecord_index.restype = ctypes.c_int64
    lib.tfrecord_index.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def interpolate_polyline_native(points: np.ndarray, headings: np.ndarray,
                                distance: float = 0.5,
                                split_distance: float = 5.0
                                ) -> Optional[np.ndarray]:
    """Native 5 m pt-token segment splitting; None if the lib is unavailable.

    Returns [n_seg, 3, 3] float32 (x, y, theta) like
    map_tokenizer.interpolate_polyline, or None for no segments.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points[:, :2], np.float64)
    hds = np.ascontiguousarray(headings, np.float64)
    n = pts.shape[0]
    max_out = max(n, 8)
    out = np.empty((max_out, 3, 3), np.float32)
    n_seg = lib.interpolate_polyline(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, distance, split_distance,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
    if n_seg <= 0:
        return None
    return out[:n_seg].copy()


def tfrecord_index(path: str, max_records: int = 1_000_000
                   ) -> List[Tuple[int, int]]:
    """(offset, length) pairs of records in a TFRecord file (native scan)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.empty(2 * max_records, np.int64)
    n = lib.tfrecord_index(path.encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int64)), max_records)
    if n < 0:
        raise IOError(f"failed to scan {path}")
    pairs = buf[:2 * n].reshape(-1, 2)
    return [(int(o), int(l)) for o, l in pairs]
