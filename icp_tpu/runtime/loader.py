"""ctypes binding to the native CSV runtime (fastcsv.cpp).

Auto-builds the shared library on first use (g++ is in the image; no
pybind11 needed — plain C ABI + ctypes). Falls back silently if the
toolchain is unavailable; services.lidar then uses the NumPy parser.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native")
_SO = os.path.join(_NATIVE_DIR, "libfastcsv.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.lidar_parse.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_void_p)]
    lib.lidar_parse.restype = ctypes.c_int
    lib.lidar_num_scans.argtypes = [ctypes.c_void_p]
    lib.lidar_num_scans.restype = ctypes.c_int64
    lib.lidar_num_points.argtypes = [ctypes.c_void_p]
    lib.lidar_num_points.restype = ctypes.c_int64
    for name in ("lidar_timestamps", "lidar_offsets"):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_void_p]
        fn.restype = ctypes.POINTER(ctypes.c_int64)
    lib.lidar_points.argtypes = [ctypes.c_void_p]
    lib.lidar_points.restype = ctypes.POINTER(ctypes.c_float)
    lib.lidar_free.argtypes = [ctypes.c_void_p]
    lib.lidar_free.restype = None
    _lib = lib
    return lib


def load_lidar_csv(path: str):
    """Parse a whole lidar CSV natively.

    Returns a list of (timestamp_raw, (N, 3) float32 points) — padding
    triples already dropped — or raises if the native lib is unavailable
    (callers fall back to the NumPy parser).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastcsv unavailable")
    handle = ctypes.c_void_p()
    rc = lib.lidar_parse(path.encode(), ctypes.byref(handle))
    if rc != 0:
        raise RuntimeError(f"lidar_parse({path}) failed rc={rc}")
    try:
        n = lib.lidar_num_scans(handle)
        npts = lib.lidar_num_points(handle)
        ts = np.ctypeslib.as_array(lib.lidar_timestamps(handle),
                                   shape=(n,)).copy()
        offs = np.ctypeslib.as_array(lib.lidar_offsets(handle),
                                     shape=(n + 1,)).copy()
        pts = np.ctypeslib.as_array(lib.lidar_points(handle),
                                    shape=(npts, 3)).copy()
    finally:
        lib.lidar_free(handle)
    return [
        (int(ts[i]), pts[offs[i]:offs[i + 1]])
        for i in range(n)
    ]
