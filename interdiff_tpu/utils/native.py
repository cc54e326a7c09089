"""ctypes binding for the native C++ signed-distance engine
(`native/mesh_distance.cpp`) — the BVH + pseudonormal replacement for
libigl's `signed_distance` on the offline contact-label path.

The library is compiled on demand with g++ (no pybind11 in this image); if
compilation is impossible the callers fall back to the pure-JAX
`ops/mesh_distance.py` implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmesh_distance.so"
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.sd_build.restype = ctypes.c_void_p
    lib.sd_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.sd_query.restype = None
    lib.sd_query.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_float)]
    lib.sd_free.restype = None
    lib.sd_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class SignedDistanceMesh:
    """BVH-accelerated signed distance queries against a fixed mesh."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native mesh_distance library unavailable")
        self._lib = lib
        self._verts = np.ascontiguousarray(verts, dtype=np.float32)
        self._faces = np.ascontiguousarray(faces, dtype=np.int32)
        self._handle = lib.sd_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._verts),
            self._faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(self._faces))

    def query(self, points: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """points [N,3] -> (signed dist [N], face idx [N], closest pt [N,3])."""
        pts = np.ascontiguousarray(points, dtype=np.float32)
        n = len(pts)
        dist = np.empty(n, dtype=np.float32)
        face = np.empty(n, dtype=np.int32)
        cp = np.empty((n, 3), dtype=np.float32)
        self._lib.sd_query(
            self._handle,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            face.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return dist, face, cp

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.sd_free(self._handle)
                self._handle = None
        except Exception:
            pass


def signed_distance(points: np.ndarray, verts: np.ndarray,
                    faces: np.ndarray) -> np.ndarray:
    """One-shot query; prefers native, falls back to the JAX implementation."""
    if native_available():
        return SignedDistanceMesh(verts, faces).query(points)[0]
    from interdiff_tpu.ops.mesh_distance import signed_distance_to_mesh

    return signed_distance_to_mesh(points, verts, faces)[0]
