"""ctypes bindings for the native host runtime (native/sags_native.cpp).

The compute path is JAX/XLA on TPU; these are the CPU-side ingestion
primitives the reference implements natively (PCL VoxelGrid, kd-tree kNN,
PointCloud2 decode). Every function has a pure-python/JAX fallback so the
framework works without the compiled library.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libsags_native.so"),
    "libsags_native.so",
]


def _try_build() -> None:
    """Build the library from source on first use (the .so is not vendored —
    it is machine-specific; see native/Makefile). Silent no-op when no
    toolchain or source tree is present: every binding has a pure fallback."""
    makedir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    if not os.path.exists(os.path.join(makedir, "Makefile")):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", makedir], check=True, timeout=120,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except Exception:
        pass


def _load():
    for p in _LIB_PATHS:
        try:
            return ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
        except OSError:
            continue
    return None


_lib = _load()
if _lib is None:
    _try_build()
    _lib = _load()

if _lib is not None:
    _lib.sags_voxel_downsample.restype = ctypes.c_int
    _lib.sags_voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib.sags_kdtree_build.restype = ctypes.c_void_p
    _lib.sags_kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib.sags_kdtree_free.argtypes = [ctypes.c_void_p]
    _lib.sags_kdtree_knn.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
    ]
    _lib.sags_decode_xyzrgb.restype = ctypes.c_int
    _lib.sags_decode_xyzrgb.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]


def available() -> bool:
    return _lib is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxel_downsample(points: np.ndarray, resolution: float,
                     max_out: Optional[int] = None) -> np.ndarray:
    """PCL-VoxelGrid-style centroid downsample on the host."""
    pts = np.ascontiguousarray(points, np.float32)
    cap = max_out or len(pts)
    if _lib is None:
        from sags_tpu.ops.registration import downsample as jax_ds

        return jax_ds(pts, resolution)[:cap]
    out = np.empty((cap, 3), np.float32)
    n = _lib.sags_voxel_downsample(_fptr(pts), len(pts), resolution, _fptr(out), cap)
    return out[:n]


class KDTree:
    """Host kd-tree, the covariance-estimation search structure."""

    def __init__(self, points: np.ndarray):
        self._pts = np.ascontiguousarray(points, np.float32)
        self._handle = None
        if _lib is not None:
            self._handle = _lib.sags_kdtree_build(_fptr(self._pts), len(self._pts))

    def knn(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, np.float32)
        if self._handle is None:
            import jax.numpy as jnp

            from sags_tpu.ops.knn import knn as jknn

            d2, idx = jknn(jnp.asarray(q), jnp.asarray(self._pts), k=k)
            return np.asarray(d2), np.asarray(idx)
        idx = np.empty((len(q), k), np.int32)
        d2 = np.empty((len(q), k), np.float32)
        _lib.sags_kdtree_knn(
            self._handle, _fptr(q), len(q), k,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), _fptr(d2),
        )
        return d2, idx

    def __del__(self):
        if getattr(self, "_handle", None) is not None and _lib is not None:
            _lib.sags_kdtree_free(self._handle)


def decode_xyzrgb(data: bytes, point_step: int, x_offset: int = 0,
                  rgb_offset: int = 16, max_points: Optional[int] = None):
    """PointCloud2 decode: x,y,z float32 + packed-rgb float records
    (`read_xyz_rgb_from_raw`, `scripts/gaussian_splatting.py:105-134`)."""
    n_max = max_points or (len(data) // point_step)
    if _lib is None:
        arr = np.frombuffer(data, np.uint8)
        n = min(len(data) // point_step, n_max)
        rec = arr[: n * point_step].reshape(n, point_step)
        xyz = rec[:, x_offset : x_offset + 12].copy().view(np.float32).reshape(n, 3)
        packed = rec[:, rgb_offset : rgb_offset + 4].copy().view(np.uint32).reshape(n)
        rgb = np.stack(
            [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], -1
        ).astype(np.float32) / 255.0
        return xyz, rgb
    buf = np.frombuffer(data, np.uint8)
    xyz = np.empty((n_max, 3), np.float32)
    rgb = np.empty((n_max, 3), np.float32)
    n = _lib.sags_decode_xyzrgb(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(data), point_step,
        x_offset, rgb_offset, _fptr(xyz), _fptr(rgb), n_max,
    )
    return xyz[:n], rgb[:n]
