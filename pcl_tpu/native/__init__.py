"""Native host runtime: C++ kd-tree / morton sort / voxel binning.

The TPU compute path is JAX/XLA; this mirrors the reference's C++ host layer
(kdtree/include/pcl/kdtree/kdtree_flann.h:132, filters/impl/voxel_grid.hpp:725)
for host-resident work: IO-side preprocessing, out-of-core indexing, and the
exact-search oracle that validates the TPU hash-grid kernels.

Compiled lazily with g++ into ``libpcl_native.so`` next to this file; every
entry point has a pure-NumPy fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "pcl_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libpcl_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
    for flags in (["-fopenmp"], []):  # openmp if available
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", *flags,
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120,
            )
            return ctypes.CDLL(_LIB_PATH)
        except Exception:
            continue
    return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        lib = None
        # only reuse an existing .so when it is NOT older than the source —
        # a stale prebuilt binary would silently shadow source edits
        # (ADVICE r1).
        if os.path.exists(_LIB_PATH):
            try:
                fresh = os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
            except OSError:
                fresh = True
            if fresh:
                try:
                    lib = ctypes.CDLL(_LIB_PATH)
                except OSError:
                    lib = None
        if lib is None:
            lib = _build()
        if lib is not None:
            lib.pcl_kdtree_build.restype = ctypes.c_void_p
            lib.pcl_kdtree_build.argtypes = [_f32p, ctypes.c_int32]
            lib.pcl_kdtree_free.argtypes = [ctypes.c_void_p]
            lib.pcl_kdtree_knn.argtypes = [
                ctypes.c_void_p, _f32p, ctypes.c_int32, ctypes.c_int32,
                _f32p, _i32p, _i32p]
            lib.pcl_kdtree_radius.argtypes = [
                ctypes.c_void_p, _f32p, ctypes.c_int32, ctypes.c_float,
                ctypes.c_int32, _f32p, _i32p, _i32p]
            lib.pcl_morton_encode.argtypes = [_f32p, ctypes.c_int32, _u64p]
            lib.pcl_morton_argsort.argtypes = [_f32p, ctypes.c_int32, _i32p]
            lib.pcl_voxel_centroids.restype = ctypes.c_int32
            lib.pcl_voxel_centroids.argtypes = [
                _f32p, ctypes.c_int32, ctypes.c_float, _f32p]
        _lib = lib
        _tried = True
        return _lib


def available() -> bool:
    return _get() is not None


def _as_f32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32))


class KdTree:
    """Exact 3-D kd-tree (native C++ when available, NumPy fallback).

    Mirrors pcl::KdTreeFLANN (kdtree/include/pcl/kdtree/kdtree_flann.h:132):
    ``knn`` == nearestKSearch, ``radius`` == radiusSearch (sorted ascending).
    """

    def __init__(self, points) -> None:
        self._pts = _as_f32(points).reshape(-1, 3)
        self._n = self._pts.shape[0]
        lib = _get()
        self._lib = lib
        self._h = None
        if lib is not None:
            self._h = ctypes.c_void_p(lib.pcl_kdtree_build(self._pts, self._n))

    def __del__(self):
        try:
            if self._h is not None and self._lib is not None:
                self._lib.pcl_kdtree_free(self._h)
        except Exception:
            pass

    def knn(self, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Return (dist2 [m,k], idx [m,k]); idx=-1 / dist2=inf where fewer
        than k points exist."""
        q = _as_f32(queries).reshape(-1, 3)
        m = q.shape[0]
        k = int(k)
        if self._h is not None:
            d2 = np.full((m, k), np.inf, np.float32)
            ii = np.full((m, k), -1, np.int32)
            cnt = np.zeros((m,), np.int32)
            self._lib.pcl_kdtree_knn(self._h, q, m, k, d2, ii, cnt)
            tail = cnt[:, None] <= np.arange(k)[None, :]
            d2[tail] = np.inf
            ii[tail] = -1
            return d2, ii
        return _knn_numpy(self._pts, q, k)

    def radius(self, queries, r: float, cap: int = 64
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Return (dist2 [m,cap], idx [m,cap], count [m]); count may exceed
        cap (overflow signal), entries beyond are dropped."""
        q = _as_f32(queries).reshape(-1, 3)
        m = q.shape[0]
        cap = int(cap)
        if self._h is not None:
            d2 = np.full((m, cap), np.inf, np.float32)
            ii = np.full((m, cap), -1, np.int32)
            cnt = np.zeros((m,), np.int32)
            self._lib.pcl_kdtree_radius(
                self._h, q, m, ctypes.c_float(float(r)), cap, d2, ii, cnt)
            tail = np.minimum(cnt, cap)[:, None] <= np.arange(cap)[None, :]
            d2[tail] = np.inf
            ii[tail] = -1
            return d2, ii, cnt
        return _radius_numpy(self._pts, q, float(r), cap)


def _knn_numpy(pts, q, k):
    m = q.shape[0]
    if pts.shape[0] == 0:
        return (np.full((m, k), np.inf, np.float32),
                np.full((m, k), -1, np.int32))
    d2_all = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    kk = min(k, pts.shape[0])
    part = np.argpartition(d2_all, kk - 1, axis=1)[:, :kk]
    d2p = np.take_along_axis(d2_all, part, axis=1)
    order = np.argsort(d2p, axis=1)
    ii = np.take_along_axis(part, order, axis=1).astype(np.int32)
    d2 = np.take_along_axis(d2p, order, axis=1).astype(np.float32)
    if kk < k:
        pad = k - kk
        d2 = np.pad(d2, ((0, 0), (0, pad)), constant_values=np.inf)
        ii = np.pad(ii, ((0, 0), (0, pad)), constant_values=-1)
    return d2, ii


def _radius_numpy(pts, q, r, cap):
    m = q.shape[0]
    d2o = np.full((m, cap), np.inf, np.float32)
    iio = np.full((m, cap), -1, np.int32)
    cnt = np.zeros((m,), np.int32)
    if pts.shape[0] == 0:
        return d2o, iio, cnt
    d2_all = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    within = d2_all <= r * r
    cnt = within.sum(axis=1).astype(np.int32)
    for j in range(m):
        sel = np.nonzero(within[j])[0]
        d2s = d2_all[j, sel]
        order = np.argsort(d2s)[:cap]
        take = sel[order]
        d2o[j, : take.size] = d2s[order]
        iio[j, : take.size] = take
    return d2o, iio, cnt


def morton_argsort(points) -> np.ndarray:
    """Permutation ordering points along a 63-bit morton curve over their
    bbox (gpu/octree's octree_builder.cu ordering, host-side)."""
    pts = _as_f32(points).reshape(-1, 3)
    n = pts.shape[0]
    lib = _get()
    if lib is not None:
        order = np.empty((n,), np.int32)
        lib.pcl_morton_argsort(pts, n, order)
        return order
    codes = morton_encode(pts)
    return np.argsort(codes, kind="stable").astype(np.int32)


def morton_encode(points) -> np.ndarray:
    pts = _as_f32(points).reshape(-1, 3)
    n = pts.shape[0]
    lib = _get()
    if lib is not None:
        codes = np.empty((n,), np.uint64)
        lib.pcl_morton_encode(pts, n, codes)
        return codes
    # numpy fallback
    lo = pts.min(axis=0) if n else np.zeros(3, np.float32)
    hi = pts.max(axis=0) if n else np.ones(3, np.float32)
    w = np.where(hi - lo > 0, hi - lo, 1.0)
    qv = ((pts - lo) / w * ((1 << 21) - 1)).astype(np.uint64)

    def expand(v):
        v &= np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return (expand(qv[:, 0]) | (expand(qv[:, 1]) << np.uint64(1))
            | (expand(qv[:, 2]) << np.uint64(2)))


def voxel_centroids(points, leaf: float) -> np.ndarray:
    """Host VoxelGrid: mean of points per occupied voxel of size ``leaf``
    (filters/impl/voxel_grid.hpp:597 semantics, centroid of all points)."""
    pts = _as_f32(points).reshape(-1, 3)
    n = pts.shape[0]
    if n == 0:
        return pts
    lib = _get()
    if lib is not None:
        out = np.empty((n, 3), np.float32)
        nv = lib.pcl_voxel_centroids(pts, n, ctypes.c_float(float(leaf)), out)
        return out[:nv].copy()
    lo = pts.min(axis=0)
    key = np.floor((pts - lo) / leaf).astype(np.int64)
    key = (key[:, 0] * 2097152 + key[:, 1]) * 2097152 + key[:, 2]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    pts_s = pts[order]
    starts = np.r_[0, np.nonzero(np.diff(key_s))[0] + 1]
    counts = np.diff(np.r_[starts, n])
    sums = np.add.reduceat(pts_s, starts, axis=0)
    return (sums / counts[:, None]).astype(np.float32)
