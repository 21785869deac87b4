"""Convolution filters — 3D point convolution, cloud pyramids, fast
bilateral (grid) filtering, covariance/normal-space-style sampling.

- ``convolution_3d``: pcl::filters::Convolution3D with GaussianKernel
  (reference: filters/include/pcl/filters/convolution_3d.h) — each output
  point is the Gaussian-weighted average of its radius neighbors; one
  batched kNN + masked weighted reduction.
- ``convolution_rows/cols``: pcl::filters::Convolution (convolution.h) —
  separable kernels over ORGANIZED clouds (borders: ignore/mirror/duplicate).
- ``pyramid``: pcl::filters::Pyramid (pyramid.h) — Gaussian 5-tap
  smooth + 2x decimation levels of an organized cloud.
- ``fast_bilateral``: pcl::FastBilateralFilter (+OMP)
  (fast_bilateral.h) — Paris/Durand bilateral grid on the depth channel of
  an organized cloud: splat into a downsampled (x, y, z) grid, blur with a
  separable 1-2-1 kernel, slice trilinearly. One jit, no per-pixel loops.
- ``covariance_sampling``: pcl::CovarianceSampling (covariance_sampling.h)
  — selects points that stabilize the 6x6 ICP normal-equation conditioning
  (torque/force balance): scores points by their contribution along the
  weakest eigenvectors.
- ``sampling_surface_normal``: pcl::SamplingSurfaceNormal
  (sampling_surface_normal.h) — voxel-partition the cloud, per cell fit a
  plane and emit up to ``samples_per_cell`` points carrying the cell normal.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.core import geometry
from pcl_tpu.search import bruteforce


@partial(jax.jit, static_argnames=("k",))
def convolution_3d(
    cloud: Cloud,
    radius: float,
    sigma: Optional[float] = None,
    k: int = 32,
) -> Cloud:
    """Gaussian 3D convolution of positions (convolution_3d.h +
    GaussianKernel::operator()); attrs are carried through unchanged."""
    s = radius / 2.0 if sigma is None else sigma
    idx, d2, ok = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k)
    ok &= (d2 <= radius * radius) & cloud.mask[:, None]
    w = jnp.where(ok, jnp.exp(-d2 / (2.0 * s * s)), 0.0)
    nb = cloud.xyz[jnp.clip(idx, 0, cloud.capacity - 1)]
    wsum = w.sum(1, keepdims=True)
    out = (w[..., None] * nb).sum(1) / jnp.maximum(wsum, 1e-12)
    out = jnp.where((wsum > 0) & cloud.mask[:, None], out, cloud.xyz)
    return cloud.with_xyz(out)


@partial(jax.jit, static_argnames=("border",))
def convolution_rows(img: jax.Array, kernel: jax.Array, border: str = "duplicate"):
    """1D convolution along rows of an organized [H,W,...] array
    (convolution.h convolveRows; border policy mirrors/duplicates)."""
    k = kernel.shape[0]
    r = k // 2
    pad = [(0, 0)] * img.ndim
    pad[1] = (r, r)
    mode = {"duplicate": "edge", "mirror": "reflect", "ignore": "constant"}[border]
    pi = jnp.pad(img, pad, mode=mode)
    out = jnp.zeros_like(img, dtype=jnp.float32)
    for i in range(k):
        out = out + kernel[i] * pi[:, i : i + img.shape[1]].astype(jnp.float32)
    return out


@partial(jax.jit, static_argnames=("border",))
def convolution_cols(img: jax.Array, kernel: jax.Array, border: str = "duplicate"):
    k = kernel.shape[0]
    r = k // 2
    pad = [(0, 0)] * img.ndim
    pad[0] = (r, r)
    mode = {"duplicate": "edge", "mirror": "reflect", "ignore": "constant"}[border]
    pi = jnp.pad(img, pad, mode=mode)
    out = jnp.zeros_like(img, dtype=jnp.float32)
    for i in range(k):
        out = out + kernel[i] * pi[i : i + img.shape[0]].astype(jnp.float32)
    return out


def pyramid(xyz_img: np.ndarray, valid: np.ndarray, levels: int = 3):
    """Gaussian pyramid of an organized cloud: [(xyz_img, valid)] per level
    (pyramid.h compute: 5-tap binomial smooth + decimate)."""
    kern = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    out = [(np.asarray(xyz_img), np.asarray(valid))]
    cur = jnp.asarray(xyz_img, jnp.float32)
    curv = jnp.asarray(valid)
    for _ in range(levels - 1):
        w = curv.astype(jnp.float32)[..., None]
        sm = convolution_cols(convolution_rows(cur * w, kern), kern)
        sw = convolution_cols(convolution_rows(w, kern), kern)
        sm = sm / jnp.maximum(sw, 1e-9)
        cur = sm[::2, ::2]
        curv = (sw[::2, ::2, 0] > 0.25) & curv[::2, ::2]
        out.append((np.asarray(cur), np.asarray(curv)))
    return out


@partial(jax.jit, static_argnames=("grid_xy", "grid_z"))
def fast_bilateral(
    depth: jax.Array,
    sigma_s: float = 8.0,
    sigma_r: float = 0.05,
    grid_xy: int = 64,
    grid_z: int = 32,
) -> jax.Array:
    """Edge-preserving depth smoothing via the bilateral grid
    (fast_bilateral.h applyFilter). depth [H,W] f32, invalid <= 0 kept."""
    H, W = depth.shape
    valid = depth > 0
    zmin = jnp.min(jnp.where(valid, depth, jnp.inf))
    zmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
    zr = jnp.maximum(zmax - zmin, 1e-6)

    gx = jnp.arange(W)[None, :] / sigma_s
    gy = jnp.arange(H)[:, None] / sigma_s
    gz = (depth - zmin) / sigma_r

    nx = jnp.clip(gx / jnp.maximum(gx.max(), 1e-9) * (grid_xy - 2), 0, grid_xy - 2)
    ny = jnp.clip(gy / jnp.maximum(gy.max(), 1e-9) * (grid_xy - 2), 0, grid_xy - 2)
    nz = jnp.clip(gz / jnp.maximum(gz.max(), 1e-9) * (grid_z - 2), 0, grid_z - 2)
    nx = jnp.broadcast_to(nx, (H, W))
    ny = jnp.broadcast_to(ny, (H, W))

    i0 = jnp.floor(nx).astype(jnp.int32)
    j0 = jnp.floor(ny).astype(jnp.int32)
    k0 = jnp.floor(nz).astype(jnp.int32)
    fx, fy, fz = nx - i0, ny - j0, nz - k0

    grid = jnp.zeros((grid_xy, grid_xy, grid_z, 2), jnp.float32)
    val = jnp.where(valid, depth, 0.0)
    vw = jnp.stack([val, valid.astype(jnp.float32)], -1)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                w = (
                    (fx if di else 1 - fx)
                    * (fy if dj else 1 - fy)
                    * (fz if dk else 1 - fz)
                ) * valid
                grid = grid.at[j0 + dj, i0 + di, k0 + dk].add(
                    vw * w[..., None]
                )
    for ax in range(3):
        grid = (
            0.25 * jnp.roll(grid, 1, ax) + 0.5 * grid + 0.25 * jnp.roll(grid, -1, ax)
        )

    # trilinear slice
    out = jnp.zeros((H, W, 2), jnp.float32)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                w = (
                    (fx if di else 1 - fx)
                    * (fy if dj else 1 - fy)
                    * (fz if dk else 1 - fz)
                )
                out = out + grid[j0 + dj, i0 + di, k0 + dk] * w[..., None]
    sm = out[..., 0] / jnp.maximum(out[..., 1], 1e-9)
    return jnp.where(valid, sm, depth)


def covariance_sampling(
    cloud: Cloud,
    n_samples: int,
) -> np.ndarray:
    """Indices of points that best constrain the 6-DoF ICP system
    (covariance_sampling.hpp applyFilter: score each point's [n, p x n]
    contribution against the 6x6 covariance's weakest eigenvectors and
    keep a balanced top set)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("covariance_sampling requires normals")
    xyz = np.asarray(cloud.xyz)
    m = np.asarray(cloud.mask)
    n = np.asarray(cloud.attrs[ATTR_NORMAL])
    c = xyz[m] - xyz[m].mean(0)
    nn = n[m]
    scale = np.abs(c).max() + 1e-12
    f = np.concatenate([np.cross(c / scale, nn), nn], 1)  # [M,6]
    cov = f.T @ f
    w, v = np.linalg.eigh(cov)
    # contribution along the 3 weakest directions
    score = (f @ v[:, :3]) ** 2
    score = score.sum(1)
    order = np.argsort(-score)
    keep_local = order[:n_samples]
    return np.flatnonzero(m)[keep_local]


def sampling_surface_normal(
    cloud: Cloud,
    cell_size: float,
    samples_per_cell: int = 4,
    seed: int = 0,
) -> Cloud:
    """Voxel-partition + per-cell plane normal; emits sampled points with
    the cell's fitted normal attached (sampling_surface_normal.hpp
    partition/samplePartition/computeNormal)."""
    import jax.numpy as jnp
    from pcl_tpu.core.cloud import make_cloud

    xyz = np.asarray(cloud.xyz)
    m = np.asarray(cloud.mask)
    pts = xyz[m]
    rng = np.random.default_rng(seed)
    key = np.floor(pts / cell_size).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    out_p, out_n = [], []
    for ci in range(len(uniq)):
        sel = np.flatnonzero(inv == ci)
        if len(sel) < 3:
            continue
        sub = pts[sel]
        c0 = sub.mean(0)
        cov = (sub - c0).T @ (sub - c0)
        w, v = np.linalg.eigh(cov)
        nrm = v[:, 0]
        take = sel if len(sel) <= samples_per_cell else rng.choice(
            sel, samples_per_cell, replace=False
        )
        out_p.append(pts[take])
        out_n.append(np.tile(nrm, (len(take), 1)))
    if not out_p:
        return make_cloud(jnp.zeros((1, 3), jnp.float32),
                          mask=jnp.zeros((1,), bool))
    P = np.concatenate(out_p).astype(np.float32)
    N = np.concatenate(out_n).astype(np.float32)
    c = make_cloud(jnp.asarray(P))
    return c.with_attrs(normal=jnp.asarray(N))
