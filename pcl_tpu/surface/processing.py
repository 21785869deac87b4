"""Surface post-processing — grid projection, surfel smoothing, bilateral
upsampling, texture mapping.

- ``grid_projection``: pcl::GridProjection (reference: surface/include/pcl/
  surface/grid_projection.h) reconstructs by projecting padding-cell centers
  onto the surface defined by a smoothed vector field. The TPU re-design
  evaluates the Hoppe signed distance + its finite-difference gradient on a
  dense grid in one batch and projects surface-adjacent cell centers along
  the gradient (two Newton steps) — the same project-onto-zero-set
  capability without the reference's per-cell hash map.
- ``surfel_smoothing``: pcl::SurfelSmoothing (surface/include/pcl/surface/
  surfel_smoothing.h) — iterative Gaussian-weighted neighborhood averaging
  of positions AND normals until motion stalls; one lax.while_loop of
  batched kNN gathers.
- ``bilateral_upsampling``: pcl::BilateralUpsampling (surface/include/pcl/
  surface/bilateral_upsampling.h) — organized-cloud depth inpainting with a
  joint bilateral filter guided by RGB; pure stencil convolution.
- ``texture_mapping``: pcl::TextureMapping (surface/include/pcl/surface/
  texture_mapping.h) — per-triangle UV coordinates by projecting mesh
  vertices into one or more camera frames with visibility (z) checks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB
from pcl_tpu.search import bruteforce
from pcl_tpu.surface.reconstruction import hoppe_signed_distance


def grid_projection(
    cloud: Cloud,
    resolution: int = 24,
    padding: float = 0.1,
) -> np.ndarray:
    """Project near-surface grid-cell centers onto the implicit surface;
    returns [M,3] surface samples (the reference emits its mesh from exactly
    these projected cell points)."""
    xyz = np.asarray(cloud.xyz)[np.asarray(cloud.mask)]
    lo, hi = xyz.min(axis=0), xyz.max(axis=0)
    span = hi - lo
    gmin = (lo - padding * span).astype(np.float32)
    gmax = (hi + padding * span).astype(np.float32)

    sd = np.asarray(
        hoppe_signed_distance(
            cloud, jnp.asarray(gmin), jnp.asarray(gmax), resolution=resolution
        )
    )
    R = resolution
    cell = (gmax - gmin) / (R - 1)
    # surface-adjacent cells: |sd| within one cell diagonal
    diag = float(np.linalg.norm(cell))
    ii = np.argwhere(np.abs(sd) <= diag)
    if ii.size == 0:
        return np.zeros((0, 3), np.float32)
    centers = gmin[None, :] + ii.astype(np.float32) * cell[None, :]

    # finite-difference gradient at those cells
    g = np.stack(np.gradient(sd, cell[0], cell[1], cell[2]), axis=-1)
    grad = g[ii[:, 0], ii[:, 1], ii[:, 2]]
    gn = np.linalg.norm(grad, axis=1, keepdims=True) + 1e-12
    d = sd[ii[:, 0], ii[:, 1], ii[:, 2]][:, None]
    proj = centers - d * grad / gn  # one Newton step onto the zero set
    return proj.astype(np.float32)


@partial(jax.jit, static_argnames=("k", "max_iterations"))
def _surfel_iter(xyz, mask, normals, radius, k, max_iterations, converge_eps):
    sigma2 = (radius * 0.5) ** 2

    def body(state):
        p, n, it, delta = state
        idx, d2, _ = bruteforce.knn(p, mask, p, k)
        valid = mask[jnp.clip(idx, 0, p.shape[0] - 1)] & (d2 <= radius * radius)
        w = jnp.where(valid, jnp.exp(-d2 / (2.0 * sigma2)), 0.0)
        wsum = w.sum(axis=1, keepdims=True) + 1e-12
        nb_p = p[jnp.clip(idx, 0, p.shape[0] - 1)]
        nb_n = n[jnp.clip(idx, 0, p.shape[0] - 1)]
        new_p = (w[..., None] * nb_p).sum(axis=1) / wsum
        new_n = (w[..., None] * nb_n).sum(axis=1)
        new_n = new_n / (jnp.linalg.norm(new_n, axis=-1, keepdims=True) + 1e-12)
        new_p = jnp.where(mask[:, None], new_p, p)
        new_n = jnp.where(mask[:, None], new_n, n)
        delta = jnp.max(jnp.where(mask, jnp.linalg.norm(new_p - p, axis=-1), 0.0))
        return new_p, new_n, it + 1, delta

    def cond(state):
        _, _, it, delta = state
        return (it < max_iterations) & (delta > converge_eps)

    p, n, it, _ = jax.lax.while_loop(
        cond, body, (xyz, normals, 0, jnp.float32(jnp.inf))
    )
    return p, n


def surfel_smoothing(
    cloud: Cloud,
    radius: float,
    k: int = 16,
    max_iterations: int = 10,
    converge_eps: float = 1e-5,
) -> Cloud:
    """Iteratively smooth positions+normals (surfel_smoothing.hpp
    smoothCloudIteration loop until average motion < eps)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("surfel_smoothing requires normals")
    p, n = _surfel_iter(
        cloud.xyz,
        cloud.mask,
        cloud.attrs[ATTR_NORMAL],
        jnp.float32(radius),
        k,
        max_iterations,
        jnp.float32(converge_eps),
    )
    return cloud.with_xyz(p).with_attrs(**{ATTR_NORMAL: n})


@partial(jax.jit, static_argnames=("window",))
def bilateral_upsampling(
    depth: jax.Array,
    rgb: jax.Array,
    window: int = 5,
    sigma_color: float = 15.0,
    sigma_depth: float = 0.5,
) -> jax.Array:
    """Fill invalid (<=0 / NaN) depth pixels of an organized frame with a
    joint bilateral estimate guided by the color image; valid pixels are
    bilateral-smoothed. depth [H,W] f32 (0 = hole), rgb [H,W,3] in [0,1]
    or [0,255]."""
    H, W = depth.shape
    d = jnp.where(jnp.isfinite(depth) & (depth > 0), depth, 0.0)
    valid = d > 0
    r = window // 2
    num = jnp.zeros_like(d)
    den = jnp.zeros_like(d)
    c = rgb.astype(jnp.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sd = jnp.roll(jnp.roll(d, dy, 0), dx, 1)
            sv = jnp.roll(jnp.roll(valid, dy, 0), dx, 1)
            sc = jnp.roll(jnp.roll(c, dy, 0), dx, 1)
            w_s = jnp.exp(-(dx * dx + dy * dy) / (2.0 * (r + 0.5) ** 2))
            w_c = jnp.exp(
                -jnp.sum((sc - c) ** 2, axis=-1) / (2.0 * sigma_color**2)
            )
            w_d = jnp.where(
                valid, jnp.exp(-((sd - d) ** 2) / (2.0 * sigma_depth**2)), 1.0
            )
            w = w_s * w_c * w_d * sv
            num += w * sd
            den += w
    out = jnp.where(den > 1e-12, num / den, 0.0)
    return out


def texture_mapping(
    vertices: np.ndarray,
    triangles: np.ndarray,
    cam_pose: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-vertex UVs from one camera: transform into camera frame, project,
    normalize to [0,1]; triangles fully inside the image AND facing the
    camera get is_visible=True (texture_mapping.hpp mapTexture2Face /
    getPointUVCoordinates). Returns (uv [V,2] f32, visible [F] bool)."""
    Tcw = np.linalg.inv(np.asarray(cam_pose, np.float64))
    vh = np.concatenate([vertices, np.ones((len(vertices), 1))], axis=1)
    pc = (Tcw @ vh.T).T[:, :3]
    z = pc[:, 2]
    u = fx * pc[:, 0] / np.where(z > 1e-9, z, np.inf) + cx
    v = fy * pc[:, 1] / np.where(z > 1e-9, z, np.inf) + cy
    uv = np.stack([u / width, 1.0 - v / height], axis=1).astype(np.float32)
    in_img = (z > 1e-9) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    vis = in_img[triangles].all(axis=1)
    return uv, vis
