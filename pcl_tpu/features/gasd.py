"""GASD — globally aligned spatial distribution descriptor.

Equivalent of pcl::GASDEstimation / GASDColorEstimation (reference:
features/include/pcl/features/gasd.h — align the cloud to a PCA reference
frame, then histogram point occupancy over a regular grid; the color variant
appends per-cell hue histograms). Layouts match the registered signature
sizes: shape grid 8^3 x 1 bin = GASDSignature512; color grid 4^3 x 12 hue
bins = 768, giving 512+768 ~ the reference's GASDSignature984 family
(which uses 4^3 x 1 + 4^3 x 12 = 832 padded to 984; we keep the full
8^3 shape part — documented deviation, strictly more information).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_RGB
from pcl_tpu.core import geometry

_EPS = 1e-12


def gasd_reference_frame(cloud: Cloud,
                         view_direction=(0.0, 0.0, 1.0)) -> jax.Array:
    """PCA-based global alignment transform (reference: gasd.hpp
    computeAlignmentTransform :70-113): z = smallest eigenvector NEGATED
    when it points along the viewing direction (sensor convention: +z is
    the camera axis, so the frame z faces the viewpoint), x = largest
    eigenvector, y = z cross x. Golden-pinned to the reference's bun0
    transform (tests/test_golden_features.py)."""
    xyz, mask = cloud.xyz, cloud.mask
    mu, cov, _ = geometry.mean_and_covariance(xyz, mask)
    lam, V = geometry.eigh33(cov)                       # ascending
    z = V[:, 0]
    x = V[:, 2]
    vd = jnp.asarray(view_direction, xyz.dtype)
    z = jnp.where(jnp.dot(z, vd) > 0, -z, z)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=0)                    # world -> frame rows
    T = jnp.eye(4, dtype=xyz.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(-R @ mu)
    return T


@partial(jax.jit, static_argnames=("grid_size",))
def estimate_gasd(
    cloud: Cloud,
    grid_size: int = 8,
) -> jax.Array:
    """Shape descriptor [grid_size^3] (=512): trilinearly-interpolated point
    counts over the aligned bounding cube, L1-normalized."""
    T = gasd_reference_frame(cloud)
    xyz = cloud.xyz @ T[:3, :3].T + T[:3, 3]
    mask = cloud.mask
    w = mask.astype(jnp.float32)
    # half-extent of the aligned cloud defines the cube
    r = jnp.max(jnp.where(mask[:, None], jnp.abs(xyz), 0.0))
    r = jnp.maximum(r, _EPS) * 1.0001
    pos = (xyz / r * 0.5 + 0.5) * grid_size - 0.5       # [-0.5, grid-0.5]
    lo = jnp.floor(pos).astype(jnp.int32)
    f = pos - lo                                         # [N,3]
    hist = jnp.zeros((grid_size,) * 3, jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = jnp.clip(lo[:, 0] + dx, 0, grid_size - 1)
                cy = jnp.clip(lo[:, 1] + dy, 0, grid_size - 1)
                cz = jnp.clip(lo[:, 2] + dz, 0, grid_size - 1)
                wt = (w
                      * jnp.where(dx, f[:, 0], 1 - f[:, 0])
                      * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                      * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                hist = hist.at[cx, cy, cz].add(wt)
    hist = hist.reshape(-1)
    return hist / jnp.maximum(jnp.sum(hist), _EPS)


@partial(jax.jit, static_argnames=("grid_size", "hue_bins"))
def estimate_gasd_color(
    cloud: Cloud,
    grid_size: int = 4,
    hue_bins: int = 12,
) -> jax.Array:
    """Color descriptor [grid_size^3 * hue_bins] (=768): per-cell hue
    histograms over the aligned grid (reference GASDColorEstimation)."""
    if ATTR_RGB not in cloud.attrs:
        raise ValueError("estimate_gasd_color requires 'rgb'")
    T = gasd_reference_frame(cloud)
    xyz = cloud.xyz @ T[:3, :3].T + T[:3, 3]
    mask = cloud.mask
    w = mask.astype(jnp.float32)
    rgb = cloud.attrs[ATTR_RGB]
    # hue in [0, 1)
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    c = jnp.maximum(mx - mn, _EPS)
    r_, g_, b_ = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    h = jnp.where(mx == r_, ((g_ - b_) / c) % 6.0,
                  jnp.where(mx == g_, (b_ - r_) / c + 2.0, (r_ - g_) / c + 4.0))
    hue = h / 6.0
    hb = jnp.clip((hue * hue_bins).astype(jnp.int32), 0, hue_bins - 1)

    r = jnp.max(jnp.where(mask[:, None], jnp.abs(xyz), 0.0))
    r = jnp.maximum(r, _EPS) * 1.0001
    cell = jnp.clip(((xyz / r * 0.5 + 0.5) * grid_size).astype(jnp.int32),
                    0, grid_size - 1)
    flat = (cell[:, 0] * grid_size + cell[:, 1]) * grid_size + cell[:, 2]
    slot = flat * hue_bins + hb
    hist = jnp.zeros((grid_size ** 3 * hue_bins,), jnp.float32).at[slot].add(w)
    return hist / jnp.maximum(jnp.sum(hist), _EPS)
