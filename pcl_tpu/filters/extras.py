"""Additional filters — frustum, projection, grid min/max, shadow points,
bilateral, normal refinement, approximate voxel grid.

References:
- FrustumCulling: filters/include/pcl/filters/frustum_culling.h
- ProjectInliers: filters/include/pcl/filters/project_inliers.h
- ModelOutlierRemoval: filters/include/pcl/filters/model_outlier_removal.h
- GridMinimum / LocalMaximum: grid_minimum.h, local_maximum.h
- ShadowPoints: shadow_points.h
- BilateralFilter (intensity): bilateral.h
- NormalRefinement: normal_refinement.h
- ApproximateVoxelGrid: approximate_voxel_grid.h
- ExtractIndices: extract_indices.h
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_INTENSITY
from pcl_tpu.sac.models import SacModel
from pcl_tpu.search import bruteforce


@jax.jit
def frustum_culling(
    cloud: Cloud,
    camera_pose: jax.Array,        # [4,4] camera-to-world
    h_fov: float = jnp.pi / 3,
    v_fov: float = jnp.pi / 4,
    near: float = 0.0,
    far: float = jnp.inf,
    negative: bool = False,
) -> Cloud:
    """Keep points inside the camera view frustum. Camera looks along +x
    with +z up (the reference's convention, frustum_culling.h)."""
    w2c = jnp.linalg.inv(camera_pose)
    p = cloud.xyz @ w2c[:3, :3].T + w2c[:3, 3]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    in_depth = (x >= near) & (x <= far)
    in_h = jnp.abs(jnp.arctan2(y, x)) <= h_fov / 2
    in_v = jnp.abs(jnp.arctan2(z, x)) <= v_fov / 2
    keep = in_depth & in_h & in_v
    return cloud.with_mask(jnp.logical_xor(keep, negative))


def project_inliers(cloud: Cloud, model: SacModel, coefficients: jax.Array) -> Cloud:
    """Project every point onto the model surface (ProjectInliers)."""
    proj = model.project(coefficients[None], cloud.xyz)
    proj = proj.reshape(cloud.xyz.shape)
    return cloud.with_xyz(jnp.where(cloud.mask[:, None], proj, 0.0))


def model_outlier_removal(
    cloud: Cloud, model: SacModel, coefficients: jax.Array,
    threshold: float, negative: bool = False,
) -> Cloud:
    """Keep points within ``threshold`` of the model (ModelOutlierRemoval)."""
    d = model.distances(coefficients[None], cloud.xyz).reshape(-1)
    keep = d <= threshold
    return cloud.with_mask(jnp.logical_xor(keep, negative))


@jax.jit
def grid_minimum(cloud: Cloud, resolution: float) -> Cloud:
    """Keep the lowest (min z) point per 2D grid cell (GridMinimum — DEM
    construction for ground filtering)."""
    n = cloud.capacity
    cell = jnp.floor(cloud.xyz[:, :2] / resolution).astype(jnp.int32)
    h = (cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349669)
    h = jnp.abs(h) % jnp.int32(1 << 20)
    h = jnp.where(cloud.mask, h, jnp.int32(1 << 20))
    z = jnp.where(cloud.mask, cloud.xyz[:, 2], jnp.inf)
    zmin = jax.ops.segment_min(z, h, num_segments=(1 << 20) + 1)
    pos = jnp.arange(n)
    is_min = cloud.mask & (z == zmin[h])
    first = jax.ops.segment_min(jnp.where(is_min, pos, n), h,
                                num_segments=(1 << 20) + 1)
    keep = is_min & (pos == first[h])
    return cloud.with_mask(keep)


@partial(jax.jit, static_argnames=("cap",))
def local_maximum(cloud: Cloud, radius: float, cap: int = 32) -> Cloud:
    """Remove points that are NOT the z-maximum within their 2D radius
    neighborhood (LocalMaximum)."""
    xy = jnp.concatenate([cloud.xyz[:, :2], jnp.zeros((cloud.capacity, 1))], axis=1)
    idx, d2, valid, _ = bruteforce.radius(xy, cloud.mask, xy, radius, cap=cap)
    z = cloud.xyz[:, 2]
    nz = jnp.where(valid & cloud.mask[:, None],
                   z[jnp.clip(idx, 0, cloud.capacity - 1)], -jnp.inf)
    is_max = z >= jnp.max(nz, axis=1)
    return cloud.with_mask(is_max)


@partial(jax.jit, static_argnames=())
def shadow_points(cloud: Cloud, threshold: float = 0.1) -> Cloud:
    """Remove veil/shadow points: those whose normal is nearly perpendicular
    to the viewing ray (ShadowPoints)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("shadow_points requires normals")
    n = cloud.attrs[ATTR_NORMAL]
    ray = cloud.xyz / jnp.maximum(
        jnp.linalg.norm(cloud.xyz, axis=-1, keepdims=True), 1e-12)
    val = jnp.abs(jnp.sum(n * ray, axis=-1))
    return cloud.with_mask(val >= threshold)


@partial(jax.jit, static_argnames=("cap",))
def bilateral_filter(
    cloud: Cloud, sigma_s: float = 0.05, sigma_r: float = 0.05, cap: int = 32
) -> Cloud:
    """Edge-preserving intensity smoothing (BilateralFilter — operates on
    the 'intensity' attr over spatial neighborhoods)."""
    if ATTR_INTENSITY not in cloud.attrs:
        raise ValueError("bilateral_filter requires an intensity attr")
    inten = cloud.attrs[ATTR_INTENSITY]
    idx, d2, valid, _ = bruteforce.radius(
        cloud.xyz, cloud.mask, cloud.xyz, 2.0 * sigma_s, cap=cap)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    ni = inten[idxc]
    dv = ni - inten[:, None]
    w = jnp.exp(-d2 / (2 * sigma_s**2) - dv**2 / (2 * sigma_r**2))
    w = jnp.where(valid & cloud.mask[:, None], w, 0.0)
    out = jnp.sum(w * ni, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    out = jnp.where(cloud.mask, out, 0.0)
    return cloud.with_attrs(**{ATTR_INTENSITY: out})


@partial(jax.jit, static_argnames=("k",))
def normal_refinement(cloud: Cloud, k: int = 8, iterations: int = 3) -> Cloud:
    """Iteratively average normals over k-NN (NormalRefinement)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("normal_refinement requires normals")
    idx, _d2, valid = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    w = (valid & cloud.mask[:, None]).astype(jnp.float32)

    def body(n, _):
        nn = n[idxc]
        avg = jnp.einsum("nk,nki->ni", w, nn)
        avg = avg / jnp.maximum(jnp.linalg.norm(avg, axis=-1, keepdims=True), 1e-12)
        # keep orientation
        flip = jnp.sum(avg * n, axis=-1) < 0
        return jnp.where(flip[:, None], -avg, avg), None

    n0 = cloud.attrs[ATTR_NORMAL]
    n_ref, _ = jax.lax.scan(body, n0, None, length=iterations)
    n_ref = jnp.where(cloud.mask[:, None], n_ref, 0.0)
    return cloud.with_attrs(**{ATTR_NORMAL: n_ref})


@jax.jit
def approximate_voxel_grid(cloud: Cloud, leaf_size) -> Cloud:
    """Hash-based single-pass voxel centroid approximation
    (ApproximateVoxelGrid — collisions merge distinct voxels, like the
    reference's fixed-size hash)."""
    table = 1 << 16
    leaf = jnp.broadcast_to(jnp.asarray(leaf_size, jnp.float32), (3,))
    cell = jnp.floor(cloud.xyz / leaf).astype(jnp.int32)
    h = ((cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349669) ^ (cell[:, 2] * 83492791))
    h = jnp.abs(h) % jnp.int32(table)
    h = jnp.where(cloud.mask, h, jnp.int32(table))
    w = cloud.mask.astype(jnp.float32)
    cnt = jax.ops.segment_sum(w, h, num_segments=table + 1)
    s = jax.ops.segment_sum(cloud.xyz * w[:, None], h, num_segments=table + 1)
    cent = s / jnp.maximum(cnt, 1.0)[:, None]
    occupied = cnt[:table] > 0
    n = cloud.capacity
    # compact occupied buckets to the front of an n-capacity cloud
    order = jnp.argsort(jnp.where(occupied, 0, 1))[:n]
    m = occupied[order]
    xyz = jnp.where(m[:, None], cent[:table][order], 0.0)
    return Cloud(xyz=xyz, mask=m, attrs={}, width=0, height=1)


def extract_indices(cloud: Cloud, indices: jax.Array, negative: bool = False) -> Cloud:
    """Keep (or drop) an explicit index set (ExtractIndices)."""
    sel = jnp.zeros((cloud.capacity,), bool).at[indices].set(True)
    keep = jnp.logical_xor(sel, negative)
    return cloud.with_mask(keep)
