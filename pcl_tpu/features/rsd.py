"""Radius-based surface descriptors: RSD and GRSD.

Equivalents of pcl::RSDEstimation (reference: features/include/pcl/features/
rsd.h — per-point min/max surface radius from neighbor distance vs normal
angle) and pcl::GRSDEstimation (grsd.h — global histogram of local surface
type transitions).

For a pair at distance d whose normals subtend angle alpha, the osculating
sphere radius is r = d / (2 sin(alpha/2)) ~ d / alpha. RSD keeps the min and
max over the neighborhood (clamped to plane_radius, the "infinite radius"
proxy for flats). GRSD classifies each point's (r_min, r_max) into one of 5
geometric categories and histograms category co-occurrences of neighboring
points into the reference's 21-bin signature.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.search import bruteforce

# GRSD surface categories (reference grsd.h classification thresholds)
_NOISE, _PLANE, _CYLINDER, _SPHERE, _EDGE = 0, 1, 2, 3, 4
N_CATEGORIES = 5
GRSD_BINS = N_CATEGORIES * (N_CATEGORIES + 1) // 2 + N_CATEGORIES + 1  # 21


@partial(jax.jit, static_argnames=("k",))
def estimate_rsd(
    cloud: Cloud,
    radius: float,
    *,
    plane_radius: float = 0.2,
    k: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Per-point (r_min, r_max) surface radii (reference rsd.h
    computeRSD). Needs a 'normal' attribute. Returns two [N] arrays."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_rsd requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    valid = valid & mask[:, None] & (d2 > 1e-12)       # exclude self

    d = jnp.sqrt(jnp.maximum(d2, 0.0))                 # [N,k]
    n_nbr = normals[idxc]                              # [N,k,3]
    cos_a = jnp.clip(jnp.sum(n_nbr * normals[:, None, :], axis=-1), -1.0, 1.0)
    alpha = jnp.arccos(cos_a)                          # [N,k]
    # r = d / (2 sin(alpha/2)); alpha -> 0 means flat -> plane_radius
    sin_half = jnp.sin(0.5 * alpha)
    r = jnp.where(sin_half > 1e-6, d / jnp.maximum(2.0 * sin_half, 1e-12),
                  jnp.float32(plane_radius))
    r = jnp.clip(r, 0.0, plane_radius)
    r_min = jnp.min(jnp.where(valid, r, jnp.inf), axis=1)
    r_max = jnp.max(jnp.where(valid, r, -jnp.inf), axis=1)
    has = jnp.any(valid, axis=1)
    r_min = jnp.where(has, r_min, 0.0)
    r_max = jnp.where(has, r_max, 0.0)
    return r_min, r_max


def _classify(r_min: jax.Array, r_max: jax.Array, plane_radius: float) -> jax.Array:
    """Surface category from principal radii (reference grsd.h:
    GRSDEstimation::getSimpleType thresholds, in units of meters)."""
    min_radius_plane = 0.100
    min_radius_noise = 0.015
    max_radius_noise = 0.050
    min_radius_cylinder = 0.175
    max_min_radius_diff = 0.050
    cat = jnp.full(r_min.shape, _SPHERE, jnp.int32)
    cat = jnp.where(r_min > min_radius_plane, _PLANE, cat)
    cat = jnp.where((r_min < min_radius_noise) & (r_max < max_radius_noise),
                    _NOISE, cat)
    cat = jnp.where((r_max > min_radius_cylinder)
                    & (r_max - r_min > max_min_radius_diff), _CYLINDER, cat)
    edge = (r_min < min_radius_noise) & (r_max > min_radius_cylinder)
    cat = jnp.where(edge, _EDGE, cat)
    return cat


@partial(jax.jit, static_argnames=("k",))
def estimate_grsd(
    cloud: Cloud,
    radius: float,
    *,
    plane_radius: float = 0.2,
    k: int = 32,
) -> jax.Array:
    """Global 21-bin GRSD signature (reference grsd.h — histogram of
    surface-category transitions between neighboring cells; here between
    neighboring POINTS, the cell graph collapsed onto the point graph)."""
    r_min, r_max = estimate_rsd(cloud, radius, plane_radius=plane_radius, k=k)
    cat = _classify(r_min, r_max, plane_radius)        # [N]
    xyz, mask = cloud.xyz, cloud.mask
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    valid = valid & mask[:, None] & (d2 > 1e-12)
    ci = jnp.broadcast_to(cat[:, None], idxc.shape)
    cj = cat[idxc]
    lo = jnp.minimum(ci, cj)
    hi = jnp.maximum(ci, cj)
    # unordered pair (lo, hi) -> triangular index
    pair_bin = lo * N_CATEGORIES - (lo * (lo - 1)) // 2 + (hi - lo)
    w = valid.astype(jnp.float32)
    hist = jnp.zeros((GRSD_BINS,), jnp.float32).at[pair_bin.reshape(-1)].add(
        w.reshape(-1))
    # last N_CATEGORIES+1 bins: category occupancy (free space bin stays 0
    # without a ray-traced empty-voxel model)
    base = N_CATEGORIES * (N_CATEGORIES + 1) // 2
    occ = jnp.zeros((N_CATEGORIES,), jnp.float32).at[cat].add(
        mask.astype(jnp.float32))
    hist = hist.at[base:base + N_CATEGORIES].set(occ)
    total = jnp.maximum(jnp.sum(hist), 1e-12)
    return hist / total
