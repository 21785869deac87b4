"""3D shape context descriptors: 3DSC and USC.

Equivalents of pcl::ShapeContext3DEstimation (reference: features/include/
pcl/features/3dsc.h — log-radial x elevation x azimuth histogram of
density-weighted neighbor counts; azimuth origin RANDOM, the descriptor is
compared under azimuth shifts) and pcl::UniqueShapeContext (usc.h — same
grid but anchored to a unique local reference frame, no random rotation).

Default grid: 15 radial x 11 elevation x 12 azimuth = 1980 bins (the
reference's ShapeContext1980 signature).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.features.shot import local_reference_frames
from pcl_tpu.search import bruteforce

_EPS = 1e-12


def _sc_histogram(rel, valid, min_radius, radius,
                  radial_bins, elevation_bins, azimuth_bins, density_k=None):
    """Shared shape-context binning: ``rel`` [N,k,3] neighbor offsets in the
    local frame, log-radial binning, density weights 1/(count * cbrt(V))."""
    d = jnp.linalg.norm(rel, axis=-1)
    inside = valid & (d > min_radius) & (d <= radius)
    # log-spaced radial edges (reference 3dsc.hpp radii_interval_)
    j = jnp.arange(radial_bins + 1, dtype=jnp.float32)
    edges = jnp.exp(jnp.log(min_radius)
                    + (j / radial_bins) * (jnp.log(radius) - jnp.log(min_radius)))
    rbin = jnp.clip(jnp.searchsorted(edges, d, side="right") - 1, 0, radial_bins - 1)
    # elevation in [0, pi] from the +z axis; azimuth in [0, 2pi)
    el = jnp.arccos(jnp.clip(rel[..., 2] / jnp.maximum(d, _EPS), -1.0, 1.0))
    ebin = jnp.clip((el / jnp.pi * elevation_bins).astype(jnp.int32),
                    0, elevation_bins - 1)
    az = jnp.arctan2(rel[..., 1], rel[..., 0]) + jnp.pi
    abin = jnp.clip((az / (2 * jnp.pi) * azimuth_bins).astype(jnp.int32),
                    0, azimuth_bins - 1)
    flat = (rbin * elevation_bins + ebin) * azimuth_bins + abin   # [N,k]
    # density weight: 1 / (local count * cbrt(bin volume)); bin volume from
    # the radial shell (azimuth/elevation factor constant per shell)
    shell_vol = (edges[1:] ** 3 - edges[:-1] ** 3)
    vol = shell_vol[rbin] / (elevation_bins * azimuth_bins)
    local_cnt = jnp.maximum(jnp.sum(inside, axis=1, keepdims=True), 1)
    w = jnp.where(inside, 1.0 / (local_cnt * jnp.cbrt(jnp.maximum(vol, _EPS))), 0.0)

    n = rel.shape[0]
    nbins = radial_bins * elevation_bins * azimuth_bins
    row = jnp.broadcast_to(jnp.arange(n)[:, None], flat.shape)
    hist = jnp.zeros((n, nbins), jnp.float32).at[
        row.reshape(-1), flat.reshape(-1)].add(w.reshape(-1))
    norm = jnp.maximum(jnp.linalg.norm(hist, axis=1, keepdims=True), _EPS)
    return hist / norm


@partial(jax.jit, static_argnames=("k", "radial_bins", "elevation_bins",
                                   "azimuth_bins"))
def estimate_3dsc(
    cloud: Cloud,
    radius: float,
    *,
    min_radius: float = None,
    k: int = 64,
    radial_bins: int = 15,
    elevation_bins: int = 11,
    azimuth_bins: int = 12,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """3DSC [N, 1980]: z-axis = point normal, azimuth origin random per
    point (reference 3dsc.hpp computePoint — the random x-axis)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_3dsc requires normals")
    if min_radius is None:
        min_radius = 0.1 * radius
    if key is None:
        key = jax.random.PRNGKey(0)
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None] & (d2 > _EPS)
    rel_w = xyz[idxc] - xyz[:, None, :]

    # frame: z = normal, x = random in the tangent plane
    z = normals
    rnd = jax.random.normal(key, (n, 3))
    x = rnd - jnp.sum(rnd * z, axis=-1, keepdims=True) * z
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), _EPS)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=-2)                  # [N,3,3] rows
    rel = jnp.einsum("nij,nkj->nki", R, rel_w)
    return _sc_histogram(rel, valid, min_radius, radius,
                         radial_bins, elevation_bins, azimuth_bins)


@partial(jax.jit, static_argnames=("k", "radial_bins", "elevation_bins",
                                   "azimuth_bins"))
def estimate_usc(
    cloud: Cloud,
    radius: float,
    *,
    min_radius: float = None,
    lrf_radius: float = None,
    k: int = 64,
    radial_bins: int = 15,
    elevation_bins: int = 11,
    azimuth_bins: int = 12,
) -> Tuple[jax.Array, jax.Array]:
    """USC: shape context anchored to the SHOT-style unique LRF (reference
    usc.hpp — no random azimuth). Returns (descriptors [N, 1980],
    frames [N, 3, 3])."""
    if min_radius is None:
        min_radius = 0.1 * radius
    if lrf_radius is None:
        lrf_radius = radius
    xyz, mask = cloud.xyz, cloud.mask
    n = cloud.capacity
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None] & (d2 > _EPS)
    nbr = xyz[idxc]
    frames, ok = local_reference_frames(xyz, nbr, valid, lrf_radius)
    rel_w = nbr - xyz[:, None, :]
    rel = jnp.einsum("nij,nkj->nki", frames, rel_w)
    hist = _sc_histogram(rel, valid, min_radius, radius,
                         radial_bins, elevation_bins, azimuth_bins)
    hist = jnp.where((mask & ok)[:, None], hist, 0.0)
    return hist, frames
