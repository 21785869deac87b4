"""Alternative local reference frame estimators: BOARD and FLARE.

Equivalents of pcl::BOARDLocalReferenceFrameEstimation (reference:
features/include/pcl/features/board.h — z = fitted plane normal, x toward
the neighbor whose normal deviates most from z, with border-aware handling)
and pcl::FLARELocalReferenceFrameEstimation (flare.h — z = fitted plane
normal, x toward the most "distinct" support point: max signed distance
from the tangent plane at the margin of the support).

Both return [N, 3, 3] frames (rows = x, y, z axes) + validity, matching the
SHOT LRF convention used across pcl_tpu.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.features.normals import normals_from_neighborhoods
from pcl_tpu.search import bruteforce

_EPS = 1e-12


def _fitted_z(xyz, mask, radius, k, src_xyz=None, src_mask=None):
    """Plane-fit z axis per query point over the support radius; neighbors
    come from (src_xyz, src_mask) when given (search-surface mode)."""
    if src_xyz is None:
        src_xyz, src_mask = xyz, mask
    n = src_xyz.shape[0]
    idx, d2, valid, _ = bruteforce.radius(src_xyz, src_mask, xyz, radius,
                                          cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]
    nbr = src_xyz[idxc]
    nrm, _ = normals_from_neighborhoods(
        xyz, nbr, valid, jnp.zeros((3,), xyz.dtype))
    return nrm, idxc, valid, nbr


@partial(jax.jit, static_argnames=("k",))
def board_lrf(
    cloud: Cloud,
    radius: float,
    *,
    k: int = 64,
    surface: Cloud = None,
) -> Tuple[jax.Array, jax.Array]:
    """BOARD frames: x points to the neighbor whose NORMAL tilts most from
    the local z (reference board.h computePointLRF). ``surface`` is the
    setSearchSurface analog: frames are computed at ``cloud``'s points
    with neighborhoods + normals drawn from ``surface`` (the recognition
    keypoint pattern — normals must live on the surface cloud there,
    matching FeatureFromNormals' surface/normals pairing)."""
    src = surface if surface is not None else cloud
    if ATTR_NORMAL not in src.attrs:
        raise ValueError("board_lrf requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    normals = src.attrs[ATTR_NORMAL]
    z, idxc, valid, nbr = _fitted_z(
        xyz, mask, radius, k,
        src_xyz=None if surface is None else src.xyz,
        src_mask=None if surface is None else src.mask)
    if surface is None:
        own_normal = normals
    else:
        # the query is an exact surface point: its lane is the d=0 nearest
        # neighbor (ascending-distance lists), so take lane 0's normal
        own_normal = normals[idxc[:, 0]]
    # orient z with the point's own normal
    flip = jnp.sum(z * own_normal, axis=-1) < 0
    z = jnp.where(flip[:, None], -z, z)
    n_nbr = normals[idxc]                                 # [N,k,3]
    cos_dev = jnp.sum(n_nbr * z[:, None, :], axis=-1)
    score = jnp.where(valid, 1.0 - cos_dev, -jnp.inf)     # max deviation
    best = jnp.argmax(score, axis=1)
    tgt = jnp.take_along_axis(nbr, best[:, None, None], axis=1)[:, 0, :]
    x = tgt - xyz
    x = x - jnp.sum(x * z, axis=-1, keepdims=True) * z
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
    ok = mask & (jnp.sum(valid, axis=1) >= 5) & (xn[:, 0] > _EPS)
    x = x / jnp.maximum(xn, _EPS)
    y = jnp.cross(z, x)
    frames = jnp.stack([x, y, z], axis=-2)
    return jnp.where(ok[:, None, None], frames, 0.0), ok


@partial(jax.jit, static_argnames=("k",))
def flare_lrf(
    cloud: Cloud,
    radius: float,
    *,
    margin: float = 0.85,
    k: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """FLARE frames: x points to the margin support point with the largest
    SIGNED distance from the tangent plane (reference flare.h — the "fast
    local" variant using geometry only)."""
    xyz, mask = cloud.xyz, cloud.mask
    z, idxc, valid, nbr = _fitted_z(xyz, mask, radius, k)
    rel = nbr - xyz[:, None, :]
    d = jnp.linalg.norm(rel, axis=-1)
    at_margin = valid & (d >= margin * radius * 0.5)
    signed = jnp.sum(rel * z[:, None, :], axis=-1)
    score = jnp.where(at_margin, signed, -jnp.inf)
    has_margin = jnp.any(at_margin, axis=1)
    # fall back to the full support when the margin ring is empty
    score = jnp.where(has_margin[:, None],
                      score, jnp.where(valid, signed, -jnp.inf))
    best = jnp.argmax(score, axis=1)
    tgt = jnp.take_along_axis(nbr, best[:, None, None], axis=1)[:, 0, :]
    x = tgt - xyz
    x = x - jnp.sum(x * z, axis=-1, keepdims=True) * z
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
    ok = mask & (jnp.sum(valid, axis=1) >= 5) & (xn[:, 0] > _EPS)
    x = x / jnp.maximum(xn, _EPS)
    y = jnp.cross(z, x)
    frames = jnp.stack([x, y, z], axis=-2)
    return jnp.where(ok[:, None, None], frames, 0.0), ok
