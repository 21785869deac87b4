"""RoPS — rotational projection statistics descriptor.

Equivalent of pcl::ROPSEstimation (reference: features/include/pcl/features/
rops_estimation.h — Guo et al.: rotate the local surface about each LRF axis
by a set of angles, project onto the three coordinate planes, and collect
distribution-matrix statistics: central moments mu11, mu21, mu12 and Shannon
entropy). Default 3 rotations x 3 axes x 3 planes x (3 moments + entropy)
wait — the reference emits 135 = 3 axes x 3 rotations x 3 planes x 5 stats;
here stats = (mu11, mu12, mu21, mu22, entropy) to match that width.

The reference rotates a triangle MESH and weights by triangle area; this
TPU version rotates the neighborhood POINTS (documented deviation — same
statistics, point-sampled).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.features.shot import local_reference_frames
from pcl_tpu.search import bruteforce

_EPS = 1e-12


def _rot(axis_idx: int, angle: jax.Array) -> jax.Array:
    """3x3 rotation about coordinate axis ``axis_idx`` by ``angle``."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    if axis_idx == 0:
        rows = [[o, z, z], [z, c, -s], [z, s, c]]
    elif axis_idx == 1:
        rows = [[c, z, s], [z, o, z], [-s, z, c]]
    else:
        rows = [[c, -s, z], [s, c, z], [z, z, o]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def _plane_stats(u: jax.Array, v: jax.Array, w: jax.Array,
                 grid: int = 8) -> jax.Array:
    """Distribution-matrix statistics of the 2D projection (u, v) with
    point weights w: central moments mu11/mu12/mu21/mu22 + Shannon entropy
    of the grid x grid occupancy matrix. Shapes [N,k] -> [N,5]."""
    wsum = jnp.maximum(jnp.sum(w, axis=1), _EPS)
    mu_u = jnp.sum(w * u, axis=1) / wsum
    mu_v = jnp.sum(w * v, axis=1) / wsum
    du = u - mu_u[:, None]
    dv = v - mu_v[:, None]
    m11 = jnp.sum(w * du * dv, axis=1) / wsum
    m12 = jnp.sum(w * du * dv * dv, axis=1) / wsum
    m21 = jnp.sum(w * du * du * dv, axis=1) / wsum
    m22 = jnp.sum(w * du * du * dv * dv, axis=1) / wsum
    # entropy of the normalized grid occupancy
    lo_u = jnp.min(jnp.where(w > 0, u, jnp.inf), axis=1)
    hi_u = jnp.max(jnp.where(w > 0, u, -jnp.inf), axis=1)
    lo_v = jnp.min(jnp.where(w > 0, v, jnp.inf), axis=1)
    hi_v = jnp.max(jnp.where(w > 0, v, -jnp.inf), axis=1)
    su = jnp.maximum(hi_u - lo_u, _EPS)[:, None]
    sv = jnp.maximum(hi_v - lo_v, _EPS)[:, None]
    bu = jnp.clip(((u - lo_u[:, None]) / su * grid).astype(jnp.int32), 0, grid - 1)
    bv = jnp.clip(((v - lo_v[:, None]) / sv * grid).astype(jnp.int32), 0, grid - 1)
    flat = bu * grid + bv
    n = u.shape[0]
    row = jnp.broadcast_to(jnp.arange(n)[:, None], flat.shape)
    D = jnp.zeros((n, grid * grid), jnp.float32).at[
        row.reshape(-1), flat.reshape(-1)].add(w.reshape(-1))
    D = D / wsum[:, None]
    ent = -jnp.sum(jnp.where(D > 0, D * jnp.log(jnp.maximum(D, _EPS)), 0.0), axis=1)
    return jnp.stack([m11, m12, m21, m22, ent], axis=-1)


@partial(jax.jit, static_argnames=("k", "n_rotations", "grid"))
def estimate_rops(
    cloud: Cloud,
    radius: float,
    *,
    k: int = 64,
    n_rotations: int = 3,
    grid: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """RoPS descriptors [N, 3*n_rotations*3*5] (=135 by default) + LRFs.

    Per point: express neighbors in the LRF, then for each axis and each
    rotation angle, rotate and project onto the xy/xz/yz planes, collecting
    the 5 distribution statistics per projection."""
    xyz, mask = cloud.xyz, cloud.mask
    n = cloud.capacity
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]
    nbr = xyz[idxc]
    frames, ok = local_reference_frames(xyz, nbr, valid, radius)
    rel = jnp.einsum("nij,nkj->nki", frames, nbr - xyz[:, None, :])
    rel = rel / radius                                   # scale-normalize
    w = valid.astype(jnp.float32)

    feats = []
    angles = (jnp.arange(n_rotations, dtype=jnp.float32) + 1.0) \
        / (n_rotations + 1.0) * (0.5 * jnp.pi)
    for axis in range(3):
        for ai in range(n_rotations):
            R = _rot(axis, angles[ai])                   # [3,3]
            p = jnp.einsum("ij,nkj->nki", R, rel)
            for (u_i, v_i) in ((0, 1), (0, 2), (1, 2)):
                feats.append(_plane_stats(p[..., u_i], p[..., v_i], w, grid))
    out = jnp.concatenate(feats, axis=-1)
    return jnp.where((mask & ok)[:, None], out, 0.0), frames
