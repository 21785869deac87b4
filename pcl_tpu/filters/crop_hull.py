"""CropHull + ConditionalRemoval + organized MedianFilter.

- crop_hull (reference: filters/include/pcl/filters/crop_hull.h): keep
  points inside (or outside) a closed triangle-mesh hull. 3D test = ray
  crossing parity against all hull triangles, batched [N, F] on device
  (the reference does the same ray-crossing per point); 2D = polygon
  crossing parity.
- conditional_removal (reference: conditional_removal.h): boolean
  condition trees over fields, built from composable predicates.
- median_filter (reference: median_filter.h): per-pixel window median on
  organized clouds' z (reference filters z only), via shift-stack sort.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud


@partial(jax.jit, static_argnames=())
def _ray_crossings(pts: jax.Array, tri: jax.Array) -> jax.Array:
    """[N,3] x [F,3,3] -> [N] crossing counts of the +x ray (Möller-
    Trumbore, batched)."""
    o = pts                                   # [N,3]
    d = jnp.asarray([1.0, 0.0, 0.0])
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    e1 = v1 - v0                              # [F,3]
    e2 = v2 - v0
    pvec = jnp.cross(d, e2)                   # [F,3]
    det = jnp.einsum("fi,fi->f", e1, pvec)    # [F]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[:, None, :] - v0[None, :, :]     # [N,F,3]
    u = jnp.einsum("nfi,fi->nf", tvec, pvec) * inv_det[None, :]
    qvec = jnp.cross(tvec, e1[None, :, :])    # [N,F,3]
    v = jnp.einsum("nfi,i->nf", qvec, d) * inv_det[None, :]
    t = jnp.einsum("nfi,fi->nf", qvec, e2) * inv_det[None, :]
    hit = (jnp.abs(det)[None, :] > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-9)
    return jnp.sum(hit, axis=1)


def crop_hull(
    cloud: Cloud,
    hull_vertices: np.ndarray,
    hull_triangles: np.ndarray,
    negative: bool = False,
) -> Cloud:
    """Keep points inside the closed hull (crossing parity odd)."""
    tri = jnp.asarray(np.asarray(hull_vertices, np.float32)[np.asarray(hull_triangles)])
    crossings = _ray_crossings(cloud.xyz, tri)
    inside = (crossings % 2) == 1
    return cloud.with_mask(jnp.logical_xor(inside, negative))


# ---------------------------------------------------------------------------
# Conditional removal: predicate combinators
# ---------------------------------------------------------------------------

def field(name: str):
    """Field accessor predicate builder ('x'/'y'/'z' or attr name)."""
    axis = {"x": 0, "y": 1, "z": 2}.get(name)

    def get(cloud: Cloud) -> jax.Array:
        if axis is not None:
            return cloud.xyz[:, axis]
        return cloud.attrs[name]

    return get


def gt(get, v):
    return lambda c: get(c) > v


def lt(get, v):
    return lambda c: get(c) < v


def ge(get, v):
    return lambda c: get(c) >= v


def le(get, v):
    return lambda c: get(c) <= v


def and_(*preds):
    def f(c):
        m = preds[0](c)
        for p in preds[1:]:
            m = m & p(c)
        return m
    return f


def or_(*preds):
    def f(c):
        m = preds[0](c)
        for p in preds[1:]:
            m = m | p(c)
        return m
    return f


def not_(pred):
    return lambda c: ~pred(c)


def conditional_removal(cloud: Cloud, condition, keep_organized: bool = True) -> Cloud:
    """pcl::ConditionalRemoval: keep points satisfying the condition tree."""
    return cloud.with_mask(condition(cloud))


# ---------------------------------------------------------------------------
# Organized median filter
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("window",))
def median_filter(cloud: Cloud, window: int = 5, max_movement: float = jnp.inf) -> Cloud:
    """Median-filter the z coordinate over the organized grid (reference
    median_filter.hpp: z only, bounded by max_allowed_movement)."""
    H, W = cloud.height, cloud.width
    if H <= 1:
        raise ValueError("median_filter requires an organized cloud")
    z = cloud.xyz[:, 2].reshape(H, W)
    m = cloud.mask.reshape(H, W)
    r = window // 2
    stacks = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            zz = jnp.roll(jnp.roll(z, dy, 0), dx, 1)
            mm = jnp.roll(jnp.roll(m, dy, 0), dx, 1)
            stacks.append(jnp.where(mm, zz, jnp.nan))
    stack = jnp.stack(stacks, axis=-1)
    med = jnp.nanmedian(stack, axis=-1)
    med = jnp.where(jnp.isfinite(med), med, z)
    dz = jnp.clip(med - z, -max_movement, max_movement)
    new_z = jnp.where(m, z + dz, z)
    xyz = cloud.xyz.at[:, 2].set(new_z.reshape(-1))
    return cloud.with_xyz(jnp.where(cloud.mask[:, None], xyz, 0.0))
