"""Octree ray traversal + approximate nearest neighbor.

Capability match for the reference octree search extras (octree/include/
pcl/octree/octree_search.h):

- ``ray_intersected_voxels`` (getIntersectedVoxelCenters/Indices at
  octree_search.h:221): voxels along a ray. The reference walks the tree
  recursively (revelles parametric traversal); the TPU re-design samples
  the ray uniformly at half-leaf steps inside the tree's bounding box and
  keeps the distinct occupied voxels — fixed-shape, fully batched over
  many rays at once.
- ``approx_nearest_search`` (approxNearestSearch at octree_search.h:135):
  the nearest point stored in the query's own leaf (or the nearest
  occupied voxel along a small neighborhood probe) — one sorted-key
  binary search, no exact kNN cost.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.octree.linear import LinearOctree, morton_encode, _PAD_KEY


@partial(jax.jit, static_argnames=("max_steps",))
def ray_intersected_voxels(
    tree: LinearOctree,
    origin: jax.Array,       # [R,3]
    direction: jax.Array,    # [R,3] (normalized)
    max_range: float,
    max_steps: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """[R, max_steps] morton keys of occupied voxels along each ray
    (deduplicated consecutive hits; -1 = none) and [R, max_steps] bool."""
    res = tree.resolution
    t = (jnp.arange(max_steps, dtype=jnp.float32) + 0.5) * (res * 0.5)
    t = jnp.minimum(t, max_range)
    pts = origin[:, None, :] + direction[:, None, :] * t[None, :, None]  # [R,S,3]
    side = (1 << tree.depth) - 1
    cell_f = (pts - tree.origin[None, None, :]) / res
    inside = jnp.all((cell_f >= 0) & (cell_f <= side + 1), axis=-1)
    cell = jnp.clip(cell_f.astype(jnp.int32), 0, side)
    keys = morton_encode(cell.reshape(-1, 3)).reshape(pts.shape[:2])
    # steps outside the bbox were clipped onto a boundary cell — neutralize
    # their keys so they neither match occupancy nor shadow the dedupe of
    # the first genuine inside step
    keys = jnp.where(inside, keys, -1)
    # occupancy: binary search into the sorted key array
    pos = jnp.searchsorted(tree.keys, keys.reshape(-1))
    pos = jnp.clip(pos, 0, tree.keys.shape[0] - 1)
    hit = (tree.keys[pos] == keys.reshape(-1)) & tree.mask[pos]
    hit = hit.reshape(keys.shape) & inside
    # dedupe consecutive repeats of the same voxel
    new = keys != jnp.roll(keys, 1, axis=1)
    new = new.at[:, 0].set(True)
    valid = hit & new
    return jnp.where(valid, keys, -1), valid


@jax.jit
def approx_nearest_search(
    tree: LinearOctree,
    xyz_sorted: jax.Array,   # [N,3] the cloud gathered into tree order
    queries: jax.Array,      # [Q,3]
) -> Tuple[jax.Array, jax.Array]:
    """Approximate 1-NN: the closest point within the query's leaf voxel
    (falling back to the nearest point in key order when the leaf is
    empty — the same 'approximate' contract as the reference). Returns
    (index into tree order [Q], sqdist [Q])."""
    side = (1 << tree.depth) - 1
    cell = jnp.clip(
        ((queries - tree.origin[None, :]) / tree.resolution).astype(jnp.int32),
        0,
        side,
    )
    keys = morton_encode(cell)
    start = jnp.searchsorted(tree.keys, keys)
    n = tree.keys.shape[0]
    # probe a small window of sorted slots around the hit (leaf members are
    # contiguous; neighbors in key order are spatial neighbors with high
    # probability)
    offs = jnp.arange(-4, 12)
    cand = jnp.clip(start[:, None] + offs[None, :], 0, n - 1)
    cpts = xyz_sorted[cand]
    d2 = jnp.sum((cpts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(tree.mask[cand], d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)
    idx = jnp.take_along_axis(cand, j[:, None], axis=1)[:, 0]
    best = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
    return idx, best
