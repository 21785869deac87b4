"""Octree leaf-container variants: adjacency graph + occupancy grid.

Reference counterparts:
- OctreePointCloudAdjacency (octree/include/pcl/octree/
  octree_pointcloud_adjacency.h) — leaves store links to their 26-connected
  occupied neighbors; the seed structure for supervoxels. Here: the leaf
  set is the sorted unique morton keys of a LinearOctree; the adjacency is
  a padded [L, 26] neighbor-leaf index table computed by 26 batched
  searchsorted probes — no pointers, one gather per direction.
- OctreePointCloudOccupancy (octree_pointcloud_occupancy.h) — pure
  voxel-occupancy set with setOccupiedVoxelsAtPointsFromCloud semantics.
  Here: a key-set with membership queries and occupancy updates by
  set-union (merge + unique).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.octree.linear import (
    LinearOctree, morton_encode, morton_decode, _key_of_points,
)

_PAD_KEY = jnp.int32(2**31 - 1)


def leaf_keys(tree: LinearOctree) -> Tuple[jax.Array, jax.Array]:
    """Compacted sorted unique leaf keys ([N] padded with _PAD_KEY) and the
    number of leaves."""
    n = tree.keys.shape[0]
    first = ((tree.keys != jnp.roll(tree.keys, 1)) |
             (jnp.arange(n) == 0)) & tree.mask
    n_leaves = jnp.sum(first.astype(jnp.int32))
    # stable compaction of the first-occurrence keys to the front
    order = jnp.argsort(~first)         # firsts (False<True) keep order
    keys = jnp.where(jnp.arange(n) < n_leaves, tree.keys[order], _PAD_KEY)
    return keys, n_leaves


@jax.jit
def adjacency(tree: LinearOctree) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """26-neighborhood leaf adjacency.

    Returns (keys [L] sorted unique leaf keys (padded), nbr [L,26] int32
    leaf indices (-1 where the neighbor voxel is unoccupied/out of range),
    n_leaves). The supervoxel flood-fill substrate
    (octree_pointcloud_adjacency.h computeNeighbors)."""
    keys, n_leaves = leaf_keys(tree)
    L = keys.shape[0]
    cells = morton_decode(keys)                       # [L,3]
    offs = jnp.asarray(
        [(dx, dy, dz)
         for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
         if (dx, dy, dz) != (0, 0, 0)], jnp.int32)    # [26,3]
    side = jnp.int32(1 << tree.depth)
    ncells = cells[:, None, :] + offs[None, :, :]     # [L,26,3]
    inb = jnp.all((ncells >= 0) & (ncells < side), axis=-1)
    nkeys = morton_encode(jnp.clip(ncells, 0, side - 1))
    pos = jnp.searchsorted(keys, nkeys.reshape(-1)).reshape(L, 26)
    pos = jnp.clip(pos, 0, L - 1)
    hit = (keys[pos] == nkeys) & inb & (nkeys != _PAD_KEY)
    valid_row = (jnp.arange(L) < n_leaves)[:, None]
    nbr = jnp.where(hit & valid_row, pos, -1)
    return keys, nbr.astype(jnp.int32), n_leaves


class OccupancyGrid(NamedTuple):
    """Sorted unique occupied-voxel key set (padded with _PAD_KEY)."""
    keys: jax.Array          # [cap] int32 sorted, padding last
    n_occupied: jax.Array    # int32
    origin: jax.Array        # [3]
    resolution: jax.Array    # scalar
    depth: int


def occupancy_from_tree(tree: LinearOctree) -> OccupancyGrid:
    keys, n = leaf_keys(tree)
    return OccupancyGrid(keys=keys, n_occupied=n, origin=tree.origin,
                         resolution=tree.resolution, depth=tree.depth)


@jax.jit
def is_occupied(grid: OccupancyGrid, pts: jax.Array) -> jax.Array:
    """Membership query (octree_pointcloud_occupancy.h isVoxelOccupiedAtPoint)."""
    cell = jnp.clip(
        jnp.floor((pts - grid.origin) / grid.resolution).astype(jnp.int32),
        0, (1 << grid.depth) - 1)
    q = morton_encode(cell)
    pos = jnp.clip(jnp.searchsorted(grid.keys, q), 0, grid.keys.shape[0] - 1)
    return grid.keys[pos] == q


@jax.jit
def set_occupied(grid: OccupancyGrid, pts: jax.Array,
                 mask: jax.Array) -> OccupancyGrid:
    """Union new points' voxels into the set (reference
    setOccupiedVoxelsAtPointsFromCloud). The key array grows by the insert
    batch size — a static output shape under jit."""
    cell = jnp.clip(
        jnp.floor((pts - grid.origin) / grid.resolution).astype(jnp.int32),
        0, (1 << grid.depth) - 1)
    new = jnp.where(mask, morton_encode(cell), _PAD_KEY)
    merged = jnp.sort(jnp.concatenate([grid.keys, new]))
    uniq = (merged != jnp.roll(merged, 1)) | \
           (jnp.arange(merged.shape[0]) == 0)
    uniq = uniq & (merged != _PAD_KEY)
    n = jnp.sum(uniq.astype(jnp.int32))
    order = jnp.argsort(~uniq)
    cap = merged.shape[0]
    keys = jnp.where(jnp.arange(cap) < n, merged[order], _PAD_KEY)
    return grid._replace(keys=keys, n_occupied=n)
