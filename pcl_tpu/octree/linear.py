"""Linear morton-order octree.

Key layout: depth d <= 10; per-axis cell indices in [0, 2^d); key =
interleave(x, y, z) — 3d bits in an int32 (d <= 10). Keys of VALID points
sort ascending; padding sorts to the end (key = 2^31 - 1).

Equivalents (reference files):
- OctreePointCloud / leaf containers  -> build() + segment reductions
  (octree/include/pcl/octree/octree_pointcloud.h)
- OctreePointCloudSearch::voxelSearch -> voxel_search
  (octree_search.h:57 — all points in the query's voxel)
- isVoxelOccupiedAtPoint              -> is_voxel_occupied
- OctreePointCloudChangeDetector      -> change_detection (double-buffered
  Octree2BufBase diff, octree2buf_base.h)
- getOccupiedVoxelCenters             -> leaf_centroids
- boxSearch                           -> box_search
- fixed-depth iterators               -> at_depth
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_PAD_KEY = jnp.int32(2**31 - 1)


def _spread3(v: jax.Array) -> jax.Array:
    """Spread 10 bits to every 3rd bit (part of 3D morton encoding)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def _compact3(v: jax.Array) -> jax.Array:
    v = v & 0x9249249
    v = (v | (v >> 2)) & 0x30C30C3
    v = (v | (v >> 4)) & 0x300F00F
    v = (v | (v >> 8)) & 0x30000FF
    v = (v | (v >> 16)) & 0x3FF
    return v


def morton_encode(cell: jax.Array) -> jax.Array:
    """[..., 3] int cell coords -> [...] int32 morton keys (bit-interleaved
    OctreeKey, reference octree_key.h)."""
    return (_spread3(cell[..., 0])
            | (_spread3(cell[..., 1]) << 1)
            | (_spread3(cell[..., 2]) << 2))


def morton_decode(key: jax.Array) -> jax.Array:
    return jnp.stack(
        [_compact3(key), _compact3(key >> 1), _compact3(key >> 2)], axis=-1
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LinearOctree:
    origin: jax.Array        # [3] f32 lower corner
    resolution: jax.Array    # scalar f32 leaf size
    depth: int               # static, <= 10
    keys: jax.Array          # [N] int32 morton keys, SORTED (padding last)
    order: jax.Array         # [N] int32 permutation into the original cloud
    mask: jax.Array          # [N] bool validity in sorted order

    def tree_flatten(self):
        return (self.origin, self.resolution, self.keys, self.order, self.mask), (self.depth,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        origin, resolution, keys, order, mask = children
        return cls(origin, resolution, aux[0], keys, order, mask)

    @property
    def leaf_count(self) -> jax.Array:
        first = (self.keys != jnp.roll(self.keys, 1)) | \
                (jnp.arange(self.keys.shape[0]) == 0)
        return jnp.sum((first & self.mask).astype(jnp.int32))


@partial(jax.jit, static_argnames=("depth",))
def build(
    xyz: jax.Array,
    mask: jax.Array,
    resolution,
    origin: Optional[jax.Array] = None,
    depth: int = 10,
) -> LinearOctree:
    """Sort points into morton order at leaf resolution."""
    resolution = jnp.asarray(resolution, jnp.float32)
    if origin is None:
        origin = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0)
        origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    cell = jnp.clip(
        jnp.floor((xyz - origin) / resolution).astype(jnp.int32),
        0, (1 << depth) - 1,
    )
    keys = morton_encode(cell)
    keys = jnp.where(mask, keys, _PAD_KEY)
    order = jnp.argsort(keys).astype(jnp.int32)
    return LinearOctree(
        origin=origin,
        resolution=resolution,
        depth=depth,
        keys=keys[order],
        order=order,
        mask=mask[order],
    )


def _key_of_points(tree: LinearOctree, pts: jax.Array) -> jax.Array:
    cell = jnp.clip(
        jnp.floor((pts - tree.origin) / tree.resolution).astype(jnp.int32),
        0, (1 << tree.depth) - 1,
    )
    return morton_encode(cell)


@jax.jit
def is_voxel_occupied(tree: LinearOctree, pts: jax.Array) -> jax.Array:
    """[Q,3] -> [Q] bool: does the leaf voxel containing each point hold any
    cloud point (reference isVoxelOccupiedAtPoint)."""
    q = _key_of_points(tree, pts)
    pos = jnp.searchsorted(tree.keys, q)
    pos = jnp.clip(pos, 0, tree.keys.shape[0] - 1)
    return (tree.keys[pos] == q) & tree.mask[pos]


@partial(jax.jit, static_argnames=("cap",))
def voxel_search(
    tree: LinearOctree, pts: jax.Array, cap: int = 32
) -> Tuple[jax.Array, jax.Array]:
    """Indices of all cloud points in each query's leaf voxel
    (reference OctreePointCloudSearch::voxelSearch). Returns
    (idx [Q,cap] int32, valid [Q,cap])."""
    q = _key_of_points(tree, pts)
    lo = jnp.searchsorted(tree.keys, q, side="left")
    hi = jnp.searchsorted(tree.keys, q, side="right")
    lane = jnp.arange(cap, dtype=jnp.int32)
    pos = lo[:, None] + lane[None, :]
    valid = pos < hi[:, None]
    pos = jnp.clip(pos, 0, tree.keys.shape[0] - 1)
    return tree.order[pos], valid & tree.mask[pos]


@jax.jit
def leaf_centroids(tree: LinearOctree, xyz: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-leaf centroids + counts, compacted to the front
    (reference OctreePointCloudVoxelCentroid / getOccupiedVoxelCenters).
    ``xyz`` is the ORIGINAL (unsorted) cloud array the tree was built from.
    Returns (centroids [N,3], counts [N], n_leaves)."""
    n = tree.keys.shape[0]
    first = ((tree.keys != jnp.roll(tree.keys, 1)) |
             (jnp.arange(n) == 0)) & tree.mask
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(tree.mask, seg, n - 1)
    w = tree.mask.astype(jnp.float32)
    pts = xyz[tree.order] * w[:, None]
    sums = jax.ops.segment_sum(pts, seg, num_segments=n)
    cnt = jax.ops.segment_sum(w, seg, num_segments=n)
    n_leaves = jnp.sum(first.astype(jnp.int32))
    lane = jnp.arange(n)
    valid = lane < n_leaves
    centroids = jnp.where(valid[:, None], sums / jnp.maximum(cnt, 1.0)[:, None], 0.0)
    return centroids, jnp.where(valid, cnt, 0.0), n_leaves


@jax.jit
def change_detection(tree_now: LinearOctree, tree_before: LinearOctree) -> jax.Array:
    """Mask (over the ORIGINAL cloud order of ``tree_now``) of points whose
    leaf voxel is NOT occupied in ``tree_before`` (reference
    OctreePointCloudChangeDetector::getPointIndicesFromNewVoxels via the
    double-buffered Octree2BufBase)."""
    pos = jnp.searchsorted(tree_before.keys, tree_now.keys)
    pos = jnp.clip(pos, 0, tree_before.keys.shape[0] - 1)
    present = (tree_before.keys[pos] == tree_now.keys) & tree_before.mask[pos]
    new_sorted = tree_now.mask & ~present
    # scatter back to original order
    out = jnp.zeros(tree_now.keys.shape[0], bool)
    return out.at[tree_now.order].set(new_sorted)


@partial(jax.jit, static_argnames=("cap",))
def box_search(
    tree: LinearOctree, box_min: jax.Array, box_max: jax.Array,
    xyz: jax.Array, cap: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """All points inside an axis-aligned box (reference
    OctreePointCloudSearch::boxSearch). Returns (idx [cap], valid [cap],
    count)."""
    p = xyz[tree.order]
    inside = tree.mask & jnp.all((p >= box_min) & (p <= box_max), axis=-1)
    count = jnp.sum(inside.astype(jnp.int32))
    # compact the first `cap` hits
    rank = jnp.cumsum(inside.astype(jnp.int32)) - 1
    slot = jnp.where(inside & (rank < cap), rank, cap)
    idx = jnp.full((cap + 1,), 0, jnp.int32).at[slot].set(tree.order)[:cap]
    valid = jnp.arange(cap) < jnp.minimum(count, cap)
    return idx, valid, count


@partial(jax.jit, static_argnames=("level",))
def at_depth(tree: LinearOctree, level: int) -> Tuple[jax.Array, jax.Array]:
    """Occupied node keys at a shallower level (fixed-depth iterator,
    reference octree iterators). Returns (keys [N] int32 shifted to the
    level, first_flag [N] marking unique occupied nodes in sorted order)."""
    if not (0 <= level <= tree.depth):
        raise ValueError("level out of range")
    shift = 3 * (tree.depth - level)
    k = jnp.where(tree.mask, tree.keys >> shift, _PAD_KEY)
    first = ((k != jnp.roll(k, 1)) | (jnp.arange(k.shape[0]) == 0)) & tree.mask
    return k, first
