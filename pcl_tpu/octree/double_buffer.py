"""Double-buffered octree — change detection + differential encoding.

Capability match for pcl::octree::Octree2BufBase (reference:
octree/include/pcl/octree/octree2buf_base.h) and
OctreePointCloudChangeDetector (octree_pointcloud_changedetector.h): two
tree buffers share one structure, `switchBuffers` flips which is current,
new leaves are those present in the current buffer only, and the
serialized stream can be XOR-differential against the previous buffer (the
basis of the octree stream compression's differential mode).

TPU re-design: a buffer is a sorted morton key set (octree.linear), so
- new/removed leaves = sorted-set differences via searchsorted (one fused
  batched op, no pointer tree walk);
- the differential encoding works on the per-level occupancy bitmaps the
  reference XORs node-by-node: bitmaps are uint8 arrays here, XOR is one
  vectorized op.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.octree.linear import LinearOctree, build, _PAD_KEY


def _unique_keys(tree: LinearOctree) -> jax.Array:
    """SORTED leaf keys, duplicates replaced by trailing _PAD_KEY (fixed
    shape; the re-sort keeps the array monotonic for searchsorted)."""
    first = (tree.keys != jnp.roll(tree.keys, 1)) | \
            (jnp.arange(tree.keys.shape[0]) == 0)
    return jnp.sort(jnp.where(first & tree.mask, tree.keys, _PAD_KEY))


def _member_of(sorted_keys: jax.Array, queries: jax.Array) -> jax.Array:
    """queries in sorted_keys (PAD entries never match)."""
    pos = jnp.searchsorted(sorted_keys, queries)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    return (sorted_keys[pos] == queries) & (queries != _PAD_KEY)


@dataclasses.dataclass
class DoubleBufferedOctree:
    """Two-buffer octree over successive frames of one stream.

    Usage (mirrors Octree2BufBase / OctreePointCloudChangeDetector):
        dbo = DoubleBufferedOctree(resolution=0.05)
        dbo.set_cloud(xyz0, mask0)      # buffer A
        dbo.switch_buffers()            # A -> previous, B current
        dbo.set_cloud(xyz1, mask1)      # buffer B
        new = dbo.new_leaf_keys()       # leaves only in the current buffer
    """

    resolution: float
    depth: int = 10
    origin: Optional[np.ndarray] = None
    _bufs: Tuple[Optional[LinearOctree], Optional[LinearOctree]] = (None, None)
    _current: int = 0

    def set_cloud(self, xyz, mask) -> None:
        origin = None if self.origin is None else jnp.asarray(self.origin)
        tree = build(jnp.asarray(xyz), jnp.asarray(mask),
                     self.resolution, origin=origin, depth=self.depth)
        if self.origin is None:
            # pin the shared grid frame at the first buffer (the reference's
            # shared tree structure implies one coordinate frame)
            self.origin = np.asarray(tree.origin)
        bufs = list(self._bufs)
        bufs[self._current] = tree
        self._bufs = tuple(bufs)

    def switch_buffers(self) -> None:
        """Flip current/previous (reference switchBuffers)."""
        self._current = 1 - self._current

    @property
    def current(self) -> Optional[LinearOctree]:
        return self._bufs[self._current]

    @property
    def previous(self) -> Optional[LinearOctree]:
        return self._bufs[1 - self._current]

    def new_leaf_keys(self) -> np.ndarray:
        """Morton keys of leaves occupied in the CURRENT buffer only
        (reference serializeNewLeafs / getPointIndicesFromNewVoxels)."""
        cur, prev = self.current, self.previous
        if cur is None:
            return np.zeros((0,), np.int32)
        cu = _unique_keys(cur)
        if prev is None:
            sel = cu != _PAD_KEY
        else:
            sel = (cu != _PAD_KEY) & ~_member_of(_unique_keys(prev), cu)
        out = np.asarray(cu)[np.asarray(sel)]
        return out

    def removed_leaf_keys(self) -> np.ndarray:
        """Leaves occupied in the previous buffer only."""
        cur, prev = self.current, self.previous
        if prev is None:
            return np.zeros((0,), np.int32)
        pu = _unique_keys(prev)
        if cur is None:
            sel = pu != _PAD_KEY
        else:
            sel = (pu != _PAD_KEY) & ~_member_of(_unique_keys(cur), pu)
        return np.asarray(pu)[np.asarray(sel)]

    def new_point_indices(self) -> np.ndarray:
        """Original-cloud indices of the current buffer's points living in
        new voxels — the OctreePointCloudChangeDetector result."""
        cur = self.current
        if cur is None:
            return np.zeros((0,), np.int32)
        new_keys = jnp.asarray(self.new_leaf_keys())
        if new_keys.shape[0] == 0:
            return np.zeros((0,), np.int32)
        hit = _member_of(jnp.sort(new_keys), cur.keys) & cur.mask
        return np.asarray(cur.order)[np.asarray(hit)]

    # -- differential (XOR) occupancy serialization -----------------------

    def occupancy_bitmap(self, which: str = "current") -> np.ndarray:
        """Dense leaf-occupancy bitmap [2^(3*depth) / 8] uint8 at a REDUCED
        serialization depth (min(depth, 7) to bound memory) — the byte
        stream the reference's binary tree serialization produces,
        flattened."""
        tree = self.current if which == "current" else self.previous
        d = min(self.depth, 7)
        n_bits = 1 << (3 * d)
        out = np.zeros(n_bits, np.uint8)
        if tree is not None:
            keys = np.asarray(_unique_keys(tree))
            keys = keys[keys != int(_PAD_KEY)]
            coarse = keys >> (3 * (self.depth - d))
            out[np.unique(coarse)] = 1
        return np.packbits(out)

    def xor_serialize(self) -> np.ndarray:
        """Differential occupancy stream: current XOR previous (reference
        Octree2BufBase::serializeTree with doXOREncoding=true) — sparse
        when frames are similar, the compression win of the double buffer."""
        return self.occupancy_bitmap("current") ^ self.occupancy_bitmap("previous")

    @staticmethod
    def xor_apply(prev_bitmap: np.ndarray, diff: np.ndarray) -> np.ndarray:
        """Reconstruct the current occupancy from previous + diff."""
        return prev_bitmap ^ diff
