"""Voxel hash grid — the batched, tree-free spatial index.

TPU-native replacement for PCL's FLANN k-d tree / octree search backends
(reference: kdtree/include/pcl/kdtree/kdtree_flann.h:132, octree/include/pcl/
octree/octree_search.h:57). Pointer-chasing trees defeat XLA; instead:

build: quantize points to integer cells, hash each cell into a power-of-two
table, sort points by bucket id (the VoxelGrid spreadsort idea, reference
filters/impl/voxel_grid.hpp:725, generalized to a search structure), record
per-bucket [start, end) ranges via searchsorted.

query: a point's neighbors within radius <= cell_size live in its 3x3x3 cell
neighborhood; gather a capped slice from each of the 27 buckets and reduce
(masked top-k) — fully batched, no data-dependent control flow.

Exactness contract (validated against the brute-force oracle in tests):
- radius(r) is EXACT for r <= cell_size, provided no visited bucket
  overflows ``bucket_cap`` (overflow is detectable: ``truncated`` flag).
- knn is exact whenever the true k-th neighbor lies within cell_size;
  callers needing global exactness use search.api with fallback.

Hash collisions (two cells -> one bucket) only ADD candidates, which the
distance filter removes; duplicate buckets among the 27 offsets are masked
so no candidate is counted twice.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)

# large primes for spatial hashing

_OFFSETS = jnp.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)  # [27, 3]


def _cell_coords(xyz: jax.Array, cell_size) -> jax.Array:
    return jnp.floor(xyz / cell_size).astype(jnp.int32)


def _hash(coords: jax.Array, table_size: int) -> jax.Array:
    # shared scheme with cell_list._hash: prime-multiply XOR + murmur3-style
    # avalanche (the bare abs(...)%2^k variant folds sign-symmetric cells
    # and merged ~10 cells/bucket on centered clouds)
    from pcl_tpu.search.cell_list import _hash as _h
    return _h(coords, table_size)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HashGrid:
    cell_size: jax.Array          # scalar f32
    table_size: int               # static
    sorted_xyz: jax.Array         # [N, 3] points ordered by bucket
    sorted_idx: jax.Array         # [N] original indices
    sorted_mask: jax.Array        # [N] validity
    bucket_start: jax.Array       # [table_size + 2] CSR offsets over sorted order

    def tree_flatten(self):
        return (
            (self.cell_size, self.sorted_xyz, self.sorted_idx, self.sorted_mask, self.bucket_start),
            (self.table_size,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        cell_size, sorted_xyz, sorted_idx, sorted_mask, bucket_start = children
        return cls(cell_size, aux[0], sorted_xyz, sorted_idx, sorted_mask, bucket_start)


def build(
    xyz: jax.Array,
    mask: jax.Array,
    cell_size,
    table_size: int = 1 << 16,
) -> HashGrid:
    """Build the index. O(N log N) device sort; no host transfers."""
    cell_size = jnp.asarray(cell_size, jnp.float32)
    coords = _cell_coords(xyz, cell_size)
    h = _hash(coords, table_size)
    h = jnp.where(mask, h, jnp.int32(table_size))  # invalid points -> overflow bucket
    order = jnp.argsort(h)
    h_sorted = h[order]
    bucket_start = jnp.searchsorted(
        h_sorted, jnp.arange(table_size + 2, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return HashGrid(
        cell_size=cell_size,
        table_size=table_size,
        sorted_xyz=xyz[order],
        sorted_idx=order.astype(jnp.int32),
        sorted_mask=mask[order],
        bucket_start=bucket_start,
    )


def _gather_candidates(
    grid: HashGrid, queries: jax.Array, bucket_cap: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """For each query, gather up to 27*bucket_cap candidate rows.

    Returns (cand_sorted_pos [Q, 27*cap] positions into the sorted arrays,
    cand_valid [Q, 27*cap], truncated [Q] bool — True if any visited bucket
    held more than ``bucket_cap`` entries, i.e. results may be incomplete).
    """
    qc = _cell_coords(queries, grid.cell_size)                  # [Q,3]
    nb = qc[:, None, :] + _OFFSETS[None, :, :]                  # [Q,27,3]
    buckets = _hash(nb, grid.table_size)                        # [Q,27]
    # mask duplicate buckets among the 27 (hash collisions between offsets)
    dup = jnp.zeros(buckets.shape, bool)
    for i in range(1, 27):
        same = (buckets[:, :i] == buckets[:, i : i + 1]).any(axis=1)
        dup = dup.at[:, i].set(same)
    start = grid.bucket_start[buckets]                           # [Q,27]
    end = grid.bucket_start[buckets + 1]
    size = end - start
    truncated = jnp.any(jnp.where(~dup, size, 0) > bucket_cap, axis=1)
    lane = jnp.arange(bucket_cap, dtype=jnp.int32)               # [cap]
    pos = start[:, :, None] + lane[None, None, :]                # [Q,27,cap]
    valid = (lane[None, None, :] < size[:, :, None]) & (~dup[:, :, None])
    Q = queries.shape[0]
    return pos.reshape(Q, -1), valid.reshape(Q, -1), truncated


@partial(jax.jit, static_argnames=("k", "bucket_cap"))
def knn(
    grid: HashGrid,
    queries: jax.Array,
    k: int,
    bucket_cap: int = 32,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """k-NN within the 3x3x3 cell neighborhood.

    Returns (idx [Q,k] original indices, sqdist [Q,k], valid [Q,k],
    truncated [Q]). Exact iff the true k-th neighbor distance <= cell_size
    and not truncated.
    """
    pos, cvalid, truncated = _gather_candidates(grid, queries, bucket_cap)
    n = grid.sorted_xyz.shape[0]
    posc = jnp.clip(pos, 0, n - 1)
    cxyz = grid.sorted_xyz[posc]                                 # [Q,C,3]
    cmask = grid.sorted_mask[posc] & cvalid
    d = jnp.sum((cxyz - queries[:, None, :]) ** 2, axis=-1)
    d = jnp.where(cmask, d, _INF)
    neg, which = jax.lax.top_k(-d, k)
    dd = -neg
    sel_pos = jnp.take_along_axis(posc, which, axis=1)
    idx = grid.sorted_idx[sel_pos]
    return idx, dd, jnp.isfinite(dd), truncated


@partial(jax.jit, static_argnames=("cap", "bucket_cap"))
def radius(
    grid: HashGrid,
    queries: jax.Array,
    r,
    cap: int,
    bucket_cap: int = 32,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Radius search (requires r <= cell_size for exactness).

    Returns (idx [Q,cap], sqdist [Q,cap], valid [Q,cap], count [Q],
    truncated [Q]). ``count`` is the number of in-radius candidates found
    (exact when not truncated).
    """
    pos, cvalid, truncated = _gather_candidates(grid, queries, bucket_cap)
    n = grid.sorted_xyz.shape[0]
    posc = jnp.clip(pos, 0, n - 1)
    cxyz = grid.sorted_xyz[posc]
    cmask = grid.sorted_mask[posc] & cvalid
    d = jnp.sum((cxyz - queries[:, None, :]) ** 2, axis=-1)
    r2 = jnp.asarray(r, jnp.float32) ** 2
    inside = cmask & (d <= r2)
    count = jnp.sum(inside, axis=1).astype(jnp.int32)
    d = jnp.where(inside, d, _INF)
    neg, which = jax.lax.top_k(-d, cap)
    dd = -neg
    sel_pos = jnp.take_along_axis(posc, which, axis=1)
    idx = grid.sorted_idx[sel_pos]
    return idx, dd, jnp.isfinite(dd), count, truncated
