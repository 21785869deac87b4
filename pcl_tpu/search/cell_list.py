"""Dense cell-list index — the production bounded-radius NN path.

The voxel hash grid in ``hashgrid.py`` is CSR-shaped: queries gather 27*cap
individual point rows, and XLA lowers that to millions of tiny random reads
(measured 349 ms for 120k queries on a v5e — slower than brute force). This
index instead scatters the points into a DENSE table ``[buckets, cap, 3]``
once at build time; a query then gathers 27 contiguous (cap, 3) slabs —
an order of magnitude fewer, larger, coalesced reads — and reduces the
27*cap candidates with plain VPU math.

This is the cell-list structure of molecular dynamics, replacing PCL's
kd-tree for the registration hot loop (reference: ICP's per-point
nearestKSearch, registration/impl/correspondence_estimation.hpp:175): ICP
with a finite max correspondence distance r only ever needs "nearest
neighbor within r", which the 3x3x3 neighborhood of an r-sized cell answers
EXACTLY (up to bucket overflow, which is detectable and capped by choosing
``cap`` >= local density).

Build cost: one sort + one scatter over the target — paid once per align(),
amortized over all ICP iterations (the target never moves).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)

# large primes for spatial hashing (shared scheme with hashgrid.py)
_P1, _P2, _P3 = 73856093, 19349669, 83492791

_OFFSETS = jnp.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)  # [27, 3]


def _cell_coords(xyz: jax.Array, cell_size) -> jax.Array:
    return jnp.floor(xyz / cell_size).astype(jnp.int32)


def _hash(coords: jax.Array, table_size: int) -> jax.Array:
    h = (coords[..., 0] * _P1) ^ (coords[..., 1] * _P2) ^ (coords[..., 2] * _P3)
    return jnp.abs(h) % jnp.int32(table_size)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CellTable:
    cell_size: jax.Array     # scalar f32
    table_size: int          # static
    cap: int                 # static points per bucket
    xyz: jax.Array           # [table_size + 1, cap, 3]; empty slots at _BIG
    idx: jax.Array           # [table_size + 1, cap] original indices (or 0)
    count: jax.Array         # [table_size + 1] true per-bucket population
                             # (may exceed cap -> truncation detectable)

    def tree_flatten(self):
        return (self.cell_size, self.xyz, self.idx, self.count), (self.table_size, self.cap)

    @classmethod
    def tree_unflatten(cls, aux, children):
        cell_size, xyz, idx, count = children
        return cls(cell_size, aux[0], aux[1], xyz, idx, count)


@partial(jax.jit, static_argnames=("table_size", "cap"))
def build(
    xyz: jax.Array,
    mask: jax.Array,
    cell_size,
    table_size: int = 1 << 17,
    cap: int = 16,
) -> CellTable:
    """Scatter points into the dense bucket table (one sort + one scatter)."""
    n = xyz.shape[0]
    cell_size = jnp.asarray(cell_size, jnp.float32)
    h = _hash(_cell_coords(xyz, cell_size), table_size)
    h = jnp.where(mask, h, jnp.int32(table_size))          # invalid -> overflow row
    order = jnp.argsort(h)
    hs = h[order]
    start = jnp.searchsorted(
        hs, jnp.arange(table_size + 2, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    count = start[1:] - start[:-1]                          # [table_size + 1]
    rank = jnp.arange(n, dtype=jnp.int32) - start[hs]       # position in bucket
    keep = rank < cap
    # overflowing ranks land in the overflow row's slot 0 (harmlessly
    # overwritten; the overflow row is never a real bucket)
    flat = jnp.where(keep, hs * cap + rank, jnp.int32(table_size * cap))
    tbl_xyz = jnp.full(((table_size + 1) * cap, 3), _BIG, jnp.float32)
    tbl_idx = jnp.zeros(((table_size + 1) * cap,), jnp.int32)
    src_xyz = jnp.where((mask[order] & keep)[:, None], xyz[order], _BIG)
    tbl_xyz = tbl_xyz.at[flat].set(src_xyz, mode="drop")
    tbl_idx = tbl_idx.at[flat].set(order.astype(jnp.int32), mode="drop")
    return CellTable(
        cell_size=cell_size,
        table_size=table_size,
        cap=cap,
        xyz=tbl_xyz.reshape(table_size + 1, cap, 3),
        idx=tbl_idx.reshape(table_size + 1, cap),
        count=count,
    )


def _neighbor_buckets(table: CellTable, queries: jax.Array, r=None):
    """Bucket ids of the cell neighborhood per query.

    Two schemes, picked by geometry:
    - 27-cell (cell_size >= r): the classic 3x3x3 block around the query's
      cell;
    - 8-cell (cell_size >= 2r, requires ``r``): the ball B(q, r) spans at
      most 2 cells per axis, so only the 2x2x2 block anchored at
      floor((q - r)/cell) is needed — 3.4x fewer slab gathers, the dominant
      cost of a query (measured: the [Q,27,cap,3] gather is ~70% of query
      time at 120k points).
    """
    if r is None:
        qc = _cell_coords(queries, table.cell_size)
        return _hash(qc[:, None, :] + _OFFSETS[None, :, :], table.table_size)
    base = jnp.floor((queries - jnp.asarray(r, jnp.float32)) / table.cell_size
                     ).astype(jnp.int32)
    offs = jnp.array(
        [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32
    )
    return _hash(base[:, None, :] + offs[None, :, :], table.table_size)


def _candidates(table: CellTable, queries: jax.Array):
    """Gather the 27-cell slab neighborhood: returns (cand_xyz [Q,27,cap,3],
    cand_idx [Q,27,cap], truncated [Q])."""
    buckets = _neighbor_buckets(table, queries)
    cand_xyz = table.xyz[buckets]                           # [Q,27,cap,3] slab gather
    cand_idx = table.idx[buckets]                           # [Q,27,cap]
    truncated = jnp.any(table.count[buckets] > table.cap, axis=-1)
    return cand_xyz, cand_idx, truncated


@partial(jax.jit, static_argnames=("compact",))
def nn1_radius(
    table: CellTable,
    queries: jax.Array,
    r,
    compact: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest neighbor within radius ``r``.

    Returns (idx [Q] int32, sqdist [Q] — +inf when no neighbor in r,
    truncated [Q] bool). Exact when not truncated: any point within r lies
    in the visited neighborhood; hash collisions only add candidates, which
    the radius gate removes.

    ``compact`` uses the 8-cell scheme, valid when cell_size >= 2r — ICP
    builds its table that way. The winner's original index is recovered
    AFTER the argmin from (bucket, lane), so only coordinates stream
    through HBM during the reduction.
    """
    buckets = _neighbor_buckets(table, queries, r if compact else None)
    cand_xyz = table.xyz[buckets]                           # [Q,O,cap,3]
    truncated = jnp.any(table.count[buckets] > table.cap, axis=-1)
    Q = queries.shape[0]
    d = cand_xyz - queries[:, None, None, :]
    d2 = jnp.sum(d * d, axis=-1).reshape(Q, -1)             # [Q, O*cap]
    r2 = jnp.asarray(r, jnp.float32) ** 2
    d2 = jnp.where(d2 <= r2, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    # index recovery: flat winner -> (bucket, lane) -> original index
    win_bucket = jnp.take_along_axis(
        buckets, (best // table.cap)[:, None], axis=-1
    )[:, 0]
    win_lane = best % table.cap
    best_idx = table.idx[win_bucket, win_lane]
    return best_idx, best_d2, truncated


@partial(jax.jit, static_argnames=("k",))
def knn_radius(
    table: CellTable,
    queries: jax.Array,
    k: int,
    r=None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """k nearest neighbors within the 27-cell neighborhood (exact for the
    k-th neighbor within cell_size when not truncated; ``r`` optionally
    tightens the radius). Returns (idx [Q,k], sqdist [Q,k], valid [Q,k],
    truncated [Q])."""
    cand_xyz, cand_idx, truncated = _candidates(table, queries)
    Q = queries.shape[0]
    d = cand_xyz - queries[:, None, None, :]
    d2 = jnp.sum(d * d, axis=-1).reshape(Q, -1)
    if r is not None:
        r2 = jnp.asarray(r, jnp.float32) ** 2
        d2 = jnp.where(d2 <= r2, d2, jnp.inf)
    # duplicate buckets among the 27 offsets (hash collisions) would return
    # the same point twice in a k>1 list; mask duplicates by bucket id
    qc = _cell_coords(queries, table.cell_size)
    buckets = _hash(qc[:, None, :] + _OFFSETS[None, :, :], table.table_size)
    dup = jnp.zeros(buckets.shape, bool)
    for i in range(1, 27):
        dup = dup.at[:, i].set((buckets[:, :i] == buckets[:, i : i + 1]).any(axis=1))
    d2 = jnp.where(
        jnp.repeat(dup, table.cap, axis=-1), jnp.inf, d2
    )
    neg, which = jax.lax.top_k(-d2, k)
    dd = -neg
    idx = jnp.take_along_axis(cand_idx.reshape(Q, -1), which, axis=-1)
    return idx, dd, jnp.isfinite(dd), truncated


@partial(jax.jit, static_argnames=("cap_out",))
def radius_search(
    table: CellTable,
    queries: jax.Array,
    r,
    cap_out: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """All neighbors within r (up to cap_out nearest). Returns
    (idx [Q,cap_out], sqdist, valid, count [Q], truncated [Q])."""
    idx, dd, valid, truncated = knn_radius(table, queries, cap_out, r)
    # count distinct in-radius candidates (duplicates already masked)
    cand_xyz, _, _ = _candidates(table, queries)
    Q = queries.shape[0]
    d = cand_xyz - queries[:, None, None, :]
    d2 = jnp.sum(d * d, axis=-1).reshape(Q, -1)
    r2 = jnp.asarray(r, jnp.float32) ** 2
    qc = _cell_coords(queries, table.cell_size)
    buckets = _hash(qc[:, None, :] + _OFFSETS[None, :, :], table.table_size)
    dup = jnp.zeros(buckets.shape, bool)
    for i in range(1, 27):
        dup = dup.at[:, i].set((buckets[:, :i] == buckets[:, i : i + 1]).any(axis=1))
    inside = (d2 <= r2) & ~jnp.repeat(dup, table.cap, axis=-1)
    count = jnp.sum(inside, axis=-1).astype(jnp.int32)
    return idx, dd, valid, count, truncated
