"""Dense cell-list index — the production bounded-radius NN path.

The voxel hash grid in ``hashgrid.py`` is CSR-shaped: queries gather 27*cap
individual point rows, and XLA lowers that to millions of tiny random reads
(measured 349 ms for 120k queries on a v5e — slower than brute force). This
index instead packs each bucket into ONE CONTIGUOUS ROW of
``cap * 4`` floats — (x, y, z, original-index) per slot — so a query's
neighborhood is a handful of dense row gathers. Row-packing matters: with a
``[buckets, cap, 3]`` layout each gathered slab occupies a padded
(8 sublane, 128 lane) tile, inflating 48 real bytes to 4 KB of HBM traffic
per slab; the packed row is read at its true size (measured 15.5 -> ~3 ms
for the 120k-point ICP correspondence sweep).

This is the cell-list structure of molecular dynamics, replacing PCL's
kd-tree for the registration hot loop (reference: ICP's per-point
nearestKSearch, registration/impl/correspondence_estimation.hpp:175): ICP
with a finite max correspondence distance r only ever needs "nearest
neighbor within r", which a bounded cell neighborhood answers EXACTLY
(up to bucket overflow, which is detectable and capped by choosing
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



_OFFSETS = jnp.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)  # [27, 3]


def _cell_coords(xyz: jax.Array, cell_size) -> jax.Array:
    return jnp.floor(xyz / cell_size).astype(jnp.int32)


def _mix32(v: jax.Array) -> jax.Array:
    """32-bit avalanche (murmur3-finalizer constants)."""
    v = v ^ (v >> 16)
    v = v * jnp.uint32(0x7FEB352D)
    v = v ^ (v >> 15)
    v = v * jnp.uint32(0x846CA68B)
    v = v ^ (v >> 16)
    return v


def _hash(coords: jax.Array, table_size: int) -> jax.Array:
    # per-coordinate avalanche THEN xor. The previous scheme xor-combined
    # prime MULTIPLES of the raw coordinates before one avalanche — the
    # pre-mix itself collides structurally on consecutive-coordinate grids
    # (measured: 5561 merged cells on a 24^3 grid into 2^17 buckets, 7.6x
    # the uniform-hash expectation of 729; the finalizer cannot separate
    # values that collided before it). Mixing each coordinate
    # independently first measures 786 merges — ideal. Salts decorrelate
    # the three axes (plain xor of identical mixes would cancel on
    # permuted coords).
    h = (_mix32(coords[..., 0].astype(jnp.uint32))
         ^ _mix32(coords[..., 1].astype(jnp.uint32) + jnp.uint32(0x9E3779B9))
         ^ _mix32(coords[..., 2].astype(jnp.uint32) + jnp.uint32(0x85EBCA6B)))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CellTable:
    cell_size: jax.Array     # scalar f32
    table_size: int          # static
    cap: int                 # static points per bucket
    data: jax.Array          # [table_size + 1, cap * 4] packed rows:
                             # slot j occupies lanes [4j, 4j+4) = (x, y, z,
                             # original index as f32); empty slots x=_BIG.
                             # OVERFLOWING buckets (population > cap) store
                             # index lanes sign-encoded as -(idx+1), so a
                             # query detects truncation from the rows it
                             # already gathered — a separate count[buckets]
                             # gather measured 7 ms/iter at 120k queries
                             # (scalar gather; dominated the ICP iteration)
    count: jax.Array         # [table_size + 1] true per-bucket population
                             # (may exceed cap -> truncation detectable)
    # dense addressing (dims != None): bucket = row-major linear cell id
    # relative to ``origin``; out-of-grid cells map to the empty overflow
    # row. Collision-FREE (a hash table merges distinct cells' populations
    # birthday-style, inflating truncation) and HBM-LOCAL (neighboring
    # cells occupy neighboring rows, so morton/linear-sorted queries gather
    # nearly sequentially).
    dims: Optional[Tuple[int, int, int]] = None   # static grid shape
    origin: Optional[jax.Array] = None            # [3] f32 grid corner

    def tree_flatten(self):
        return ((self.cell_size, self.data, self.count, self.origin),
                (self.table_size, self.cap, self.dims))

    @classmethod
    def tree_unflatten(cls, aux, children):
        cell_size, data, count, origin = children
        return cls(cell_size, aux[0], aux[1], data, count, aux[2], origin)

    # compatibility views (tests/oracles use these)
    @property
    def xyz(self) -> jax.Array:
        return self.data.reshape(self.table_size + 1, self.cap, 4)[..., :3]

    @property
    def idx(self) -> jax.Array:
        raw = self.data.reshape(self.table_size + 1, self.cap, 4)[..., 3]
        return _decode_idx(raw)


def _dense_id(coords: jax.Array, dims: Tuple[int, int, int]) -> jax.Array:
    """[...,3] int32 grid-relative cell coords -> row-major linear id;
    out-of-grid -> the overflow row (which is empty: no target lives there,
    so queries probing outside the grid correctly find no candidates)."""
    cx, cy, cz = dims
    n_cells = cx * cy * cz
    inb = ((coords[..., 0] >= 0) & (coords[..., 0] < cx)
           & (coords[..., 1] >= 0) & (coords[..., 1] < cy)
           & (coords[..., 2] >= 0) & (coords[..., 2] < cz))
    lin = (coords[..., 0] * cy + coords[..., 1]) * cz + coords[..., 2]
    return jnp.where(inb, lin, jnp.int32(n_cells))


def _bucket_of(table: CellTable, coords: jax.Array) -> jax.Array:
    """Cell coords -> bucket row under the table's addressing scheme.
    For dense tables ``coords`` must already be grid-relative."""
    if table.dims is not None:
        return _dense_id(coords, table.dims)
    return _hash(coords, table.table_size)


def _query_coords(table: CellTable, pts: jax.Array) -> jax.Array:
    """World points -> cell coords in the table's frame."""
    if table.dims is not None:
        return jnp.floor((pts - table.origin) / table.cell_size).astype(jnp.int32)
    return _cell_coords(pts, table.cell_size)


@partial(jax.jit, static_argnames=("table_size", "cap", "dims"))
def build(
    xyz: jax.Array,
    mask: jax.Array,
    cell_size,
    table_size: int = 1 << 17,
    cap: int = 16,
    dims: Optional[Tuple[int, int, int]] = None,
    origin=None,
) -> CellTable:
    """Scatter points into the packed bucket table (one sort + one scatter).

    ``dims`` switches to the dense collision-free grid: ``dims`` static cell
    counts per axis, ``origin`` the grid corner (defaults to the masked
    bbox min minus half a cell). table_size is then dims.prod().

    Note: original indices are stored as f32 — exact for clouds up to 2^24
    points."""
    n = xyz.shape[0]
    cell_size = jnp.asarray(cell_size, jnp.float32)
    if dims is not None:
        if origin is None:
            origin = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0) \
                - 0.5 * cell_size
        origin = jnp.asarray(origin, jnp.float32)
        table_size = int(dims[0] * dims[1] * dims[2])
        cc = jnp.floor((xyz - origin) / cell_size).astype(jnp.int32)
        h = _dense_id(cc, dims)
    else:
        origin = None
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
    slot = jnp.where(keep, hs * cap + rank, jnp.int32(table_size * cap))
    # sign-encode bucket overflow into the index lane: every slot of a
    # bucket whose true population exceeds cap stores -(idx+1), so queries
    # read truncation from the gathered rows at zero extra HBM traffic
    overflowed = count[hs] > cap                            # [n] (build-time)
    idx_f = jnp.where(overflowed,
                      -(jnp.float32(1.0) + order.astype(jnp.float32)),
                      order.astype(jnp.float32))
    # entries that don't land in a real slot (rank >= cap, or masked-out
    # points) all collapse onto the overflow row's slot 0 — force their idx
    # lane non-negative so probing the overflow row (out-of-grid queries)
    # doesn't read a stale sign bit as truncation
    idx_f = jnp.where(mask[order] & keep, idx_f, 0.0)
    rows = jnp.concatenate([
        jnp.where((mask[order] & keep)[:, None], xyz[order], _BIG),
        idx_f[:, None],
    ], axis=1)                                              # [n, 4]
    # FLAT 1-D scatter: a [(ts+1)*cap, 4] intermediate pads its 4 lanes to
    # 128 — 32x transient HBM (17 GB at cap=256, OOMing the radius-outlier
    # self-tuning path); the 1-D layout is exact-sized
    if (table_size + 1) * cap * 4 >= 2**31:
        raise ValueError(
            f"cell table too large: (table_size+1)*cap*4 = "
            f"{(table_size + 1) * cap * 4} overflows the int32 flat scatter "
            f"index (table_size={table_size}, cap={cap}); shrink dims or cap")
    tbl = jnp.full(((table_size + 1) * cap * 4,), _BIG, jnp.float32)
    flat_idx = (slot[:, None] * 4
                + jnp.arange(4, dtype=slot.dtype)[None, :]).reshape(-1)
    tbl = tbl.at[flat_idx].set(rows.reshape(-1), mode="drop")
    return CellTable(
        cell_size=cell_size,
        table_size=table_size,
        cap=cap,
        data=tbl.reshape(table_size + 1, cap * 4),
        count=count,
        dims=dims,
        origin=origin,
    )


def _neighbor_buckets(table: CellTable, queries: jax.Array, r=None):
    """Bucket ids of the cell neighborhood per query.

    Two schemes, picked by geometry:
    - 27-cell (cell_size >= r): the classic 3x3x3 block around the query's
      cell;
    - 8-cell (cell_size >= 2r, requires ``r``): the ball B(q, r) spans at
      most 2 cells per axis, so only the 2x2x2 block anchored at
      floor((q - r)/cell) is needed — 3.4x fewer row gathers.
    """
    if r is None:
        qc = _query_coords(table, queries)
        return _bucket_of(table, qc[:, None, :] + _OFFSETS[None, :, :])
    base = jnp.floor(
        (queries - jnp.asarray(r, jnp.float32)
         - (table.origin if table.dims is not None else 0.0))
        / table.cell_size
    ).astype(jnp.int32)
    offs = jnp.array(
        [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32
    )
    return _bucket_of(table, base[:, None, :] + offs[None, :, :])


def _gather_rows(table: CellTable, buckets: jax.Array):
    """[Q,O] bucket ids -> (cand_xyz [Q,O*cap,3], cand_idx [Q,O*cap] f32)."""
    Q = buckets.shape[0]
    rows = table.data[buckets]                            # [Q,O,cap*4] dense rows
    c = rows.reshape(Q, -1, 4)
    return c[..., :3], c[..., 3]


def _packed_sqdist(table: CellTable, buckets: jax.Array, queries: jax.Array):
    """Candidate squared distances WITHOUT unpacking to [...,3].

    A [Q,S,3] candidate tensor tiles its last dim 3 up to 128 lanes on TPU —
    a 42x memory blowup that made the distance math dominate the ICP
    iteration (measured 16 of 20.6 ms at 120k). Instead the packed rows stay
    in lane space: elementwise diff on [Q, S*4], then ONE [S*4, S] matmul on
    the MXU sums each (x,y,z) lane triple into its slot's d^2. The query
    broadcast is ALSO a matmul ([Q,4] @ [4,L]): jnp.tile lowered through a
    (4,128)-tiled broadcast+copy (profiled 11 ms/iter at 1M).

    Returns (d2 [Q,S], cand_idx [Q,S] f32) with S = O * cap.
    """
    Q, O = buckets.shape
    cap = table.cap
    S = O * cap
    L = S * 4
    rows = table.data[buckets].reshape(Q, L)              # [Q, O*cap*4]
    # lane constants (constant-folded): coordinate lanes 4j+k, k<3
    lane = jnp.arange(L, dtype=jnp.int32)
    is_coord = (lane % 4 < 3).astype(jnp.float32)         # [L]
    # query broadcast: lane 4j+k holds q_k (k<3), 0 at idx lanes
    T4 = (jnp.arange(4, dtype=jnp.int32)[:, None]
          == (lane % 4)[None, :]).astype(jnp.float32)     # [4, L]
    q4 = jnp.concatenate([queries, jnp.zeros_like(queries[:, :1])], axis=1)
    qb = jnp.dot(q4, T4, preferred_element_type=jnp.float32)  # [Q, L]
    diff = (rows - qb) * is_coord
    # clamp: empty slots carry x=y=z=_BIG; diff^2 would overflow to inf and
    # poison the matmul (0 * inf = NaN). 1e15^2 * 3 = 3e30 stays finite and
    # loses to any real candidate.
    diff = jnp.clip(diff, -1e15, 1e15)
    sq = diff * diff
    # group-sum matmul: G[l, j] = 1 iff lane l belongs to slot j's coords
    G = ((lane[:, None] // 4 == jnp.arange(S, dtype=jnp.int32)[None, :])
         & (lane[:, None] % 4 < 3)).astype(jnp.float32)   # [L, S]
    d2 = jnp.dot(sq, G, preferred_element_type=jnp.float32)  # [Q, S] on MXU
    # empty slots land at ~3e30 after the clamp; restore the inf sentinel so
    # isfinite-based validity keeps working for callers without a radius gate
    d2 = jnp.where(d2 < 1e29, d2, jnp.inf)
    return d2, rows


def _decode_idx(raw: jax.Array) -> jax.Array:
    """Undo the overflow sign-encoding: -(idx+1) -> idx, idx -> idx."""
    return jnp.where(raw < 0, -raw - 1.0, raw).astype(jnp.int32)


def _rows_truncated(rows: jax.Array) -> jax.Array:
    """Per-query truncation flag from the packed rows themselves: any
    gathered slot carrying a sign-encoded index means its bucket overflowed.
    One [L,1] matmul over min(rows, 0): the 0/1 column selects idx lanes
    (their negative parts sum < 0 iff any is negative) — replaces both the
    count[buckets] scalar gather (7 ms/iter at 120k) and a masked [Q,L]
    where+min pass."""
    L = rows.shape[1]
    lane = jnp.arange(L, dtype=jnp.int32)
    sel = ((lane % 4) == 3).astype(jnp.float32)[:, None]   # [L,1]
    t = jnp.dot(jnp.minimum(rows, 0.0), sel,
                preferred_element_type=jnp.float32)
    return t[:, 0] < 0.0


@partial(jax.jit, static_argnames=("compact", "with_dst"))
def nn1_radius(
    table: CellTable,
    queries: jax.Array,
    r,
    compact: bool = False,
    with_dst: bool = False,
):
    """Nearest neighbor within radius ``r``.

    Returns (idx [Q] int32, sqdist [Q] — +inf when no neighbor in r,
    truncated [Q] bool[, winner xyz [Q,3] with ``with_dst``]). Exact when
    not truncated: any point within r lies in the visited neighborhood;
    hash collisions only add candidates, which the radius gate removes.

    ``compact`` uses the 8-cell scheme, valid when cell_size >= 2r — ICP
    builds its table that way.

    Winner extraction is one-hot selection matmuls, not take_along_axis:
    per-element gathers dominated the blocked sweep at 1M (49 ms/iter in
    the profiler trace) and the same lowering applies here.
    """
    buckets = _neighbor_buckets(table, queries, r if compact else None)
    d2, rows = _packed_sqdist(table, buckets, queries)    # [Q, S]
    truncated = _rows_truncated(rows)
    r2 = jnp.asarray(r, jnp.float32) ** 2
    d2 = jnp.where(d2 <= r2, d2, jnp.inf)
    best_d2 = jnp.min(d2, axis=-1)
    S = d2.shape[1]
    L = S * 4
    lane = jnp.arange(L, dtype=jnp.int32)
    eq = d2 == best_d2[:, None]
    # first-match one-hot via min over slot ids: a cheap reduce, where the
    # previous cumsum lowered to an O(S^2) reduce-window (13.2 ms/iter of
    # the 1M ICP trace, the single most expensive op)
    slot_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
    winslot = jnp.min(jnp.where(eq, slot_ids, S), axis=1, keepdims=True)
    sel = (slot_ids == winslot).astype(jnp.float32)
    R4 = (jnp.arange(S, dtype=jnp.int32)[:, None]
          == (lane // 4)[None, :]).astype(jnp.float32)
    K4 = ((lane % 4)[:, None]
          == jnp.arange(4, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    sel4 = jnp.dot(sel, R4, preferred_element_type=jnp.float32)
    win = jnp.dot(sel4 * rows, K4, preferred_element_type=jnp.float32)
    best_idx = _decode_idx(win[:, 3])
    if with_dst:
        return best_idx, best_d2, truncated, win[:, :3]
    return best_idx, best_d2, truncated


def _dedup_mask(table: CellTable, queries: jax.Array, buckets: jax.Array):
    """Mask duplicate buckets among an offset set (hash collisions between
    offsets would duplicate candidates in k>1 lists). The offset->slot
    expansion is a [O, O*cap] 0/1 matmul (jnp.repeat along lanes lowers to
    an expensive relayout)."""
    O = buckets.shape[1]
    cap = table.cap
    dup = jnp.zeros(buckets.shape, bool)
    for i in range(1, O):
        dup = dup.at[:, i].set((buckets[:, :i] == buckets[:, i : i + 1]).any(axis=1))
    Gp = (jnp.arange(O * cap, dtype=jnp.int32)[None, :] // cap
          == jnp.arange(O, dtype=jnp.int32)[:, None]).astype(jnp.float32)
    return jnp.dot(dup.astype(jnp.float32), Gp,
                   preferred_element_type=jnp.float32) > 0.5


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
    truncated [Q]).

    Selection strategy (measured at the bench points, see BASELINE.md):
    power-of-two k uses the per-bucket sort + bitonic merge tree (~3x
    fewer compare-exchange stages than one [Q, S] bitonic sort: 1.9M ->
    2.5M q/s at the 120k/k=16 point); other k falls back to one
    two-operand lax.sort."""
    buckets = _neighbor_buckets(table, queries)
    d2, idxf, truncated = _candidates(table, buckets, queries, r)
    dd, idx = _select_k(d2, idxf, buckets.shape[1], k)
    return idx, dd, jnp.isfinite(dd), truncated


def _candidates(table: CellTable, buckets: jax.Array, queries: jax.Array,
                r=None):
    """Shared candidate prep for knn_radius/radius_search: packed
    distances, idx lanes (one 0/1 matmul), overflow flag, optional radius
    gate, dedup masking. Returns (d2 [Q,S], idxf [Q,S], truncated [Q])."""
    d2, rows = _packed_sqdist(table, buckets, queries)
    S = d2.shape[1]
    L = S * 4
    lane = jnp.arange(L, dtype=jnp.int32)
    Kidx = ((lane[:, None] // 4 == jnp.arange(S, dtype=jnp.int32)[None, :])
            & (lane % 4 == 3)[:, None]).astype(jnp.float32)
    idxf = jnp.dot(rows, Kidx, preferred_element_type=jnp.float32)  # [Q,S]
    # any probed bucket overflowed: sign-encoded idx lanes are negative
    # (empty slots carry +_BIG)
    truncated = jnp.min(idxf, axis=1) < 0.0
    if r is not None:
        r2 = jnp.asarray(r, jnp.float32) ** 2
        d2 = jnp.where(d2 <= r2, d2, jnp.inf)
    d2 = jnp.where(_dedup_mask(table, queries, buckets), jnp.inf, d2)
    return d2, idxf, truncated


def _select_k(d2: jax.Array, idxf: jax.Array, n_groups: int, k: int):
    """Ascending top-k selection: merge tree for power-of-two k (wins at
    the kNN bench points), monolithic two-operand sort otherwise (wins for
    the radius cap-32 full result — measurements in BASELINE.md)."""
    if k & (k - 1) == 0:
        dd, idxs_k = _topk_tournament(d2, idxf, n_groups, k)
        return dd, _decode_idx(idxs_k)
    d2s, idxs = jax.lax.sort((d2, idxf), num_keys=1)
    dd = jax.lax.slice_in_dim(d2s, 0, k, axis=1)
    return dd, _decode_idx(jax.lax.slice_in_dim(idxs, 0, k, axis=1))


def _bitonic_merge_keep_k(da, pa, db, pb):
    """Merge two ASCENDING [..., k] lists, keep the k smallest, sorted.

    Classic bitonic merge: concat(a, reverse(b)) is bitonic; after the
    first compare-exchange at distance k the LOWER half holds the k
    smallest (itself bitonic), which log2(k) further stages sort. The
    payload follows every exchange. All ops are reshapes + elementwise
    min/max — no lax.sort."""
    k = da.shape[-1]
    d = jnp.concatenate([da, db[..., ::-1]], axis=-1)
    p = jnp.concatenate([pa, pb[..., ::-1]], axis=-1)
    # stage at distance k: lower half <- elementwise min pairs
    lo_take = d[..., :k] <= d[..., k:]
    dl = jnp.where(lo_take, d[..., :k], d[..., k:])
    pl = jnp.where(lo_take, p[..., :k], p[..., k:])
    s = k // 2
    while s >= 1:
        shape = dl.shape[:-1] + (k // (2 * s), 2, s)
        d2v = dl.reshape(shape)
        p2v = pl.reshape(shape)
        a, b = d2v[..., 0, :], d2v[..., 1, :]
        qa, qb = p2v[..., 0, :], p2v[..., 1, :]
        take = a <= b
        d2v = jnp.stack([jnp.where(take, a, b), jnp.where(take, b, a)],
                        axis=-2)
        p2v = jnp.stack([jnp.where(take, qa, qb), jnp.where(take, qb, qa)],
                        axis=-2)
        dl = d2v.reshape(dl.shape)
        pl = p2v.reshape(pl.shape)
        s //= 2
    return dl, pl


def _topk_tournament(d2: jax.Array, payload: jax.Array, n_groups: int,
                     k: int):
    """Top-k (ascending) of [Q, n_groups*cap] candidates laid out group-
    major, via per-group sorts + a bitonic merge tree — replaces one wide
    [Q, S] lax.sort whose bitonic network costs O(S log^2 S) stages (the
    dominant op of knn/radius_search at fixture scale: 97 of 178 ms at
    307k/S=864). Requires k a power of two; returns (d2 [Q,k],
    payload [Q,k])."""
    Q, S = d2.shape
    cap = S // n_groups
    d3 = d2.reshape(Q, n_groups, cap)
    p3 = payload.reshape(Q, n_groups, cap)
    # per-group ascending sort (narrow: log^2(cap) stages)
    d3, p3 = jax.lax.sort((d3, p3), dimension=2, num_keys=1)
    if cap < k:
        pad = k - cap
        d3 = jnp.pad(d3, ((0, 0), (0, 0), (0, pad)),
                     constant_values=jnp.inf)
        p3 = jnp.pad(p3, ((0, 0), (0, 0), (0, pad)))
    else:
        d3 = d3[..., :k]
        p3 = p3[..., :k]
    # pad the group count to a power of two with empty lists
    G = 1
    while G < n_groups:
        G *= 2
    if G != n_groups:
        d3 = jnp.pad(d3, ((0, 0), (0, G - n_groups), (0, 0)),
                     constant_values=jnp.inf)
        p3 = jnp.pad(p3, ((0, 0), (0, G - n_groups), (0, 0)))
    while G > 1:
        d3, p3 = _bitonic_merge_keep_k(
            d3[:, 0::2], p3[:, 0::2], d3[:, 1::2], p3[:, 1::2])
        G //= 2
    return d3[:, 0], p3[:, 0]


@jax.jit
def radius_count(
    table: CellTable,
    queries: jax.Array,
    r,
) -> Tuple[jax.Array, jax.Array]:
    """Exact in-radius neighbor COUNT (no neighbor lists) — the radius-
    outlier-removal primitive (reference: filters/include/pcl/filters/
    radius_outlier_removal.h counts via kd radiusSearch).

    27-cell scheme (requires cell_size >= r); exact when no probed bucket
    overflows ``cap``. Returns (count [Q] int32, truncated [Q] bool).

    Distances are evaluated PER OFFSET on [Q, cap*4] sections with a small
    [cap*4, cap] group-sum matmul: the monolithic [Q, 27*cap*4] x
    [27*cap*4, 27*cap] form costs 27x more MXU flops for the same answer
    (it computes the zero off-diagonal blocks too) — at cap=128 that is
    20 TFLOP vs 0.74, the difference between ~5 s and ~40 ms on a 209k
    organized cloud (MICROBENCH r02's radius_outlier outlier)."""
    Q = queries.shape[0]
    cap = table.cap
    C4 = cap * 4
    buckets = _neighbor_buckets(table, queries)            # [Q, 27]
    dup = jnp.zeros(buckets.shape, bool)
    for i in range(1, 27):
        dup = dup.at[:, i].set((buckets[:, :i] == buckets[:, i:i + 1]).any(axis=1))
    r2 = jnp.asarray(r, jnp.float32) ** 2
    lane = jnp.arange(C4, dtype=jnp.int32)
    is_coord = (lane % 4 < 3).astype(jnp.float32)[None, :]
    is_idx = ((lane % 4) == 3)[None, :]
    G = ((lane[:, None] // 4 == jnp.arange(cap, dtype=jnp.int32)[None, :])
         & (lane[:, None] % 4 < 3)).astype(jnp.float32)    # [C4, cap]
    q4 = jnp.concatenate([queries, jnp.zeros_like(queries[:, :1])], axis=1)
    qb = jnp.tile(q4, (1, cap))                            # [Q, C4]
    count = jnp.zeros((Q,), jnp.int32)
    trunc = jnp.zeros((Q,), bool)
    for o in range(27):
        rows = table.data[buckets[:, o]]                   # [Q, C4]
        diff = jnp.clip((rows - qb) * is_coord, -1e15, 1e15)
        d2 = jnp.dot(diff * diff, G, preferred_element_type=jnp.float32)
        inside = (d2 <= r2) & ~dup[:, o:o + 1]             # empties ~3e30
        count = count + jnp.sum(inside, axis=1).astype(jnp.int32)
        trunc = trunc | (jnp.min(jnp.where(is_idx, rows, 0.0), axis=1) < 0.0)
    return count, trunc


@partial(jax.jit, static_argnames=("cap_out",))
def radius_search(
    table: CellTable,
    queries: jax.Array,
    r,
    cap_out: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """All neighbors within r (up to cap_out nearest). Returns
    (idx [Q,cap_out], sqdist, valid, count [Q], truncated [Q]).

    Single pass: the shared candidate tensor (_candidates) serves the
    top-cap_out selection AND the in-radius count. Selection uses one
    [Q, S] two-operand lax.sort — at the 307k/cap32 bench point it beats
    the merge tree for the full (idx + d2) result (measured 229 vs 292
    ms/op: the tree's idx payload path forces an expensive [Q, S]
    extraction relayout that the monolithic sort's payload avoids)."""
    buckets = _neighbor_buckets(table, queries)
    d2, idxf, truncated = _candidates(table, buckets, queries, r)
    count = jnp.sum(jnp.isfinite(d2), axis=-1).astype(jnp.int32)
    d2s, idxs = jax.lax.sort((d2, idxf), num_keys=1)
    dd = jax.lax.slice_in_dim(d2s, 0, cap_out, axis=1)
    idx = _decode_idx(jax.lax.slice_in_dim(idxs, 0, cap_out, axis=1))
    return idx, dd, jnp.isfinite(dd), count, truncated


# --------------------------------------------------------------------------
# CSR-compact variant — memory-minimal layout (operand ~= raw data size,
# independent of cap).
#
# Context: on a v5e at 1M points (dense 103^3 grid, cap 12) the padded
# table is 210 MB and row gathers degrade to ~53 ns/row (423 ms/iter for
# the ICP sweep), while the same gather from the 120k table (19 MB) runs
# at ~2.2 ns/row. This layout was built to shrink the gather operand to
# 16 MB/M points; HOWEVER, measured on the same v5e the vmapped
# dynamic-slice fetch lowers to ~7 s/iter — XLA:TPU's gather-of-slices is
# far slower than its row gather, so the PACKED table remains the TPU
# production path at every scale. CSR is kept as the memory-compact
# variant (oracle-tested): useful on CPU, for host-side pipelines, and as
# the substrate for a future Pallas fetch kernel.
#
# - points sorted by bucket id, packed (x, y, z, idx) per row in ONE flat
#   f32 array; bucket b's points live at [start[b], start[b+1]).
# - consecutive buckets are contiguous, so a z-PAIR (b, b+1) — which the
#   8-cell scheme always probes together — is ONE contiguous slice:
#   4 slice-gathers per query instead of 8 row-gathers.
# - slices are overrun-tolerant: reading past a short bucket picks up the
#   NEXT buckets' points, which are real cloud points — extra candidates
#   the radius gate handles, never a correctness issue.
# - per-bucket truncation (population > cap) is sign-encoded in the idx
#   lane exactly like the padded table.


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CSRTable:
    cell_size: jax.Array
    table_size: int                       # static: number of buckets
    cap: int                              # static slice length per bucket
    points: jax.Array                     # [(n + 2*cap) * 4] flat packed rows
    start: jax.Array                      # [table_size + 2] int32 offsets
    dims: Optional[Tuple[int, int, int]] = None
    origin: Optional[jax.Array] = None

    def tree_flatten(self):
        return ((self.cell_size, self.points, self.start, self.origin),
                (self.table_size, self.cap, self.dims))

    @classmethod
    def tree_unflatten(cls, aux, children):
        cell_size, points, start, origin = children
        return cls(cell_size, aux[0], aux[1], points, start, aux[2], origin)


@partial(jax.jit, static_argnames=("table_size", "cap", "dims"))
def build_csr(
    xyz: jax.Array,
    mask: jax.Array,
    cell_size,
    table_size: int = 1 << 17,
    cap: int = 8,
    dims: Optional[Tuple[int, int, int]] = None,
    origin=None,
) -> CSRTable:
    """Sort points into bucket order; one argsort, no scatter."""
    n = xyz.shape[0]
    cell_size = jnp.asarray(cell_size, jnp.float32)
    if dims is not None:
        if origin is None:
            origin = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0) \
                - 0.5 * cell_size
        origin = jnp.asarray(origin, jnp.float32)
        table_size = int(dims[0] * dims[1] * dims[2])
        cc = jnp.floor((xyz - origin) / cell_size).astype(jnp.int32)
        h = _dense_id(cc, dims)
    else:
        origin = None
        h = _hash(_cell_coords(xyz, cell_size), table_size)
    h = jnp.where(mask, h, jnp.int32(table_size))
    order = jnp.argsort(h)
    hs = h[order]
    start = jnp.searchsorted(
        hs, jnp.arange(table_size + 2, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    pop = start[1:] - start[:-1]
    overflowed = pop[hs] > cap                       # per sorted point
    idx_f = jnp.where(overflowed,
                      -(jnp.float32(1.0) + order.astype(jnp.float32)),
                      order.astype(jnp.float32))
    idx_f = jnp.where(mask[order], idx_f, 0.0)
    rows = jnp.concatenate([
        jnp.where(mask[order][:, None], xyz[order], _BIG),
        idx_f[:, None],
    ], axis=1)                                        # [n, 4]
    flat = jnp.concatenate([
        rows.reshape(-1),
        jnp.full((2 * cap * 4,), _BIG, jnp.float32),  # overrun pad
    ])
    return CSRTable(cell_size=cell_size, table_size=table_size, cap=cap,
                    points=flat, start=start, dims=dims, origin=origin)


def _csr_pair_candidates(table: CSRTable, queries: jax.Array, r):
    """Gather the candidate slices per query -> cand [Q, n_slices, W].

    Dense addressing: 4 slices of 2*cap rows — the (bz, bz+1) z-pair is
    CONTIGUOUS in the row-major linear id, so one slice covers both (bz
    clamped into the grid: a clamped slice reads real in-grid cells, which
    are harmless extra candidates, and the out-of-grid cell it replaces is
    empty by construction). Hash addressing: no adjacency to exploit — 8
    slices of cap rows."""
    cap = table.cap
    base = jnp.floor(
        (queries - jnp.asarray(r, jnp.float32)
         - (table.origin if table.dims is not None else 0.0))
        / table.cell_size
    ).astype(jnp.int32)
    if table.dims is not None:
        W = 2 * cap * 4
        cz = table.dims[2]
        # clamp bz so (bz, bz+1) stays a valid contiguous pair; x/y handled
        # per-cell by _dense_id (out-of-grid -> empty overflow region).
        # cz == 1: clip(., 0, -1) would yield -1 and map EVERY z-pair out of
        # grid (ADVICE r2); clamp the upper bound at 0 — the (0, 1) pair then
        # reads cell 0 plus the next x/y row, harmless extra candidates.
        base = base.at[:, 2].set(jnp.clip(base[:, 2], 0, max(cz - 2, 0)))
        offs = jnp.array([(0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, 0)],
                         jnp.int32)
        cells = base[:, None, :] + offs[None, :, :]   # [Q, 4, 3]
        buckets = _dense_id(cells, table.dims)
    else:
        W = cap * 4
        offs = jnp.array(
            [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.int32)
        cells = base[:, None, :] + offs[None, :, :]   # [Q, 8, 3]
        buckets = _hash(cells, table.table_size)
    starts = table.start[buckets]                     # [Q, O] scalar gather
    begin = jnp.minimum(starts * 4,
                        jnp.int32(table.points.shape[0] - W))

    def slice1(s):
        return jax.lax.dynamic_slice(table.points, (s,), (W,))

    cand = jax.vmap(jax.vmap(slice1))(begin)          # [Q, O, W]
    return cand


@partial(jax.jit, static_argnames=())
def nn1_radius_csr(
    table: CSRTable,
    queries: jax.Array,
    r,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest neighbor within ``r`` from the CSR layout. Semantics match
    nn1_radius (8-cell scheme; requires cell_size >= 2r): exact when no
    probed bucket overflows ``cap``."""
    Q = queries.shape[0]
    cand = _csr_pair_candidates(table, queries, r)    # [Q, O, W]
    cand = cand.reshape(Q, -1)                        # [Q, L]
    L = cand.shape[1]
    S = L // 4
    lane = jnp.arange(L, dtype=jnp.int32)
    is_coord = (lane % 4 < 3).astype(jnp.float32)
    q4 = jnp.concatenate([queries, jnp.zeros_like(queries[:, :1])], axis=1)
    qb = jnp.tile(q4, (1, S))
    diff = jnp.clip((cand - qb) * is_coord, -1e15, 1e15)
    sq = diff * diff
    G = ((lane[:, None] // 4 == jnp.arange(S, dtype=jnp.int32)[None, :])
         & (lane[:, None] % 4 < 3)).astype(jnp.float32)
    d2 = jnp.dot(sq, G, preferred_element_type=jnp.float32)
    d2 = jnp.where(d2 < 1e29, d2, jnp.inf)
    r2 = jnp.asarray(r, jnp.float32) ** 2
    d2 = jnp.where(d2 <= r2, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    raw = jnp.take_along_axis(cand, best[:, None] * 4 + 3, axis=1)[:, 0]
    best_idx = jnp.where(raw < 0, -raw - 1.0, raw).astype(jnp.int32)
    # truncation from the idx lanes already in hand (overflowing buckets
    # sign-encode every row). Conservative: an overrun slice can read a
    # NEIGHBORING bucket's sign bit, so this may over-flag near dense
    # clusters — never under-flags, which is the safety contract
    truncated = jnp.min(
        jnp.where((lane % 4 == 3)[None, :], cand, 0.0), axis=1) < 0.0
    return best_idx, best_d2, truncated


# --------------------------------------------------------------------------
# Blocked (windowed-span) query path — restores the fast-gather regime on
# very large DENSE tables.
#
# Measured v5e gather rates from a [R, 48] operand, 8M rows: 336 M rows/s
# at 25 MB, 181 at 50 MB, 55 at 101 MB, ~19 at 210 MB (sorted indices make
# no difference). The padded 1M-point table (210 MB) therefore pays ~53 ns
# per row. This path processes CELL-SORTED queries in fixed-size position
# blocks; each block's 8-cell neighborhoods live in a narrow contiguous
# band of the row-major table, so the block gathers from a
# dynamically-sliced span (~<=25 MB) — back on the fast side of the cliff.
# A needed row outside the span (possible only under heavy density skew or
# badly stale sort order) is flagged in `truncated`, never silently wrong.


def _span_sqdist(span_rows_arr: jax.Array, local: jax.Array,
                 queries: jax.Array, bucket_ok: jax.Array):
    """Packed distance over span-gathered rows.

    span_rows_arr [SPAN, cap*4]; local [B, 8] in-span bucket rows;
    queries [B, 3]; bucket_ok [B, 8]. Returns (d2 [B, 8*cap], rows
    [B, 8*cap*4])."""
    Bq = local.shape[0]
    cap4 = span_rows_arr.shape[1]
    cap = cap4 // 4
    rows = span_rows_arr[local].reshape(Bq, 8 * cap4)      # [B, L]
    L = 8 * cap4
    S = 8 * cap
    lane = jnp.arange(L, dtype=jnp.int32)
    is_coord = (lane % 4 < 3).astype(jnp.float32)
    q4 = jnp.concatenate([queries, jnp.zeros_like(queries[:, :1])], axis=1)
    qb = jnp.tile(q4, (1, S))
    diff = jnp.clip((rows - qb) * is_coord, -1e15, 1e15)
    sq = diff * diff
    G = ((lane[:, None] // 4 == jnp.arange(S, dtype=jnp.int32)[None, :])
         & (lane[:, None] % 4 < 3)).astype(jnp.float32)
    d2 = jnp.dot(sq, G, preferred_element_type=jnp.float32)
    d2 = jnp.where(d2 < 1e29, d2, jnp.inf)
    d2 = jnp.where(jnp.repeat(bucket_ok, cap, axis=1), d2, jnp.inf)
    return d2, rows


@partial(jax.jit, static_argnames=("block_queries", "span_rows", "with_dst",
                                   "unroll", "pair_view",
                                   "compact_rows", "slot_cols"))
def nn1_radius_blocked(
    table: CellTable,
    queries: jax.Array,
    r,
    block_queries: int = 65536,
    span_rows: int = 131072,
    with_dst: bool = False,
    unroll: bool = False,
    pair_view: bool = False,
    compact_rows: bool = False,
    slot_cols: bool = False,
):
    """nn1_radius for large DENSE tables: queries MUST be (approximately)
    sorted by their dense cell id; processed in ``block_queries`` chunks
    against a ``span_rows`` table window. Semantics match nn1_radius
    (8-cell scheme, cell >= 2r); `truncated` additionally flags queries
    whose neighborhood fell outside the block's span (conservative — raise
    span_rows or re-sort if it fires).

    ``with_dst`` additionally returns the WINNER'S COORDINATES [Q,3]
    (read from the packed rows already in hand) so consumers skip the
    ``tgt[idx]`` re-gather — the ICP estimation side's dominant cost at
    1M points (measured ~13 ms/iter of its 26).

    ``pair_view``: gather z-PAIR double rows instead of single bucket
    rows (4 gathers of 2*cap*4 lanes per neighborhood instead of 8 of
    cap*4; the pair concatenation preserves the [8*cap*4] lane layout so
    downstream matmul maps are unchanged). Measured NEUTRAL at 1M on v5e
    (52.2 vs 50.6 ms/iter: the per-call pair-view construction and the
    doubled row width offset the halved gather issue count), kept as an
    oracle-tested option — off by default."""
    if table.dims is None:
        raise ValueError("blocked path requires a dense-grid table")
    cx, cy, cz = table.dims
    R = table.table_size
    cap = table.cap
    C4 = cap * 4
    span_rows = min(span_rows, R + 1)
    Q = queries.shape[0]
    nb = -(-Q // block_queries)
    Qpad = nb * block_queries
    qp = jnp.concatenate(
        [queries, jnp.full((Qpad - Q, 3), 1e30, jnp.float32)], axis=0)

    strides = jnp.asarray(
        [(i * cy + j) * cz + k for i in (0, 1) for j in (0, 1)
         for k in (0, 1)], jnp.int32)                      # [8]

    # Everything below is shaped by a TPU profiler trace of the 1M
    # configuration (20 iters, 93 ms/iter before):
    #   - take_along_axis winner extraction cost 49 ms/iter (per-element
    #     gathers) -> replaced by one-hot selection matmuls on the MXU;
    #   - the query broadcast jnp.tile(q4, (1, S)) lowered through a
    #     T(4,128)-tiled broadcast + copy, 11 ms/iter -> replaced by a
    #     [B,4] @ [4,L] 0/1 matmul that lands directly in the right
    #     layout;
    #   - the 8-row span gather itself costs only ~13 ms/iter.
    S = 8 * cap
    L = 8 * C4
    lane = jnp.arange(L, dtype=jnp.int32)
    is_coord_l = (lane % 4 < 3).astype(jnp.float32)
    is_idx_l = ((lane % 4) == 3).astype(jnp.float32)
    # distance group-sum [L, S]: lane 4s+k (k<3) -> slot s
    Gd = ((lane[:, None] // 4 == jnp.arange(S, dtype=jnp.int32)[None, :])
          & (lane % 4 < 3)[:, None]).astype(jnp.float32)
    # query broadcast projector [4, L]: q4[k] -> lane 4s+k
    T4 = (jnp.arange(4, dtype=jnp.int32)[:, None]
          == (lane % 4)[None, :]).astype(jnp.float32)
    # penalty [8, S]: offset o -> its cap slots
    Gp = (jnp.arange(S, dtype=jnp.int32)[None, :] // cap
          == jnp.arange(8, dtype=jnp.int32)[:, None]).astype(jnp.float32)
    # trunc accumulator [L, 8]: idx lane of offset o -> column o
    Gt = ((lane[:, None] // C4 == jnp.arange(8, dtype=jnp.int32)[None, :])
          & (lane % 4 == 3)[:, None]).astype(jnp.float32)
    # slot -> its 4 lanes [S, L], and lane -> component [L, 4]
    R4 = (jnp.arange(S, dtype=jnp.int32)[:, None]
          == (lane // 4)[None, :]).astype(jnp.float32)
    K4 = ((lane % 4)[:, None]
          == jnp.arange(4, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    r2 = jnp.asarray(r, jnp.float32) ** 2

    if pair_view:
        # z-pair views over the ONE-ROW-PADDED table (pdata[i] = bucket
        # i-1; row 0 is an empty sentinel so the pair covering buckets
        # (b, b+1) exists for any b >= -1, including span/grid edges):
        #   E[p] = (pdata[2p],   pdata[2p+1]) = buckets (2p-1, 2p)
        #   O[p] = (pdata[2p+1], pdata[2p+2]) = buckets (2p,   2p+1)
        # Recomputed per call (~1 ms of copies at 1M) — cheaper than the
        # gather issue time it saves.
        H2 = (R + 4) // 2
        data_p = jnp.concatenate([
            jnp.full((1, C4), _BIG, jnp.float32),
            table.data,
            jnp.full((2 * H2 + 2 - (R + 2), C4), _BIG, jnp.float32)])
        even_view = data_p[: 2 * H2].reshape(H2, 2 * C4)
        odd_view = data_p[1: 2 * H2 + 1].reshape(H2, 2 * C4)
        Hspan = span_rows // 2
        Hs1 = Hspan + 1

    def block(b):
        qb = jax.lax.dynamic_slice(
            qp, (b * block_queries, 0), (block_queries, 3))
        base = jnp.floor((qb - jnp.asarray(r, jnp.float32) - table.origin)
                         / table.cell_size).astype(jnp.int32)   # [B,3]
        # per-axis validity of base and base+1 cells
        ok0 = (base >= 0) & (base < jnp.asarray([cx, cy, cz]))
        ok1 = (base + 1 >= 0) & (base + 1 < jnp.asarray([cx, cy, cz]))
        # bucket_ok[b, o]: offset o = (i, j, k) bits
        oks = []
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    sel = jnp.stack([ok1[:, 0] if i else ok0[:, 0],
                                     ok1[:, 1] if j else ok0[:, 1],
                                     ok1[:, 2] if k else ok0[:, 2]], axis=1)
                    oks.append(jnp.all(sel, axis=1))
        bucket_ok = jnp.stack(oks, axis=1)                 # [B,8]
        # UNCLIPPED linear arithmetic: with base components possibly -1,
        # the valid offsets' ids are still exact (the row-major id is
        # linear in the coords); invalid offsets are masked by bucket_ok.
        # Clipping base instead would SHIFT the whole neighborhood at the
        # grid edges.
        bid = (base[:, 0] * cy + base[:, 1]) * cz + base[:, 2]
        ids = bid[:, None] + strides[None, :]              # [B,8]
        # pad queries (x=1e30) have nonsense ids; mask them
        realq = qb[:, 0] < 1e29
        idmin = jnp.min(jnp.where(bucket_ok & realq[:, None], ids, R))
        span_start = jnp.clip(idmin, 0, max(R + 1 - span_rows, 0))
        if pair_view:
            span_start = span_start & ~1          # even-align for pair maps
        local = ids - span_start
        if pair_view:
            # the pair fetch carries one bucket of overhang on each side:
            # a k=0 bucket at local -1 and a k=1 bucket at local span are
            # genuinely read (E covers base -1, the pair's second slot
            # covers span), so they are NOT span misses
            lo = jnp.asarray([-1, 0] * 4, jnp.int32)[None, :]
            hi = jnp.asarray([span_rows, span_rows + 1] * 4,
                             jnp.int32)[None, :]
            in_span = (local >= lo) & (local < hi)
        else:
            in_span = (local >= 0) & (local < span_rows)
        miss = bucket_ok & ~in_span & realq[:, None]       # real cell, not in span
        ok = bucket_ok & in_span
        B = block_queries
        if pair_view:
            # slices at pair index span_start/2 cover bases
            # b in [span_start-1, span_start+span_rows) across the two
            # parities (E holds odd bases incl. -1, O holds even bases)
            espan = jax.lax.dynamic_slice(
                even_view, (span_start >> 1, 0), (Hs1, 2 * C4))
            ospan = jax.lax.dynamic_slice(
                odd_view, (span_start >> 1, 0), (Hs1, 2 * C4))
            pspan = jnp.concatenate([espan, ospan])        # [2*Hs1, 2C4]
            # base bucket of z-pair m = local[:, 2m]; the pair row exists
            # for any base with EITHER bucket in span (clip keeps the
            # fetch in range; out-of-range offsets are pen/ok-masked)
            l4 = jnp.clip(local[:, 0::2], -1, span_rows - 1)
            plocal = jnp.where(l4 & 1 != 0,
                               (l4 + 1) >> 1,              # odd base -> E
                               Hs1 + (l4 >> 1))            # even base -> O
            rows = pspan[plocal].reshape(B, L)
        elif slot_cols:
            # SLOT-COLUMN variant (VERDICT r4 #2 "emit the gather directly
            # in the candidate layout") — MEASURED OFF by default: 77.4 ms
            # vs the packed chain's 60.0 at the 1M configuration
            # (PROFILE_SWEEP3.json). Mechanism: consume the gather output in its
            # natural [B*8, C4] layout like compact_rows, but do NO wide
            # elementwise work on it at all — four skinny 0/1 matmuls
            # extract the per-slot x/y/z/idx COLUMNS ([B*8,C4]@[C4,cap]),
            # and every subsequent op (diff, square, gate, min, one-hot)
            # runs on narrow [B*8,cap] arrays. The wide operand is touched
            # only by the MXU (which reads the gather layout as a matmul
            # LHS without the 5.4 ms/iter [B*8,48]->[B,384] retiling), and
            # the 2.7x lane-pad tax that sank compact_rows' wide
            # elementwise passes never applies. Arithmetic matches
            # the packed path to fp accumulation order (0/1 matmuls move
            # values exactly; the diff^2 three-term sum associates
            # differently than the matmul reduction, ~1e-7 relative).
            span = jax.lax.dynamic_slice(
                table.data, (span_start, 0), (span_rows, cap * 4))
            rows8 = span[jnp.clip(local, 0, span_rows - 1).reshape(-1)]
            lane48 = jnp.arange(C4, dtype=jnp.int32)
            slot12 = jnp.arange(cap, dtype=jnp.int32)
            # column extractors: lane 4s+k -> slot s, for k = x,y,z,idx
            def _sel(k):
                return ((lane48[:, None] // 4 == slot12[None, :])
                        & (lane48 % 4 == k)[:, None]).astype(jnp.float32)
            X0 = jnp.dot(rows8, _sel(0), preferred_element_type=jnp.float32)
            X1 = jnp.dot(rows8, _sel(1), preferred_element_type=jnp.float32)
            X2 = jnp.dot(rows8, _sel(2), preferred_element_type=jnp.float32)
            X3 = jnp.dot(rows8, _sel(3), preferred_element_type=jnp.float32)
            q8 = jnp.repeat(qb, 8, axis=0)                  # [B*8, 3]
            D0 = jnp.clip(X0 - q8[:, 0:1], -1e15, 1e15)
            D1 = jnp.clip(X1 - q8[:, 1:2], -1e15, 1e15)
            D2 = jnp.clip(X2 - q8[:, 2:3], -1e15, 1e15)
            d2r = D0 * D0 + D1 * D1 + D2 * D2               # [B*8, cap]
            okr = ok.reshape(-1)
            d2r = jnp.where(okr[:, None], d2r, jnp.inf)
            d2r = jnp.where(d2r <= r2, d2r, jnp.inf)
            best_r = jnp.min(d2r, axis=1)                   # [B*8]
            wslot = jnp.min(jnp.where(d2r == best_r[:, None],
                                      slot12[None, :], cap), axis=1)
            sel12 = (slot12[None, :] == wslot[:, None]).astype(jnp.float32)
            # winner components from the already-extracted columns
            win4r = jnp.stack([
                jnp.sum(sel12 * X0, axis=1),
                jnp.sum(sel12 * X1, axis=1),
                jnp.sum(sel12 * X2, axis=1),
                jnp.sum(sel12 * X3, axis=1),
            ], axis=1)                                      # [B*8, 4]
            B8 = block_queries
            best8 = best_r.reshape(B8, 8)
            best_d2 = jnp.min(best8, axis=1)
            off8 = jnp.arange(8, dtype=jnp.int32)[None, :]
            woff = jnp.min(jnp.where(best8 == best_d2[:, None], off8, 8),
                           axis=1)
            sel8 = (off8 == woff[:, None]).astype(jnp.float32)  # [B,8]
            win4 = jnp.einsum("bo,boj->bj", sel8,
                              win4r.reshape(B8, 8, 4))
            best_idx = _decode_idx(win4[:, 3])
            # truncation: any sign-encoded idx among the slot columns
            negr = jnp.sum(jnp.minimum(X3, 0.0), axis=1)    # [B*8]
            trunc = (jnp.any(ok & (negr.reshape(B8, 8) < 0.0), axis=1)
                     | jnp.any(miss, axis=1))
            if with_dst:
                return best_idx, best_d2, trunc, win4[:, :3]
            return best_idx, best_d2, trunc
        elif compact_rows:
            # COMPACT-ROW variant (measured OFF by default): consume the
            # gather output in its natural [B*8, C4] layout, skipping the
            # [B*8,48] -> [B,384] retiling (5.4 ms/iter at 1M) and
            # shrinking every projection to [C4, cap]-class matmuls.
            # MEASURED WORSE at 1M (58.3 vs 36.9 ms/iter): the narrow
            # intermediates ([B*8,48/12/4]) pad to 128 lanes, taxing every
            # elementwise pass ~2.7x — exactly the padding the packed
            # [B, 384] layout exists to avoid (module docstring). Kept as
            # an oracle-tested A/B option.
            span = jax.lax.dynamic_slice(
                table.data, (span_start, 0), (span_rows, cap * 4))
            rows8 = span[jnp.clip(local, 0, span_rows - 1).reshape(-1)]
            lane48 = jnp.arange(C4, dtype=jnp.int32)
            slot12 = jnp.arange(cap, dtype=jnp.int32)
            q4 = jnp.concatenate([qb, jnp.zeros_like(qb[:, :1])], axis=1)
            q48 = jnp.repeat(q4, 8, axis=0)                 # [B*8, 4]
            T4r = (jnp.arange(4, dtype=jnp.int32)[:, None]
                   == (lane48 % 4)[None, :]).astype(jnp.float32)
            qblr = jnp.dot(q48, T4r, preferred_element_type=jnp.float32)
            is_coord_r = (lane48 % 4 < 3).astype(jnp.float32)
            diffr = jnp.clip((rows8 - qblr) * is_coord_r[None, :],
                             -1e15, 1e15)
            Gdr = ((lane48[:, None] // 4 == slot12[None, :])
                   & (lane48 % 4 < 3)[:, None]).astype(jnp.float32)
            d2r = jnp.dot(diffr * diffr, Gdr,
                          preferred_element_type=jnp.float32)  # [B*8, cap]
            okr = ok.reshape(-1)
            d2r = jnp.where(okr[:, None], d2r, jnp.inf)
            d2r = jnp.where(d2r <= r2, d2r, jnp.inf)
            best_r = jnp.min(d2r, axis=1)                   # [B*8]
            wslot = jnp.min(jnp.where(d2r == best_r[:, None],
                                      slot12[None, :], cap), axis=1)
            sel12 = (slot12[None, :] == wslot[:, None]).astype(jnp.float32)
            # winner row 4-lane extraction: slot one-hot -> its 4 lanes
            R12 = (slot12[:, None] == (lane48 // 4)[None, :]
                   ).astype(jnp.float32)                    # [cap, C4]
            K4r = ((lane48 % 4)[:, None] == jnp.arange(4)[None, :]
                   ).astype(jnp.float32)                    # [C4, 4]
            sel48 = jnp.dot(sel12, R12, preferred_element_type=jnp.float32)
            win4r = jnp.dot(sel48 * rows8, K4r,
                            preferred_element_type=jnp.float32)  # [B*8, 4]
            # cross-offset reduction on [B, 8] (ties -> lowest offset,
            # matching the old lowest-global-slot order (o*cap + s))
            best8 = best_r.reshape(B, 8)
            best_d2 = jnp.min(best8, axis=1)
            off8 = jnp.arange(8, dtype=jnp.int32)[None, :]
            woff = jnp.min(jnp.where(best8 == best_d2[:, None], off8, 8),
                           axis=1)
            sel8 = (off8 == woff[:, None]).astype(jnp.float32)  # [B,8]
            win4 = jnp.einsum("bo,boj->bj", sel8, win4r.reshape(B, 8, 4))
            best_idx = _decode_idx(win4[:, 3])
            # truncation: any sign-encoded idx lane among probed buckets
            Gir = ((lane48 % 4) == 3).astype(jnp.float32)
            negr = jnp.dot(jnp.minimum(rows8, 0.0), Gir[:, None],
                           preferred_element_type=jnp.float32)[:, 0]
            trunc = (jnp.any(ok & (negr.reshape(B, 8) < 0.0), axis=1)
                     | jnp.any(miss, axis=1))
            if with_dst:
                return best_idx, best_d2, trunc, win4[:, :3]
            return best_idx, best_d2, trunc
        else:
            span = jax.lax.dynamic_slice(
                table.data, (span_start, 0), (span_rows, cap * 4))
            rows = span[jnp.clip(local, 0, span_rows - 1)].reshape(B, L)
        # NOTE (r5): a fused Pallas VMEM candidate kernel
        # (ops/pallas_sweep.py, VPU lane rolls + argmin in place of the
        # projection-matmul chain below) was DELETED after losing its
        # fourth measured A/B: 82-85 ms vs this chain's 60 ms at the 1M
        # configuration across block sizes 256/512/1024 (2048 exceeded
        # the 16 MB VMEM scratch limit); see PROFILE_SWEEP3.json and
        # BASELINE.md. The MXU projection-matmul chain is the winner.
        q4 = jnp.concatenate([qb, jnp.zeros_like(qb[:, :1])], axis=1)
        qbl = jnp.dot(q4, T4, preferred_element_type=jnp.float32)   # [B,L]
        diff = jnp.clip((rows - qbl) * is_coord_l[None, :], -1e15, 1e15)
        pen = jnp.where(ok, 0.0, 1.0)
        d2 = (jnp.dot(diff * diff, Gd, preferred_element_type=jnp.float32)
              + jnp.dot(pen, Gp * 1e30, preferred_element_type=jnp.float32))
        d2 = jnp.where(d2 <= r2, d2, jnp.inf)
        best_d2 = jnp.min(d2, axis=1)
        # winner via first-match one-hot (ties broken to the lowest slot);
        # queries with NO candidate have best_d2=inf -> eq matches every
        # empty slot, sel picks slot 0 and the garbage winner is masked
        # downstream by the d2=inf validity
        eq = (d2 == best_d2[:, None])
        # first-match via min over slot ids (cumsum lowered to an O(S^2)
        # reduce-window: 13.2 ms/iter at 1M, the trace's top op)
        slot_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
        winslot = jnp.min(jnp.where(eq, slot_ids, S), axis=1, keepdims=True)
        sel = (slot_ids == winslot).astype(jnp.float32)     # [B,S]
        sel4 = jnp.dot(sel, R4, preferred_element_type=jnp.float32)  # [B,L]
        win = jnp.dot(sel4 * rows, K4,
                      preferred_element_type=jnp.float32)   # [B,4]
        best_idx = _decode_idx(win[:, 3])
        # truncation: sign-encoded idx lanes summed per offset on the MXU
        neg = jnp.minimum(rows, 0.0) * is_idx_l[None, :]
        t8 = jnp.dot(neg, Gt, preferred_element_type=jnp.float32)    # [B,8]
        trunc = jnp.any(ok & (t8 < 0.0), axis=1) | jnp.any(miss, axis=1)
        if with_dst:
            return best_idx, best_d2, trunc, win[:, :3]
        return best_idx, best_d2, trunc

    # ``unroll`` replaces the lax.map block loop with straight-line code —
    # measured equal at 1M (53.6 vs 50.6 ms/iter; the loop's per-trip
    # constant staging overlaps with compute after all), kept as an option
    if unroll:
        outs = [block(jnp.int32(b)) for b in range(nb)]
        outs = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    else:
        outs = jax.lax.map(block, jnp.arange(nb))
    flat = jax.tree.map(
        lambda x: x.reshape((Qpad,) + x.shape[2:])[:Q], outs)
    return flat
