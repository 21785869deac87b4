"""Unified neighbor-search API.

Equivalent of ``pcl::search::Search<PointT>`` + the auto-selector
(reference: search/include/pcl/search/search.h:74, auto.h:31). Backends:

- ``bruteforce``: exact, MXU-driven; best for <= ~30k target points or
  1-NN correspondence streams.
- ``cell``: packed-lane cell list (search/cell_list.py) — the production
  large-cloud path; exact within a density-estimated horizon, truncation
  detectable. ``auto`` picks it when the candidate-pair count is large.
  Contract: results are bounded to the cell horizon, and a bucket denser
  than ``cell_cap`` truncates (raise cell_cap for heavy density skew).
  Statistical consumers (normals, descriptors, outlier counts thresholded
  at min_neighbors <= cell_cap) are unaffected by either bound.
- ``hashgrid``: CSR voxel hash; kept for explicit use (its gathers are
  slower than the packed cell rows — see cell_list module docstring).

All results are fixed-shape (indices, sqdists, valid[, count]).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.search import bruteforce, cell_list, hashgrid, organized
from pcl_tpu.search.hashgrid import HashGrid, build as build_hashgrid

__all__ = [
    "bruteforce",
    "cell_list",
    "hashgrid",
    "HashGrid",
    "build_hashgrid",
    "organized",
    "knn",
    "radius_search",
    "nn1",
    "knn_density_radius",
]

# above this many candidate pairs (N_target x N_query) the O(N*Q) brute
# sweep loses to the cell list
_AUTO_PAIRS = 1e9

# cap the candidate-tensor working set of one cell-list sweep (bytes of
# [block, 27*cap*4] f32); above it queries are processed in lax.map chunks
_SWEEP_BYTES = 256e6


def _map_blocks(fn, queries: jax.Array, slots: int):
    """Apply fn([B,3] queries) -> tuple of [B,...] arrays in fixed-size
    query chunks when the [Q, slots*4] candidate tensor would blow the
    memory budget (e.g. 307k organized-frame queries x 27*32 slots = 4.2 GB
    — OOMed a 16 GB chip)."""
    Q = queries.shape[0]
    block = int(max(4096, _SWEEP_BYTES // (slots * 16)))
    if Q <= block:
        return fn(queries)
    nb = -(-Q // block)
    qp = jnp.concatenate(
        [queries, jnp.full((nb * block - Q, 3), 1e30, queries.dtype)])

    def body(b):
        return fn(jax.lax.dynamic_slice(qp, (b * block, 0), (block, 3)))

    outs = jax.lax.map(body, jnp.arange(nb))
    return jax.tree.map(
        lambda x: x.reshape((nb * block,) + x.shape[2:])[:Q], outs)


def knn_density_radius(xyz: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """Radius expected to contain ~2k uniform-density neighbors, from the
    masked bounding box: r = (2k * 3V / (4 pi N))^(1/3) — the horizon the
    ``cell`` backend uses when none is given."""
    w = mask[:, None]
    lo = jnp.min(jnp.where(w, xyz, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(w, xyz, -jnp.inf), axis=0)
    vol = jnp.prod(jnp.maximum(hi - lo, 1e-6))
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.cbrt(2.0 * k * 3.0 * vol / (4.0 * jnp.pi * n))


def _occupancy_cap(x, r, limit):
    import numpy as np
    ijk = np.floor(x / r).astype(np.int64)
    ijk -= ijk.min(0)
    dims = ijk.max(0) + 1
    key = (ijk[:, 2] * dims[1] + ijk[:, 1]) * dims[0] + ijk[:, 0]
    occ = int(np.bincount(np.unique(key, return_inverse=True)[1]).max())
    cap = 24
    while cap < occ and cap < limit:
        cap *= 2
    return int(min(cap, limit))


def auto_cell_params(target, k: int, cell_size: Optional[float] = None,
                     limit: int = 512,
                     sample: int = 2000) -> Tuple[float, int]:
    """HOST-side density probe: (cell_size, bucket_cap) that make the cell
    backend exact for this cloud's kNN.

    The bbox-volume density heuristic (``knn_density_radius``) assumes
    points fill the volume; real scans are SURFACES inside a mostly-empty
    frustum, so it oversizes cells by orders of magnitude (the 241k milk
    scene put thousands of points in one "~20-point" cell; k=10 neighbor
    lists were ~100% truncation-flagged and normals disagreed with brute
    force by up to 60 deg). Measure instead: sample the k-th-neighbor
    distance with a host kd-tree and take its 95th percentile as the cell
    size (the 27-cell probe then covers the k-ball for ~all queries), then
    bincount voxel occupancy at that size for the bucket cap (power of
    two, floored at 24, capped at ``limit``). Call OUTSIDE jit (concrete
    arrays only) and pass the results as ``cell_size``/``cell_cap``."""
    import numpy as np
    xyz, mask = _unpack(target)
    x = np.asarray(xyz)[np.asarray(mask)]
    if len(x) <= k + 1:
        return (float(cell_size) if cell_size is not None else 1.0, 24)
    if cell_size is None:
        from scipy.spatial import cKDTree
        tree = cKDTree(x)
        step = max(1, len(x) // sample)
        d, _ = tree.query(x[::step], k + 1)
        r = float(np.percentile(d[:, -1], 95.0))
        r = max(r, 1e-6)
    else:
        r = float(cell_size)
    return r, _occupancy_cap(x, r, limit)


def auto_cell_cap(target, k: int, cell_size: Optional[float] = None,
                  limit: int = 512) -> int:
    """Bucket capacity that fits this cloud's measured occupancy at the
    given cell size (see auto_cell_params; uses the bbox density radius
    when no cell size is given — prefer auto_cell_params, which also
    fixes the radius for surface-like clouds)."""
    import numpy as np
    xyz, mask = _unpack(target)
    x = np.asarray(xyz)[np.asarray(mask)]
    if len(x) == 0:
        return 24
    if cell_size is None:
        lo, hi = x.min(0), x.max(0)
        vol = float(np.prod(np.maximum(hi - lo, 1e-6)))
        r = float(np.cbrt(2.0 * k * 3.0 * vol / (4.0 * np.pi * len(x))))
    else:
        r = float(cell_size)
    return _occupancy_cap(x, r, limit)


def _unpack(target) -> Tuple[jax.Array, jax.Array]:
    if isinstance(target, Cloud):
        return target.xyz, target.mask
    xyz = jnp.asarray(target)
    return xyz, jnp.ones((xyz.shape[0],), bool)


def knn(target, queries, k: int, backend: str = "auto",
        cell_size: Optional[float] = None, cell_cap: int = 24,
        table_size: int = 1 << 17, return_trunc: bool = False, **kw):
    """k nearest neighbors of each query. Returns (idx, sqdist, valid)
    — or (idx, sqdist, valid, truncated [Q] bool) with ``return_trunc``.

    ``cell``/big-``auto`` answers are exact for neighbors within the cell
    horizon (``cell_size`` or the density-estimated radius) when no bucket
    truncates — kNN for local-neighborhood consumers (normals, covariances,
    descriptors), which is every hot caller at scale. ``truncated`` flags
    queries whose bucket overflowed ``cell_cap`` (their neighbor set may be
    non-nearest); always False on the exact backends (ADVICE r2: the flag
    was previously discarded here)."""
    xyz, mask = _unpack(target)
    queries = queries.xyz if isinstance(queries, Cloud) else jnp.asarray(queries)

    def _ret(idx, d, v, trunc):
        return (idx, d, v, trunc) if return_trunc else (idx, d, v)

    big = xyz.shape[0] * queries.shape[0] > _AUTO_PAIRS
    if backend == "cell" or (backend == "auto" and big):
        r = knn_density_radius(xyz, mask, k) if cell_size is None \
            else jnp.float32(cell_size)
        table = cell_list.build(xyz, mask, r, table_size=table_size,
                                cap=cell_cap)
        idx, d, v, trunc = _map_blocks(
            lambda q: cell_list.knn_radius(table, q, k),
            queries, 27 * cell_cap)
        return _ret(idx, d, v, trunc)
    if backend == "hashgrid":
        if cell_size is None:
            raise ValueError("hashgrid backend requires cell_size")
        grid = build_hashgrid(xyz, mask, cell_size)
        idx, d, v, trunc = hashgrid.knn(grid, queries, k, **kw)
        return _ret(idx, d, v, trunc)
    idx, d, v = bruteforce.knn(xyz, mask, queries, k, **kw)
    return _ret(idx, d, v, jnp.zeros((queries.shape[0],), bool))


def radius_search(target, queries, r: float, cap: int, backend: str = "auto",
                  cell_cap: int = 32, table_size: int = 1 << 17,
                  return_trunc: bool = False, **kw):
    """Neighbors within r (up to ``cap`` nearest). Returns
    (idx, sqdist, valid, count) — plus truncated [Q] with ``return_trunc``
    (see ``knn``)."""
    xyz, mask = _unpack(target)
    queries = queries.xyz if isinstance(queries, Cloud) else jnp.asarray(queries)
    n = xyz.shape[0]

    def _ret(idx, d, v, count, trunc):
        return (idx, d, v, count, trunc) if return_trunc \
            else (idx, d, v, count)

    big = n * queries.shape[0] > _AUTO_PAIRS
    if backend == "cell" or (backend == "auto" and big):
        table = cell_list.build(xyz, mask, jnp.float32(r),
                                table_size=table_size, cap=cell_cap)
        idx, d, v, count, trunc = _map_blocks(
            lambda q: cell_list.radius_search(table, q, r, cap_out=cap),
            queries, 27 * cell_cap)
        return _ret(idx, d, v, count, trunc)
    if backend == "hashgrid":
        grid = build_hashgrid(xyz, mask, r)
        idx, d, v, count, trunc = hashgrid.radius(grid, queries, r, cap, **kw)
        return _ret(idx, d, v, count, trunc)
    idx, d, v, count = bruteforce.radius(xyz, mask, queries, r, cap, **kw)
    return _ret(idx, d, v, count, jnp.zeros((queries.shape[0],), bool))


def nn1(target, queries, **kw):
    """Exact nearest neighbor. Returns (idx, sqdist)."""
    xyz, mask = _unpack(target)
    queries = queries.xyz if isinstance(queries, Cloud) else jnp.asarray(queries)
    return bruteforce.nn1(xyz, mask, queries, **kw)
