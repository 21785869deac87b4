"""Unified neighbor-search API.

Equivalent of ``pcl::search::Search<PointT>`` + the auto-selector
(reference: search/include/pcl/search/search.h:74, auto.h:31). Two backends:

- ``bruteforce``: exact, MXU-driven; best for <= ~200k target points or
  1-NN correspondence streams.
- ``hashgrid``: voxel hash; best for radius queries / very large clouds.

All results are fixed-shape (indices, sqdists, valid[, count]).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.search import bruteforce, hashgrid, organized
from pcl_tpu.search.hashgrid import HashGrid, build as build_hashgrid

__all__ = [
    "bruteforce",
    "hashgrid",
    "HashGrid",
    "build_hashgrid",
    "organized",
    "knn",
    "radius_search",
    "nn1",
]


def _unpack(target) -> Tuple[jax.Array, jax.Array]:
    if isinstance(target, Cloud):
        return target.xyz, target.mask
    xyz = jnp.asarray(target)
    return xyz, jnp.ones((xyz.shape[0],), bool)


def knn(target, queries, k: int, backend: str = "auto",
        cell_size: Optional[float] = None, **kw):
    """k nearest neighbors of each query. Returns (idx, sqdist, valid)."""
    xyz, mask = _unpack(target)
    queries = queries.xyz if isinstance(queries, Cloud) else jnp.asarray(queries)
    if backend == "hashgrid" or (backend == "auto" and cell_size is not None):
        if cell_size is None:
            raise ValueError("hashgrid backend requires cell_size")
        grid = build_hashgrid(xyz, mask, cell_size)
        idx, d, v, _ = hashgrid.knn(grid, queries, k, **kw)
        return idx, d, v
    return bruteforce.knn(xyz, mask, queries, k, **kw)


def radius_search(target, queries, r: float, cap: int, backend: str = "auto", **kw):
    """Neighbors within r (up to ``cap`` nearest). Returns
    (idx, sqdist, valid, count)."""
    xyz, mask = _unpack(target)
    queries = queries.xyz if isinstance(queries, Cloud) else jnp.asarray(queries)
    n = xyz.shape[0]
    if backend == "hashgrid" or (backend == "auto" and n * queries.shape[0] > 5e8):
        grid = build_hashgrid(xyz, mask, r)
        idx, d, v, count, _ = hashgrid.radius(grid, queries, r, cap, **kw)
        return idx, d, v, count
    return bruteforce.radius(xyz, mask, queries, r, cap, **kw)


def nn1(target, queries, **kw):
    """Exact nearest neighbor. Returns (idx, sqdist)."""
    xyz, mask = _unpack(target)
    queries = queries.xyz if isinstance(queries, Cloud) else jnp.asarray(queries)
    return bruteforce.nn1(xyz, mask, queries, **kw)
