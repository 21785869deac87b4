"""Exact brute-force neighbor search — the MXU path and the test oracle.

Replaces PCL's ``search::BruteForce`` (reference: search/include/pcl/search/
brute_force.h), but on TPU it is not merely an oracle: squared distances come
from the matmul identity ||q-t||^2 = ||q||^2 + ||t||^2 - 2 q.t, so the inner
loop is an [Q,3]x[3,M] contraction plus a streamed top-k — for the cloud
sizes PCL's k-d trees serve (1e4..1e6 points), this saturates the chip and
is the production 1-NN path for ICP correspondences (reference hot loop:
registration/impl/correspondence_estimation.hpp:175).

All functions take padded arrays + masks and return fixed-shape results:
``(indices [Q,k] int32, sqdists [Q,k] f32, valid [Q,k] bool)``.
Invalid slots have index 0 and sqdist +inf.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _chunk_sqdist(q: jax.Array, t: jax.Array, tmask: jax.Array) -> jax.Array:
    """[C,3] x [M,3] -> [C,M] masked squared distances (invalid -> +inf)."""
    q2 = jnp.sum(q * q, axis=-1)
    t2 = jnp.sum(t * t, axis=-1)
    d = q2[:, None] + t2[None, :] - 2.0 * (q @ t.T)
    d = jnp.maximum(d, 0.0)
    return jnp.where(tmask[None, :], d, _INF)


def nn1(
    target: jax.Array,
    tmask: jax.Array,
    queries: jax.Array,
    chunk: int = 2048,
    tile: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Exact 1-NN: returns (index [Q] int32, sqdist [Q] f32).

    On TPU this dispatches to the Pallas fused kernel (ops/pallas_nn.py —
    the running best stays VMEM-resident across the whole target sweep, so
    HBM traffic is ~Nq*16 bytes per target tile instead of the full distance
    matrix; measured 2481 -> 167 ms at 120k x 120k vs the XLA tile stream
    below). Elsewhere (CPU tests) the XLA path runs.
    """
    if target.shape[0] * queries.shape[0] >= 1 << 22 and \
            queries.shape[-1] == 3 and \
            jax.default_backend() in ("tpu", "axon"):
        from pcl_tpu.ops import pallas_nn
        return pallas_nn.nn1_pallas(target, tmask, queries)
    Q = queries.shape[0]
    M = target.shape[0]
    pad_q = (-Q) % chunk
    q = jnp.pad(queries, ((0, pad_q), (0, 0)))
    pad_m = (-M) % tile
    t = jnp.pad(target, ((0, pad_m), (0, 0)))
    tm = jnp.pad(tmask, (0, pad_m))
    n_tiles = t.shape[0] // tile

    def per_chunk(qc):
        def body(i, carry):
            best_d, best_i = carry
            tt = jax.lax.dynamic_slice_in_dim(t, i * tile, tile, 0)
            ttm = jax.lax.dynamic_slice_in_dim(tm, i * tile, tile, 0)
            d = _chunk_sqdist(qc, tt, ttm)
            j = jnp.argmin(d, axis=1)
            dj = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
            better = dj < best_d
            return jnp.where(better, dj, best_d), jnp.where(better, j + i * tile, best_i)

        init = (jnp.full((qc.shape[0],), _INF), jnp.zeros((qc.shape[0],), jnp.int32))
        return jax.lax.fori_loop(0, n_tiles, body, init)

    qs = q.reshape(-1, chunk, q.shape[-1])
    best_d, best_i = jax.lax.map(per_chunk, qs)
    return best_i.reshape(-1)[:Q], best_d.reshape(-1)[:Q]


def knn(
    target: jax.Array,
    tmask: jax.Array,
    queries: jax.Array,
    k: int,
    chunk: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact k-NN. Returns (idx [Q,k], sqdist [Q,k], valid [Q,k]),
    sorted ascending by distance. Equivalent of nearestKSearch
    (reference: search/include/pcl/search/search.h:74)."""
    Q = queries.shape[0]
    pad_q = (-Q) % chunk
    q = jnp.pad(queries, ((0, pad_q), (0, 0)))
    kk = min(k, target.shape[0])   # fewer targets than k: pad below

    def per_chunk(qc):
        d = _chunk_sqdist(qc, target, tmask)
        neg, idx = jax.lax.top_k(-d, kk)
        dd = -neg
        if kk < k:
            idx = jnp.pad(idx, ((0, 0), (0, k - kk)))
            dd = jnp.pad(dd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        return idx.astype(jnp.int32), dd, jnp.isfinite(dd)

    qs = q.reshape(-1, chunk, q.shape[-1])
    idx, dist, valid = jax.lax.map(per_chunk, qs)
    return (
        idx.reshape(-1, k)[:Q],
        dist.reshape(-1, k)[:Q],
        valid.reshape(-1, k)[:Q],
    )


def radius(
    target: jax.Array,
    tmask: jax.Array,
    queries: jax.Array,
    r: float,
    cap: int,
    chunk: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Exact radius search with a fixed result cap.

    Returns (idx [Q,cap], sqdist [Q,cap], valid [Q,cap], count [Q]) where
    ``count`` is the TRUE number of in-radius neighbors (may exceed cap —
    the static-shape accounting for PCL's variable-length radiusSearch).
    Results are the ``cap`` nearest within r, ascending.
    """
    Q = queries.shape[0]
    pad_q = (-Q) % chunk
    q = jnp.pad(queries, ((0, pad_q), (0, 0)))
    r2 = jnp.float32(r) ** 2
    cc = min(cap, target.shape[0])   # fewer targets than cap: pad below

    def per_chunk(qc):
        d = _chunk_sqdist(qc, target, tmask)
        inside = d <= r2
        count = jnp.sum(inside, axis=1).astype(jnp.int32)
        d_in = jnp.where(inside, d, _INF)
        neg, idx = jax.lax.top_k(-d_in, cc)
        dd = -neg
        if cc < cap:
            idx = jnp.pad(idx, ((0, 0), (0, cap - cc)))
            dd = jnp.pad(dd, ((0, 0), (0, cap - cc)), constant_values=jnp.inf)
        return idx.astype(jnp.int32), dd, jnp.isfinite(dd), count

    qs = q.reshape(-1, chunk, q.shape[-1])
    idx, dist, valid, count = jax.lax.map(per_chunk, qs)
    return (
        idx.reshape(-1, cap)[:Q],
        dist.reshape(-1, cap)[:Q],
        valid.reshape(-1, cap)[:Q],
        count.reshape(-1)[:Q],
    )
