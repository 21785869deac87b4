"""Organized neighbor search — projection-based kNN/radius for organized
clouds.

Capability match for pcl::search::OrganizedNeighbor (reference: search/
include/pcl/search/organized.h:65,92,173): estimates the 3x4 camera
projection matrix from the organized cloud itself (least squares over
pixel<->point pairs, estimateProjectionMatrix), projects each query into
the image, and searches a pixel window sized from the query depth. All
queries run batched; the window gather is a fixed [W,W] slice per query.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OrganizedSearch(NamedTuple):
    xyz_img: jax.Array   # [H,W,3]
    valid: jax.Array     # [H,W]
    P: jax.Array         # [3,4] projection matrix


def estimate_projection_matrix(xyz_img: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """DLT least-squares fit of u*w = P [x,1]: rows (u,v) from pixel grid
    (organized.h estimateProjectionMatrix)."""
    H, W = valid.shape
    ys, xs = np.nonzero(valid)
    pts = xyz_img[ys, xs]
    n = len(pts)
    sel = np.linspace(0, n - 1, min(n, 400)).astype(int)
    pts, ys, xs = pts[sel], ys[sel], xs[sel]
    Xh = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    A = []
    for (u, v, X) in zip(xs, ys, Xh):
        A.append(np.concatenate([X, np.zeros(4), -u * X]))
        A.append(np.concatenate([np.zeros(4), X, -v * X]))
    A = np.asarray(A)
    _, _, vt = np.linalg.svd(A, full_matrices=False)
    P = vt[-1].reshape(3, 4)
    # normalize so depth scale is positive
    if (P[2] @ Xh[0]) < 0:
        P = -P
    return P.astype(np.float32)


def build(xyz_img: np.ndarray, valid: np.ndarray) -> OrganizedSearch:
    P = estimate_projection_matrix(np.asarray(xyz_img), np.asarray(valid))
    return OrganizedSearch(
        jnp.asarray(xyz_img, jnp.float32), jnp.asarray(valid), jnp.asarray(P)
    )


@partial(jax.jit, static_argnames=("k", "window"))
def knn(
    search: OrganizedSearch,
    queries: jax.Array,
    k: int,
    window: int = 9,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (flat pixel indices [Q,k], sqdist [Q,k], valid [Q,k]).
    Candidates come from a window x window pixel neighborhood around each
    query's projection (organized.h nearestKSearch)."""
    H, W = search.valid.shape
    qh = jnp.concatenate([queries, jnp.ones((queries.shape[0], 1))], axis=1)
    proj = qh @ search.P.T
    u = proj[:, 0] / jnp.where(jnp.abs(proj[:, 2]) > 1e-12, proj[:, 2], 1e-12)
    v = proj[:, 1] / jnp.where(jnp.abs(proj[:, 2]) > 1e-12, proj[:, 2], 1e-12)
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)

    r = window // 2
    dy, dx = jnp.mgrid[-r : r + 1, -r : r + 1]
    yy = jnp.clip(vi[:, None] + dy.ravel()[None, :], 0, H - 1)
    xx = jnp.clip(ui[:, None] + dx.ravel()[None, :], 0, W - 1)
    cand = search.xyz_img[yy, xx]                    # [Q,W2,3]
    cval = search.valid[yy, xx]
    d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cval, d2, jnp.inf)
    kk = min(k, d2.shape[1])
    neg, idx = jax.lax.top_k(-d2, kk)
    dd = -neg
    flat = jnp.take_along_axis(yy, idx, 1) * W + jnp.take_along_axis(xx, idx, 1)
    ok = jnp.isfinite(dd)
    if kk < k:
        flat = jnp.pad(flat, ((0, 0), (0, k - kk)))
        dd = jnp.pad(dd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        ok = jnp.pad(ok, ((0, 0), (0, k - kk)))
    return flat, dd, ok


@partial(jax.jit, static_argnames=("k", "window"))
def self_knn(
    xyz_img: jax.Array,     # [H,W,3]
    valid: jax.Array,       # [H,W] bool
    k: int,
    window: int = 9,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """k nearest neighbors of every pixel among its window x window image
    neighborhood — the organized self-query fast path (every query IS a
    pixel, so no projection is needed; reference organized.h uses the same
    window-bounded approximation). Candidate gathering is pure image ROLLS
    (no hash table, no HBM gathers) and selection sorts only
    window^2 lanes instead of the cell list's 27*cap.

    Returns (flat pixel indices [H*W,k], sqdist [H*W,k], valid [H*W,k]).
    """
    H, W, _ = xyz_img.shape
    r = window // 2
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    d2s, offs = [], []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sh = jnp.roll(jnp.roll(xyz_img, -dy, 0), -dx, 1)
            sv = jnp.roll(jnp.roll(valid, -dy, 0), -dx, 1)
            inb = ((yy + dy >= 0) & (yy + dy < H)
                   & (xx + dx >= 0) & (xx + dx < W))
            d2 = jnp.sum((sh - xyz_img) ** 2, axis=-1)
            d2s.append(jnp.where(sv & inb & valid, d2, jnp.inf))
            offs.append(dy * W + dx)
    D = jnp.stack(d2s, axis=-1).reshape(H * W, len(offs))   # [Q,w^2]
    lane = jnp.arange(len(offs), dtype=jnp.int32)
    Ds, Ls = jax.lax.sort(
        (D, jnp.broadcast_to(lane[None, :], D.shape)), num_keys=1)
    dd = jax.lax.slice_in_dim(Ds, 0, k, axis=1)
    wl = jax.lax.slice_in_dim(Ls, 0, k, axis=1)             # winner lanes
    flat = (yy * W + xx).reshape(-1, 1) + jnp.asarray(offs, jnp.int32)[wl]
    ok = jnp.isfinite(dd)
    return jnp.where(ok, flat, 0), dd, ok


@partial(jax.jit, static_argnames=("cap", "window"))
def radius(
    search: OrganizedSearch,
    queries: jax.Array,
    r: float,
    cap: int,
    window: int = 13,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(flat indices [Q,cap], sqdist, valid, count) within radius r."""
    flat, d2, ok = knn(search, queries, cap, window)
    ok = ok & (d2 <= r * r)
    count = ok.sum(axis=1)
    return flat, jnp.where(ok, d2, jnp.inf), ok, count
