"""Pyramidal Lucas–Kanade (KLT) feature tracking.

Capability match for pcl::tracking::PyramidalKLTTracker (reference:
tracking/include/pcl/tracking/pyramidal_klt.h). Coarse-to-fine optical
flow: build intensity pyramids for both frames, then per level refine each
track with Gauss–Newton iterations over a fixed window. The reference
iterates tracks serially per level; here ALL tracks run lock-step — the
window gathers are one [K, W, W] bilinear-sample batch and the 2x2 normal
equations solve in closed form, the level loop a lax.fori_loop under jit.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pyramid(img: jax.Array, levels: int) -> List[jax.Array]:
    out = [img]
    cur = img
    for _ in range(levels - 1):
        H, W = cur.shape
        blur = (
            cur
            + jnp.roll(cur, 1, 0) + jnp.roll(cur, -1, 0)
            + jnp.roll(cur, 1, 1) + jnp.roll(cur, -1, 1)
        ) / 5.0
        cur = blur[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2).mean((1, 3))
        out.append(cur)
    return out


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    H, W = img.shape
    y = jnp.clip(y, 0.0, H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


@partial(jax.jit, static_argnames=("window_radius", "iterations"))
def _track_level(prev_img, next_img, pts_prev, guess, window_radius, iterations):
    """One pyramid level of LK refinement. pts_prev/guess: [K,2] (y,x)."""
    r = window_radius
    dy, dx = jnp.mgrid[-r : r + 1, -r : r + 1]
    offs = jnp.stack([dy.ravel(), dx.ravel()], 1).astype(jnp.float32)  # [W2,2]

    def window(img, centers):
        yy = centers[:, 0:1] + offs[None, :, 0]
        xx = centers[:, 1:2] + offs[None, :, 1]
        return _bilinear(img, yy, xx)  # [K,W2]

    Iw = window(prev_img, pts_prev)
    # spatial gradients on the previous frame (constant across iterations)
    gy = window(
        jnp.roll(prev_img, -1, 0) - jnp.roll(prev_img, 1, 0), pts_prev
    ) * 0.5
    gx = window(
        jnp.roll(prev_img, -1, 1) - jnp.roll(prev_img, 1, 1), pts_prev
    ) * 0.5
    # 2x2 structure tensor per track
    A11 = jnp.sum(gy * gy, 1)
    A12 = jnp.sum(gy * gx, 1)
    A22 = jnp.sum(gx * gx, 1)
    det = A11 * A22 - A12 * A12

    def body(i, d):
        Jw = window(next_img, pts_prev + d)
        err = Jw - Iw
        b1 = jnp.sum(err * gy, 1)
        b2 = jnp.sum(err * gx, 1)
        ddy = -(A22 * b1 - A12 * b2) / jnp.maximum(det, 1e-8)
        ddx = -(-A12 * b1 + A11 * b2) / jnp.maximum(det, 1e-8)
        return d + jnp.stack([ddy, ddx], 1)

    d = jax.lax.fori_loop(0, iterations, body, guess)
    ok = det > 1e-4
    return d, ok


def pyramidal_klt(
    prev_img: np.ndarray,
    next_img: np.ndarray,
    points: np.ndarray,
    levels: int = 3,
    window_radius: int = 4,
    iterations: int = 10,
    max_residual: float = 1e3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Track [K,2] (y,x) f32 points from prev to next frame.
    Returns (new_points [K,2] f32, status [K] bool)."""
    a = jnp.asarray(prev_img, jnp.float32)
    b = jnp.asarray(next_img, jnp.float32)
    pa = _pyramid(a, levels)
    pb = _pyramid(b, levels)
    pts = jnp.asarray(points, jnp.float32)
    d = jnp.zeros_like(pts)
    ok_all = jnp.ones((len(points),), bool)
    for lvl in range(levels - 1, -1, -1):
        scale = 1 << lvl
        d, ok = _track_level(
            pa[lvl], pb[lvl], pts / scale, d * 2.0 if lvl < levels - 1 else d / scale,
            window_radius, iterations,
        )
        ok_all &= ok
    new_pts = pts + d * 1.0  # d at level 0 is full-res displacement
    H, W = prev_img.shape
    inb = (
        (new_pts[:, 0] >= 0) & (new_pts[:, 0] < H)
        & (new_pts[:, 1] >= 0) & (new_pts[:, 1] < W)
    )
    return np.asarray(new_pts), np.asarray(ok_all & inb)
