"""Integral-image normal estimation for organized clouds.

Equivalent of pcl::IntegralImageNormalEstimation (reference: features/
include/pcl/features/integral_image_normal.h + integral_image2D.h — O(1)
box-filtered normals on organized range images; COVARIANCE_MATRIX and
AVERAGE_3D_GRADIENT modes). TPU design: the integral images are 2D cumsums
(one XLA op each); every pixel's window sums are four gathers, so the whole
[H,W] normal map is a fixed elementwise pipeline — no neighbor search.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core import geometry

_EPS = 1e-12


def _integral(img: jax.Array) -> jax.Array:
    """Zero-padded 2D integral image: I[r, c] = sum of img[:r, :c]."""
    s = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)) + ((0, 0),) * (img.ndim - 2))


def _box_sum(I: jax.Array, half: int) -> jax.Array:
    """Sum over the (2*half+1)^2 window centered per pixel, clamped at the
    borders (window shrinks near edges)."""
    H = I.shape[0] - 1
    W = I.shape[1] - 1
    r = jnp.arange(H)
    c = jnp.arange(W)
    r0 = jnp.clip(r - half, 0, H)
    r1 = jnp.clip(r + half + 1, 0, H)
    c0 = jnp.clip(c - half, 0, W)
    c1 = jnp.clip(c + half + 1, 0, W)
    A = I[r1[:, None], c1[None, :]]
    B = I[r0[:, None], c1[None, :]]
    C = I[r1[:, None], c0[None, :]]
    D = I[r0[:, None], c0[None, :]]
    return A - B - C + D


@partial(jax.jit, static_argnames=("smoothing_size", "mode"))
def integral_image_normals(
    xyz: jax.Array,                 # [H, W, 3] organized points
    valid: jax.Array,               # [H, W] bool
    *,
    smoothing_size: int = 5,
    viewpoint: Optional[jax.Array] = None,
    mode: str = "covariance",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (normals [H,W,3], curvature [H,W]).

    mode='covariance': windowed covariance EVD per pixel (reference
    COVARIANCE_MATRIX path). mode='gradient': cross product of the smoothed
    horizontal/vertical position gradients (AVERAGE_3D_GRADIENT path).
    """
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), xyz.dtype)
    half = max(1, smoothing_size // 2)
    w = valid.astype(xyz.dtype)
    pw = xyz * w[..., None]

    I_w = _integral(w[..., None])[..., 0]
    I_p = _integral(pw)
    cnt = _box_sum(I_w[..., None], half)[..., 0]         # [H,W]
    s_p = _box_sum(I_p, half)                            # [H,W,3]
    cnt_safe = jnp.maximum(cnt, 1.0)
    mu = s_p / cnt_safe[..., None]

    if mode == "covariance":
        # second moments via integral images of the 6 unique products
        xx = pw[..., 0] * xyz[..., 0]
        xy = pw[..., 0] * xyz[..., 1]
        xz = pw[..., 0] * xyz[..., 2]
        yy = pw[..., 1] * xyz[..., 1]
        yz = pw[..., 1] * xyz[..., 2]
        zz = pw[..., 2] * xyz[..., 2]
        m2 = jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)
        s2 = _box_sum(_integral(m2), half) / cnt_safe[..., None]
        # cov = E[pp^T] - mu mu^T
        cov = jnp.stack([
            s2[..., 0] - mu[..., 0] * mu[..., 0],
            s2[..., 1] - mu[..., 0] * mu[..., 1],
            s2[..., 2] - mu[..., 0] * mu[..., 2],
            s2[..., 3] - mu[..., 1] * mu[..., 1],
            s2[..., 4] - mu[..., 1] * mu[..., 2],
            s2[..., 5] - mu[..., 2] * mu[..., 2],
        ], axis=-1)
        C = jnp.stack([
            jnp.stack([cov[..., 0], cov[..., 1], cov[..., 2]], -1),
            jnp.stack([cov[..., 1], cov[..., 3], cov[..., 4]], -1),
            jnp.stack([cov[..., 2], cov[..., 4], cov[..., 5]], -1),
        ], axis=-2)                                       # [H,W,3,3]
        H_, W_ = C.shape[:2]
        lam, V = geometry.eigh33(C.reshape(-1, 3, 3))
        n = V[:, :, 0].reshape(H_, W_, 3)
        lam = lam.reshape(H_, W_, 3)
        lam_sum = jnp.sum(lam, axis=-1)
        curvature = jnp.where(lam_sum > 0,
                              lam[..., 0] / jnp.maximum(lam_sum, _EPS), 0.0)
    elif mode == "gradient":
        # smoothed positions, then central differences along rows/cols
        sm = mu
        gx = jnp.zeros_like(sm).at[:, 1:-1].set(0.5 * (sm[:, 2:] - sm[:, :-2]))
        gy = jnp.zeros_like(sm).at[1:-1, :].set(0.5 * (sm[2:, :] - sm[:-2, :]))
        n = jnp.cross(gx, gy)
        nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
        n = n / jnp.maximum(nn, _EPS)
        curvature = jnp.zeros(n.shape[:2], n.dtype)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # flip toward viewpoint
    to_vp = viewpoint - xyz
    flip = jnp.sum(n * to_vp, axis=-1) < 0
    n = jnp.where(flip[..., None], -n, n)
    ok = valid & (cnt >= 3)
    n = jnp.where(ok[..., None], n, 0.0)
    curvature = jnp.where(ok, curvature, 0.0)
    return n, curvature
