"""Stereo — adaptive-cost 2-pass scanline optimization + digital elevation maps.

- ``adaptive_cost_so_matching``: pcl::AdaptiveCostSOStereoMatching
  (reference: stereo/include/pcl/stereo/stereo_matching.h:428) — per-pixel
  SAD costs weighted by color/proximity adaptive windows, then a
  left->right + right->left scanline optimization (1D semi-global
  smoothing with P1/P2 penalties). The DP recurrences are inherently
  sequential along x but independent across rows and disparities: a
  lax.scan over columns carrying the [H,D] cost slice vectorizes the whole
  image (the reference loops pixel-by-pixel).
- ``disparity_to_dem``: pcl::DigitalElevationMapBuilder (stereo/include/
  pcl/stereo/digital_elevation_map.h) — project disparities to 3D, then
  bin into a (column, disparity) grid and average heights per cell
  (segment-sum, the reference's DEM resolution parameters).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_disparity", "radius"))
def adaptive_cost_so_matching(
    left: jax.Array,
    right: jax.Array,
    max_disparity: int = 64,
    radius: int = 2,
    gamma_c: float = 15.0,
    gamma_s: float = 17.5,
    smoothness_weak: float = 20.0,
    smoothness_strong: float = 120.0,
    lr_tolerance: int = 1,
) -> jax.Array:
    """Disparity [H,W] f32, invalid = -1."""
    H, W = left.shape
    L = left.astype(jnp.float32)
    R = right.astype(jnp.float32)

    # adaptive-weight SAD cost volume: weights from color similarity to the
    # window center and spatial proximity (stereo_matching.h:428 per-pixel
    # adaptive support weights, vertical-only simplification of Yoon-Kweon)
    def cost_at(d):
        Rs = jnp.roll(R, d, axis=1)
        ad = jnp.abs(L - Rs)
        num = jnp.zeros_like(ad)
        den = jnp.zeros_like(ad)
        for dy in range(-radius, radius + 1):
            s = jnp.roll(ad, dy, 0)
            cL = jnp.roll(L, dy, 0)
            wgt = jnp.exp(-jnp.abs(cL - L) / gamma_c - abs(dy) / gamma_s)
            num += wgt * s
            den += wgt
        c = num / jnp.maximum(den, 1e-6)
        # invalid columns (x < d): big cost
        xx = jnp.arange(W)[None, :]
        return jnp.where(xx >= d, c, 1e4)

    cost = jnp.stack([cost_at(d) for d in range(max_disparity)], axis=-1)  # [H,W,D]

    P1 = smoothness_weak
    P2 = smoothness_strong

    def so_pass(cv):
        """Scanline optimization along +x: scan over columns, each carrying
        the [H,D] aggregated slice."""
        def body(carry, col):
            prev = carry  # [H,D]
            pmin = prev.min(axis=1, keepdims=True)
            shift_p = jnp.pad(prev, ((0, 0), (1, 0)), constant_values=1e9)[:, :-1]
            shift_n = jnp.pad(prev, ((0, 0), (0, 1)), constant_values=1e9)[:, 1:]
            agg = col + jnp.minimum(
                jnp.minimum(prev, pmin + P2),
                jnp.minimum(shift_p + P1, shift_n + P1),
            ) - pmin
            return agg, agg

        init = jnp.full((H, max_disparity), 0.0)
        _, out = jax.lax.scan(body, init, jnp.moveaxis(cv, 1, 0))
        return jnp.moveaxis(out, 0, 1)

    agg = so_pass(cost) + so_pass(cost[:, ::-1, :])[:, ::-1, :]

    disp = jnp.argmin(agg, axis=-1).astype(jnp.float32)

    # left-right consistency: right disparity from the same volume
    # C_R(x, d) = C_L(x + d, d)
    def right_cost(d):
        return jnp.roll(agg[..., d], -d, axis=1)

    rcost = jnp.stack([right_cost(d) for d in range(max_disparity)], -1)
    rdisp = jnp.argmin(rcost, axis=-1).astype(jnp.float32)
    xx = jnp.arange(W)[None, :].astype(jnp.float32)
    xr = jnp.clip(xx - disp, 0, W - 1).astype(jnp.int32)
    rd = jnp.take_along_axis(rdisp, xr, axis=1)
    ok = jnp.abs(disp - rd) <= lr_tolerance
    ok &= xx >= disp
    return jnp.where(ok, disp, -1.0)


@partial(jax.jit, static_argnames=("dem_cols", "dem_disp_bins"))
def disparity_to_dem(
    disparity: jax.Array,
    intensity: jax.Array,
    focal: float,
    baseline: float,
    cx: float,
    cy: float,
    dem_cols: int = 64,
    dem_disp_bins: int = 32,
    min_disparity: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Build a (dem_cols x dem_disp_bins) elevation grid: cells average the
    3D height (y) of pixels falling in each (image-column, disparity) bin.
    Returns (height [C,B], count [C,B])."""
    H, W = disparity.shape
    valid = disparity >= min_disparity
    d = jnp.where(valid, disparity, 1.0)
    z = focal * baseline / d
    yy = (jnp.arange(H)[:, None] - cy) * z / focal  # height coordinate

    col_bin = (jnp.arange(W)[None, :] * dem_cols // W).astype(jnp.int32)
    col_bin = jnp.broadcast_to(col_bin, (H, W))
    dmax = jnp.where(valid, disparity, 0.0).max() + 1e-6
    disp_bin = jnp.clip(
        (disparity / dmax * dem_disp_bins).astype(jnp.int32), 0, dem_disp_bins - 1
    )
    key = col_bin * dem_disp_bins + disp_bin
    key = jnp.where(valid, key, dem_cols * dem_disp_bins)  # overflow slot

    flat_h = jnp.zeros((dem_cols * dem_disp_bins + 1,), jnp.float32)
    flat_c = jnp.zeros_like(flat_h)
    flat_h = flat_h.at[key.ravel()].add(jnp.where(valid, yy, 0.0).ravel())
    flat_c = flat_c.at[key.ravel()].add(valid.astype(jnp.float32).ravel())
    height = (flat_h / jnp.maximum(flat_c, 1.0))[:-1].reshape(dem_cols, dem_disp_bins)
    count = flat_c[:-1].reshape(dem_cols, dem_disp_bins)
    return height, count
