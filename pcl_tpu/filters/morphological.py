"""Morphological ground filtering for LiDAR.

Re-design of pcl::applyMorphologicalOperator and
pcl::ProgressiveMorphologicalFilter (reference: filters/include/pcl/filters/
morphological_filter.h, progressive_morphological_filter.h — Zhang et al.
2003). Points are rasterized to a min-z 2D grid; grayscale morphology runs
as reduce_window ops on that raster (one XLA op per erosion/dilation instead
of per-point neighbor scans); per-point ground tests read back through the
raster.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud

_BIG = jnp.float32(1e30)


def _rasterize_min(cloud: Cloud, resolution: float, grid: int):
    """Min-z raster [grid, grid] + per-point cell indices."""
    origin = jnp.min(jnp.where(cloud.mask[:, None], cloud.xyz, jnp.inf), axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)[:2]
    cell = jnp.clip(
        jnp.floor((cloud.xyz[:, :2] - origin) / resolution).astype(jnp.int32),
        0, grid - 1,
    )
    flat = cell[:, 0] * grid + cell[:, 1]
    flat = jnp.where(cloud.mask, flat, grid * grid)
    z = jnp.where(cloud.mask, cloud.xyz[:, 2], _BIG)
    raster = jax.ops.segment_min(z, flat, num_segments=grid * grid + 1)[:-1]
    raster = jnp.where(raster >= _BIG, jnp.inf, raster).reshape(grid, grid)
    return raster, cell


def _erode(img, size):
    return jax.lax.reduce_window(img, jnp.inf, jax.lax.min,
                                 (size, size), (1, 1), "SAME")


def _dilate(img, size):
    return jax.lax.reduce_window(img, -jnp.inf, jax.lax.max,
                                 (size, size), (1, 1), "SAME")


@partial(jax.jit, static_argnames=("operator", "grid"))
def morphological_filter(
    cloud: Cloud,
    resolution: float,
    window_size: int = 3,
    operator: str = "open",
    grid: int = 512,
) -> jax.Array:
    """Morphological surface estimate per point (reference
    applyMorphologicalOperator): returns the [N] filtered z values at each
    point's cell. operator in {erode, dilate, open, close}."""
    raster, cell = _rasterize_min(cloud, resolution, grid)
    img = jnp.where(jnp.isfinite(raster), raster, _BIG)
    if operator == "erode":
        out = _erode(img, window_size)
    elif operator == "dilate":
        out = _dilate(jnp.where(img >= _BIG, -jnp.inf, img), window_size)
    elif operator == "open":
        out = _dilate(_erode(img, window_size), window_size)
    elif operator == "close":
        out = _erode(_dilate(jnp.where(img >= _BIG, -jnp.inf, img), window_size),
                     window_size)
    else:
        raise ValueError(f"unknown operator {operator!r}")
    return out[cell[:, 0], cell[:, 1]]


@partial(jax.jit, static_argnames=(
    "cell_size", "max_window_size", "slope", "initial_distance",
    "max_distance", "grid"))
def progressive_morphological_filter(
    cloud: Cloud,
    cell_size: float = 1.0,
    max_window_size: int = 33,
    slope: float = 0.7,
    initial_distance: float = 0.15,
    max_distance: float = 3.0,
    grid: int = 512,
) -> jax.Array:
    """Ground mask [N] (reference ProgressiveMorphologicalFilter::extract):
    growing morphological-opening windows; points rising above the opened
    surface by more than the window-scaled threshold are non-ground."""
    raster, cell = _rasterize_min(cloud, cell_size, grid)
    surface = jnp.where(jnp.isfinite(raster), raster, _BIG)
    ground = cloud.mask
    window = 3
    prev_window = None
    while window <= max_window_size:
        opened = _dilate(_erode(surface, window), window)
        # reference impl/progressive_morphological_filter.hpp:85-91:
        # first threshold = initial_distance, then
        # slope * (w_k - w_{k-1}) * cell + initial_distance, capped
        if prev_window is None:
            thr = initial_distance
        else:
            thr = min(slope * (window - prev_window) * cell_size
                      + initial_distance, max_distance)
        z_surf = opened[cell[:, 0], cell[:, 1]]
        ground = ground & (cloud.xyz[:, 2] - z_surf <= thr)
        surface = opened
        prev_window = window
        window = 2 * window - 1
    return ground
