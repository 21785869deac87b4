"""Range / box / field-condition filters.

Equivalents of PassThrough (reference: filters/include/pcl/filters/
passthrough.h), CropBox (crop_box.h), and the FunctionFilter lambda filter
(experimental/functor_filter.h). All are pure mask updates — removed points
become padding, capacity is unchanged (PCL's keep_organized_=true analog;
use core.compact to squeeze).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core.transforms import invert_rigid, transform_points

_AXIS = {"x": 0, "y": 1, "z": 2}


def pass_through(
    cloud: Cloud,
    field: str,
    lo: float,
    hi: float,
    negative: bool = False,
) -> Cloud:
    """Keep points whose field value is in [lo, hi] (or outside, if negative).
    ``field`` is 'x'/'y'/'z' or an attr name (scalar attrs only)."""
    if field in _AXIS:
        v = cloud.xyz[:, _AXIS[field]]
    else:
        v = cloud.attrs[field]
        if v.ndim != 1:
            raise ValueError(f"pass_through needs a scalar field, {field} is {v.shape}")
    keep = (v >= lo) & (v <= hi)
    if negative:
        keep = ~keep
    return cloud.with_mask(keep)


def crop_box(
    cloud: Cloud,
    min_pt,
    max_pt,
    transform: Optional[jax.Array] = None,
    negative: bool = False,
) -> Cloud:
    """Keep points inside an (optionally oriented) box. ``transform`` maps
    box frame -> world; points are pulled into the box frame first
    (reference: filters/include/pcl/filters/crop_box.h)."""
    pts = cloud.xyz
    if transform is not None:
        pts = transform_points(invert_rigid(transform), pts)
    lo = jnp.asarray(min_pt, jnp.float32)
    hi = jnp.asarray(max_pt, jnp.float32)
    keep = jnp.all((pts >= lo) & (pts <= hi), axis=-1)
    if negative:
        keep = ~keep
    return cloud.with_mask(keep)


def function_filter(cloud: Cloud, fn: Callable[[Cloud], jax.Array], negative: bool = False) -> Cloud:
    """Keep points where fn(cloud) -> [N] bool is True."""
    keep = fn(cloud)
    if negative:
        keep = ~keep
    return cloud.with_mask(keep)


def clip_plane(cloud: Cloud, plane, negative: bool = False) -> Cloud:
    """Keep points on the positive side of plane [a,b,c,d] (ax+by+cz+d >= 0)
    (reference: filters/include/pcl/filters/plane_clipper3D.h)."""
    p = jnp.asarray(plane, jnp.float32)
    v = cloud.xyz @ p[:3] + p[3]
    keep = v >= 0
    if negative:
        keep = ~keep
    return cloud.with_mask(keep)
