"""Depth rendering + observation likelihood.

Re-design of pcl::simulation::RangeLikelihood (reference: simulation/
include/pcl/simulation/range_likelihood.h — OpenGL render of the model at
candidate poses, then per-pixel likelihood of the observed depth). Here the
model cloud is splatted through the pinhole model with a segment_min
z-buffer (one scatter per pose, vmappable over pose batches), and the
per-pixel likelihood is the reference's Gaussian + uniform-outlier mixture.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.fusion.tsdf import Intrinsics


@partial(jax.jit, static_argnames=("height", "width"))
def render_depth(
    cloud: Cloud,
    pose: jax.Array,          # [4,4] camera-to-world
    intr: Intrinsics,
    height: int,
    width: int,
) -> jax.Array:
    """[H,W] z-buffer depth of the cloud from the pose (0 = empty)."""
    w2c = jnp.linalg.inv(pose)
    p = cloud.xyz @ w2c[:3, :3].T + w2c[:3, 3]
    z = p[:, 2]
    u = jnp.round(intr.fx * p[:, 0] / jnp.maximum(z, 1e-9) + intr.cx).astype(jnp.int32)
    v = jnp.round(intr.fy * p[:, 1] / jnp.maximum(z, 1e-9) + intr.cy).astype(jnp.int32)
    ok = cloud.mask & (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    flat = jnp.where(ok, v * width + u, width * height)
    img = jax.ops.segment_min(
        jnp.where(ok, z, jnp.inf), flat, num_segments=width * height + 1
    )[:-1]
    return jnp.where(jnp.isfinite(img), img, 0.0).reshape(height, width)


@jax.jit
def range_likelihood(
    rendered: jax.Array,      # [H,W] depth of the hypothesis
    observed: jax.Array,      # [H,W] measured depth (0/neg = invalid)
    sigma: float = 0.05,
    outlier_prob: float = 0.1,
    max_range: float = 5.0,
) -> jax.Array:
    """Scalar log-likelihood (reference range_likelihood.h per-pixel
    Gaussian-plus-floor cost model)."""
    both = (rendered > 0) & (observed > 0)
    d = rendered - observed
    gauss = jnp.exp(-0.5 * (d / sigma) ** 2) / (sigma * 2.5066283)
    mix = (1.0 - outlier_prob) * gauss + outlier_prob / max_range
    ll = jnp.where(both, jnp.log(jnp.maximum(mix, 1e-12)), 0.0)
    return jnp.sum(ll)
