"""Smoothed-surfaces keypoint detector.

Capability match for pcl::SmoothedSurfacesKeypoint (reference: keypoints/
include/pcl/keypoints/smoothed_surfaces_keypoint.h): given the input cloud
and several progressively smoothed copies (different MLS/Gaussian scales),
a point is a keypoint when its along-normal displacement between
consecutive scales is a local extremum over its neighborhood in BOTH
scales. All scale differences and neighborhood extrema tests run batched.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.search import bruteforce


@partial(jax.jit, static_argnames=("k",))
def _extrema(xyz, mask, diffs, k, neighborhood_radius):
    idx, d2, ok = bruteforce.knn(xyz, mask, xyz, k)
    ok = ok & (d2 <= neighborhood_radius**2) & mask[:, None]
    keypoint = mask
    for s in range(diffs.shape[0]):
        dv = diffs[s]
        nb = jnp.where(ok, dv[jnp.clip(idx, 0, xyz.shape[0] - 1)], jnp.nan)
        nb_max = jnp.nanmax(jnp.where(ok, nb, -jnp.inf), axis=1)
        nb_min = jnp.nanmin(jnp.where(ok, nb, jnp.inf), axis=1)
        is_max = dv >= nb_max
        is_min = dv <= nb_min
        keypoint &= is_max | is_min
    return keypoint


def smoothed_surfaces_keypoints(
    cloud: Cloud,
    smoothed_clouds: Sequence[Cloud],
    neighborhood_radius: float,
    k: int = 16,
    min_displacement: float = 1e-4,
) -> np.ndarray:
    """[N] bool keypoint mask. ``smoothed_clouds`` must be index-aligned
    smoothed copies (e.g. moving_least_squares at increasing radii)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("smoothed_surfaces_keypoints requires normals")
    n = cloud.attrs[ATTR_NORMAL]
    prev = cloud.xyz
    diffs = []
    for sc in smoothed_clouds:
        diffs.append(jnp.sum((sc.xyz - prev) * n, axis=-1))
        prev = sc.xyz
    D = jnp.stack(diffs)
    kp = _extrema(cloud.xyz, cloud.mask, D, k, jnp.float32(neighborhood_radius))
    big_enough = jnp.abs(D).max(axis=0) > min_displacement
    return np.asarray(kp & big_enough)
