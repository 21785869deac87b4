"""SIFT keypoints on point clouds — scale-space DoG extrema.

Re-design of pcl::SIFTKeypoint (reference: keypoints/include/pcl/keypoints/
sift_keypoint.h:94, impl/sift_keypoint.hpp). The reference builds a
per-octave Gaussian scale space of a scalar field (intensity / curvature /
z) with kd-tree radius searches; here each scale's smoothing is one batched
Gaussian-weighted neighborhood average, the DoG stack is a [N, S] array,
and extremum detection compares each point against its spatial neighbors at
the adjacent scales in one reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_INTENSITY, ATTR_CURVATURE
from pcl_tpu.search import bruteforce


@partial(jax.jit, static_argnames=("n_octaves", "scales_per_octave", "k"))
def sift_keypoints(
    cloud: Cloud,
    min_scale: float,
    n_octaves: int = 3,
    scales_per_octave: int = 3,
    min_contrast: float = 1e-3,
    field: Optional[jax.Array] = None,
    k: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (keypoint_mask [N], scale [N] — the detection scale, 0 for
    non-keypoints). ``field`` defaults to the 'intensity' attr, then
    'curvature', then z."""
    xyz, mask = cloud.xyz, cloud.mask
    n = cloud.capacity
    if field is None:
        if ATTR_INTENSITY in cloud.attrs:
            field = cloud.attrs[ATTR_INTENSITY]
        elif ATTR_CURVATURE in cloud.attrs:
            field = cloud.attrs[ATTR_CURVATURE]
        else:
            field = xyz[:, 2]

    # scale ladder: geometric, octave o scale s = min_scale * 2^o * 2^(s/S)
    scales = []
    for o in range(n_octaves):
        for s in range(scales_per_octave + 1):
            scales.append(min_scale * (2.0 ** o) * (2.0 ** (s / scales_per_octave)))
    n_s = len(scales)

    # neighborhood at the LARGEST scale bounds all smaller ones
    r_max = 3.0 * scales[-1]
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, r_max, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]
    fv = field[idxc]                                     # [N,k]

    def smooth(sigma):
        w = jnp.where(valid, jnp.exp(-d2 / (2.0 * sigma * sigma)), 0.0)
        return jnp.sum(w * fv, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-12)

    smoothed = jnp.stack([smooth(s) for s in scales], axis=1)   # [N,S]
    dog = smoothed[:, 1:] - smoothed[:, :-1]                    # [N,S-1]

    # spatial neighbor DoG values (use the same neighbor list)
    nbr_dog = dog[idxc]                                         # [N,k,S-1]
    nbr_dog = jnp.where(valid[:, :, None], nbr_dog, -jnp.inf)
    nmax = jnp.max(nbr_dog, axis=1)                             # [N,S-1]
    nbr_dog_min = jnp.where(valid[:, :, None], dog[idxc], jnp.inf)
    nmin = jnp.min(nbr_dog_min, axis=1)

    # scale-adjacent comparison: pad the DoG stack
    big = jnp.full((n, 1), -jnp.inf)
    up = jnp.concatenate([dog[:, 1:], big], axis=1)
    dn = jnp.concatenate([big, dog[:, :-1]], axis=1)
    is_max = (dog >= nmax) & (dog >= up) & (dog >= dn) & (dog > min_contrast)
    small = jnp.full((n, 1), jnp.inf)
    upn = jnp.concatenate([dog[:, 1:], small], axis=1)
    dnn = jnp.concatenate([small, dog[:, :-1]], axis=1)
    is_min = (dog <= nmin) & (dog <= upn) & (dog <= dnn) & (dog < -min_contrast)
    extremum = (is_max | is_min) & mask[:, None]

    any_kp = jnp.any(extremum, axis=1)
    best_s = jnp.argmax(extremum, axis=1)
    scale_arr = jnp.asarray(scales[:-1], jnp.float32)
    kp_scale = jnp.where(any_kp, scale_arr[best_s], 0.0)
    return any_kp, kp_scale
