"""SUSAN keypoints (reference: keypoints/include/pcl/keypoints/susan.h —
Smallest Univalue Segment Assimilating Nucleus, on normals): a point is
salient when few of its neighbors share its normal direction (the USAN
area is small), with centroid-distance validation and radius NMS."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.search import bruteforce


@partial(jax.jit, static_argnames=("k",))
def susan_keypoints(
    cloud: Cloud,
    radius: float,
    angular_threshold: float = 0.2617,   # ~15 deg, reference default
    geometric_threshold: float = 0.5,    # USAN fraction bound
    k: int = 48,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (keypoint_mask [N], response [N] = 1 - usan_fraction)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("susan_keypoints requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity
    idx, d2, valid, count = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]
    nn = normals[idxc]
    cos_thr = jnp.cos(jnp.float32(angular_threshold))
    similar = valid & (jnp.abs(jnp.einsum("ni,nki->nk", normals, nn)) >= cos_thr)
    n_nbr = jnp.maximum(jnp.sum(valid, axis=1), 1)
    usan = jnp.sum(similar, axis=1) / n_nbr
    response = jnp.where(mask, 1.0 - usan, 0.0)
    candidate = mask & (usan < geometric_threshold) & (n_nbr >= 5)

    # centroid-distance validation (reference: nucleus far from USAN centroid)
    w = similar.astype(jnp.float32)
    centroid = jnp.einsum("nk,nki->ni", w, xyz[idxc]) / \
        jnp.maximum(jnp.sum(w, axis=1), 1.0)[:, None]
    far = jnp.linalg.norm(centroid - xyz, axis=-1) > 0.1 * radius
    candidate = candidate & far

    # NMS over the radius
    resp = jnp.where(candidate, response, -jnp.inf)
    nbr_resp = jnp.where(valid, resp[idxc], -jnp.inf)
    neigh_max = jnp.max(nbr_resp, axis=1)
    nbr_arg = jnp.where(nbr_resp >= neigh_max[:, None], idxc, n)
    first = jnp.min(nbr_arg, axis=1)
    kp = candidate & (resp >= neigh_max) & (first == jnp.arange(n))
    return kp, response
