"""Harris 3D keypoints — normal-covariance corner response.

Re-design of pcl::HarrisKeypoint3D (reference: keypoints/include/pcl/
keypoints/harris_3d.h:52, impl/harris_3d.hpp responses at
HarrisKeypoint3D::responseHarris/Noble/Lowe/Tomasi/Curvature). The response
is computed from the covariance of NORMALS over the search radius; the same
batched covariance + response formula + vectorized NMS as ISS.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_CURVATURE
from pcl_tpu.core import geometry
from pcl_tpu.search import bruteforce

RESPONSES = ("harris", "noble", "lowe", "tomasi", "curvature")


@partial(jax.jit, static_argnames=("k", "response"))
def harris3d_keypoints(
    cloud: Cloud,
    radius: float,
    threshold: float = 0.0,
    response: str = "harris",
    harris_k: float = 0.04,
    k: int = 48,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (keypoint_mask [N], response [N]). Requires normals (and
    curvature for response='curvature')."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("harris3d requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity

    if response == "curvature":
        resp = cloud.attrs.get(ATTR_CURVATURE)
        if resp is None:
            raise ValueError("response='curvature' requires a curvature attr")
    else:
        idx, d2, valid, count = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
        idxc = jnp.clip(idx, 0, n - 1)
        w = (valid & mask[:, None]).astype(jnp.float32)
        nn = normals[idxc]                                  # [N,k,3]
        wsum = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        C = jnp.einsum("nk,nki,nkj->nij", w, nn, nn) / wsum[:, None, None]
        det = jnp.linalg.det(C)
        tr = jnp.trace(C, axis1=-2, axis2=-1)
        if response == "harris":
            # reference: intensity = 0.04 + det - 0.04 * trace^2
            # (impl/harris_3d.hpp:346) — the +k offset makes flat ~ 0
            resp = harris_k + det - harris_k * tr * tr
        elif response == "noble":
            resp = det / jnp.maximum(tr, 1e-12)
        elif response == "lowe":
            lam, _ = geometry.eigh33(C)
            # ratio of the two largest (lam ascending)
            resp = lam[:, 2] * lam[:, 1] / jnp.maximum(lam[:, 2] + lam[:, 1], 1e-12)
        elif response == "tomasi":
            lam, _ = geometry.eigh33(C)
            resp = lam[:, 0]                                # smallest eigenvalue
        else:
            raise ValueError(f"unknown response {response!r}")

    resp = jnp.where(mask, resp, -jnp.inf)

    # NMS over the same radius
    nidx, nd2, nvalid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    nidxc = jnp.clip(nidx, 0, n - 1)
    nbr_resp = jnp.where(nvalid & mask[:, None], resp[nidxc], -jnp.inf)
    neigh_max = jnp.max(nbr_resp, axis=1)
    nbr_arg = jnp.where(nbr_resp >= neigh_max[:, None], nidxc, n)
    first_max = jnp.min(nbr_arg, axis=1)
    is_max = (
        mask & (resp > threshold) & (resp >= neigh_max)
        & (first_max == jnp.arange(n))
    )
    return is_max, jnp.where(jnp.isfinite(resp), resp, 0.0)
